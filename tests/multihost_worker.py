"""Worker script for the multi-host trainer tests (not a pytest module).

Launched by tests/test_multihost.py once per simulated host:

    python tests/multihost_worker.py <pid> <nproc> <port> <tmpdir> [mode]

Each process drives 4 virtual CPU devices; with nproc=2 the global mesh spans
8 devices across 2 processes. nproc=1 runs the same global config
single-process, as the parity reference. Modes:

  batch  (default) mesh batch=2 x h=2 x w=2 — batch rows split across hosts
  hsplit mesh h=4 x w=2 — the *latitude* axis spans processes, so each host's
         io_tile restricts reads to its rows (ref dataloader.py:30-71 io_grid)
  ens    EnsembleTrainer, mesh ensemble=2 x h=2 x w=2 with global batch 1 —
         members of the SAME sample live on different hosts, with antithetic
         (centered) noise pairs straddling the process boundary
         (ref config/fourcastnet3.yaml:222-233 ensemble-parallel recipe)

Prints one ``MHRESULT {json}`` line with the epoch logs.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    tmpdir = sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "batch"

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=" + str(8 // nproc)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from makani_tpu.parallel import multihost

    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        multihost.init_multihost(coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid)

    from makani_tpu.utils.yparams import ParamsBase

    base = dict(
        nettype="SFNO",
        enable_synthetic_data=True,
        img_shape_x=24,
        img_shape_y=48,
        scale_factor=2,
        embed_dim=16,
        num_layers=2,
        channel_names=["u10m", "v10m", "t2m", "z500", "q700"],
        in_channels=[0, 1, 2, 3, 4],
        out_channels=[0, 1, 2, 3, 4],
        n_history=0,
        n_future=0,
        dt=1,
        dhours=6,
        add_zenith=True,
        batch_size=8,
        n_train_samples_per_epoch=16,
        n_eval_samples=8,
        valid_autoreg_steps=1,
        losses=[{"type": "l2", "channel_weights": "constant", "parameters": {"squared": True}}],
        lr=2e-3,
        max_epochs=1,
        scheduler="none",
        optimizer_type="Adam",
        weight_decay=0.0,
        normalization_layer="instance_norm_s2",
        save_checkpoint="none",
        exp_dir=tmpdir,
        multistep={"push_forward": False, "weight_type": "constant"},
        h_parallel_size=2,
        w_parallel_size=2,
    )

    if mode == "mm":
        # tensor (matmul) axis spans processes: mesh (h=2, w=1, matmul=4)
        # over 8 devices leaves batch=1, so each process holds 2 of the 4
        # Megatron parameter shards (ref mpu/layers.py distributed matmul)
        base.update(h_parallel_size=2, w_parallel_size=1, parameters_split_size=4, batch_size=4, n_train_samples_per_epoch=8, n_eval_samples=4)
    elif mode == "hsplit":
        # latitude spans processes: proc0 owns rows [0, 12), proc1 [12, 24)
        base.update(h_parallel_size=4, w_parallel_size=2, batch_size=4, n_train_samples_per_epoch=8, n_eval_samples=4)
    elif mode == "ens":
        base.update(
            h_parallel_size=2,
            w_parallel_size=2,
            ensemble_parallel_size=2,
            ensemble_size=2,
            batch_size=1,
            n_train_samples_per_epoch=4,
            n_eval_samples=2,
            input_noise={"type": "diffusion", "n_channels": 2, "mode": "concatenate", "centered": True, "sigma": 1.0, "lambd": 0.5},
            losses=[{"type": "crps", "channel_weights": "constant", "parameters": {"crps_type": "skillspread"}}],
        )
    elif mode == "loss":
        # distributed losses/metrics parity across REAL process boundaries
        # (ref tests/distributed/tests_distributed_losses.py runs per-rank
        # torch.distributed the same way): the ensemble/batch reductions and
        # the spatial quadrature partial sums cross gloo collectives here,
        # not just a single-process virtual mesh
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        from makani_tpu.parallel import mesh as pmesh
        from makani_tpu.utils.loss import LOSS_REGISTRY
        from makani_tpu.utils.metric import MetricsHandler

        names = ["u500", "v500", "z500", "t500"]
        shape = (16, 32)
        kw = dict(img_shape=shape, channel_names=names, grid_type="legendre-gauss")
        mesh = pmesh.init(h=2, ensemble=2, batch=2, devices=jax.devices())

        rng = np.random.RandomState(0)
        prd_e = rng.randn(4, 4, len(names), *shape).astype(np.float32)
        prd_d = rng.randn(4, len(names), *shape).astype(np.float32)
        tar = rng.randn(4, len(names), *shape).astype(np.float32)

        e_spec = P("batch", "ensemble", None, "h", "w")
        d_spec = P("batch", None, "h", "w")

        def put(arr, spec):
            # every process has the full array; the callback hands each
            # addressable shard its global-index slice (process-layout-proof)
            sh = NamedSharding(mesh, spec)
            return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

        prd_e_g = put(prd_e, e_spec)
        prd_d_g = put(prd_d, d_spec)
        tar_g = put(tar, d_spec)

        out = {"rank": multihost.process_index(), "nproc": jax.process_count()}
        for key, ens in [
            ("l2", False),
            ("spectral l2", False),
            ("h1", False),
            ("crps", True),
            ("lp_energy_score", True),
            ("ensemble_nll", True),
        ]:
            fn = LOSS_REGISTRY[key](**kw, squared=True)
            # reduce to a scalar INSIDE jit so the result is a replicated
            # scalar (losses return per-sample/channel arrays that stay
            # batch-sharded); each rank then reports its OWN copy, making the
            # cross-rank agreement check meaningful (no gather involved)
            import jax.numpy as jnp

            val = jax.jit(lambda a, b, f=fn: jnp.mean(f(a, b)))(prd_e_g if ens else prd_d_g, tar_g)
            out[f"loss_{key}"] = float(np.asarray(val.addressable_data(0)))

        mparams = ParamsBase(
            dict(
                img_shape_x=shape[0],
                img_shape_y=shape[1],
                channel_names=names,
                valid_autoreg_steps=0,
                metric_names=["rmse", "acc", "crps", "spread"],
            )
        )
        import jax.numpy as jnp

        mh = MetricsHandler(mparams)
        # scalar-reduce inside jit -> replicated scalars, own copy per rank
        mets = jax.jit(lambda a, b: {k: jnp.mean(v) for k, v in mh.compute_batch(a, b).items()})(prd_e_g, tar_g)
        for k, v in mets.items():
            arr = v.addressable_data(0) if isinstance(v, jax.Array) and not v.is_fully_addressable else v
            out[f"metric_{k}"] = float(np.asarray(arr))
        print("MHRESULT " + json.dumps(out), flush=True)
        return
    elif mode in ("infer", "einfer"):
        # multi-process score_model: every process walks the same global IC
        # batches, feeding only its rows (ADVICE r2: the per-process IC split
        # desynchronized the SPMD programs)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from testutils import get_default_parameters, init_hdf5_dataset

        own = os.path.join(tmpdir, f"data_p{pid}")
        os.makedirs(own, exist_ok=True)
        paths = init_hdf5_dataset(own)  # seed=0: identical files on every process
        overrides = dict(
            valid_autoreg_steps=1,
            batch_size=2,
            metric_names=["rmse", "acc", "l1"],
            checkpoint_required=False,
            h_parallel_size=2,
            w_parallel_size=2,
            **paths,
        )
        if mode == "einfer":
            # ensemble scoring with the ensemble axis spanning processes
            # (ref README.md:62-68 ensemble+model+data-parallel scoring):
            # mesh (batch=1, ensemble=2, h=2, w=2) with E=4 puts members
            # 0-1 of every IC on proc0 and members 2-3 on proc1 (the folded
            # rows straddle hosts), while the single tar copy of each IC is
            # replicated across the ensemble ranks
            overrides.update(
                ensemble_size=4,
                ensemble_parallel_size=2,
                h_parallel_size=2,
                w_parallel_size=2,
                batch_size=1,
                n_ics=3,
                metric_names=["rmse", "acc", "crps", "ssr"],
                input_noise={"type": "diffusion", "n_channels": 2, "mode": "concatenate", "centered": True, "sigma": 1.0, "lambd": 0.5},
            )
        iparams = get_default_parameters(own, **overrides)
        from makani_tpu.utils.inference.inferencer import Inferencer

        inf = Inferencer(iparams)
        logs = inf.score_model(output_dir=os.path.join(tmpdir, "out") if multihost.is_main_process() else None)
        out = {
            "rank": multihost.process_index(),
            "nproc": jax.process_count(),
            "train_loss": float(logs["rmse"]),  # reuse the result keys
            "valid_loss": float(logs["acc"]),
            "rmse": float(logs["rmse"]),
            "crps": float(logs["crps"]) if "crps" in logs else None,
            "ssr": float(logs["ssr"]) if "ssr" in logs else None,
            "io_tile_x": [],
            "io_tile_y": [],
        }
        print("MHRESULT " + json.dumps(out), flush=True)
        return
    elif mode != "batch":
        raise ValueError(f"unknown mode {mode}")

    params = ParamsBase(base)

    if mode == "ens":
        from makani_tpu.utils.training.ensemble_trainer import EnsembleTrainer as TrainerCls
    else:
        from makani_tpu.utils.training.deterministic_trainer import Trainer as TrainerCls

    trainer = TrainerCls(params, world_rank=multihost.process_index())
    logs = trainer.train()
    out = {
        "rank": multihost.process_index(),
        "nproc": jax.process_count(),
        "train_loss": logs[0]["train_loss"],
        "valid_loss": logs[0]["valid_loss"],
        "rmse": logs[0].get("rmse"),
        "io_tile_x": list(params.get("io_tile_x") or ()),
        "io_tile_y": list(params.get("io_tile_y") or ()),
    }
    print("MHRESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
