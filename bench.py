"""Benchmark: SFNO-73ch training throughput on one chip.

Runs the flagship SFNO (73 channels, dhconv, embed_dim 384, 8 layers, scale
factor 3 — the reference's sfno_linear_73chq_sc3_layers8_edim384 lineage) in
bf16 on synthetic device-resident data and measures steady-state training
step time (forward + backward + adam).

Resolution defaults to 0.5 deg (361x720): the reference trains the 0.25 deg
model with h=4 spatial model parallelism across four 80GB GPUs per batch
element (README.md:56-58), so a full-resolution single-chip run does not fit
on one 16GB chip for either framework. Override with BENCH_NLAT/BENCH_NLON.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (plus mfu and
flops_per_sample fields). ``vs_baseline`` divides by BENCH_BASELINE_SPS
(samples/sec). The reference publishes no throughput numbers (BASELINE.md), so
the default baseline is a FLOP/byte-roofline estimate of the reference on one
A100-80GB at this exact config — see BASELINE.md "A100 baseline estimate" for
the derivation (XLA-measured 4.31 TFLOP + 59.9 GB logical bytes per training
sample; A100 312 TF/s bf16 / 156 TF/s TF32 for the fp32-forced transforms /
2.04 TB/s HBM; 40% of the roofline as the achieved fraction typical of eager
PyTorch+AMP). That lands at 13.6 samples/s/chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    # transform GEMMs in bf16 with fp32 accumulation — the same arithmetic the
    # reference's headline bf16-AMP recipe performs (README.md:56-58: torch
    # autocast bf16 puts the torch-harmonics SHT einsums on A100 bf16 tensor
    # cores with fp32 accumulate). MAKANI_TRANSFORM_PRECISION=high gives
    # TF32-equivalent (bf16x3), =highest exact fp32.
    from makani_tpu.ops.precision import set_transform_precision

    set_transform_precision(os.environ.get("MAKANI_TRANSFORM_PRECISION", "default"))

    import jax

    # persistent compilation cache (no-op through the axon relay, which does
    # not serve cached executables across processes — measured; kept for
    # real TPU hosts where it removes the ~5-10 min train-step compile)
    jax.config.update("jax_compilation_cache_dir", "/tmp/makani_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # the axon plugin ignores JAX_PLATFORMS; forcing another platform (CPU
    # smoke tests of the bench graph) needs the config knob
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    import jax.numpy as jnp
    import optax

    from makani_tpu.models.model_registry import get_model
    from makani_tpu.utils.loss import LossHandler
    from makani_tpu.utils.yparams import ParamsBase

    nlat = int(os.environ.get("BENCH_NLAT", 361))
    nlon = int(os.environ.get("BENCH_NLON", 720))
    # B=3 is the measured single-chip sweet spot with bf16 activations
    # (B=2: 11.27, B=3: 11.79, B=4: 11.60 samples/s — PERF.md round 2)
    batch = int(os.environ.get("BENCH_BATCH", 3))
    embed = int(os.environ.get("BENCH_EMBED", 384))
    layers = int(os.environ.get("BENCH_LAYERS", 8))
    steps = int(os.environ.get("BENCH_STEPS", 3))
    warmup = int(os.environ.get("BENCH_WARMUP", 2))
    # remat level 0-3 (enc/dec, +MLPs, +blocks; ref sfnonet.py:857-926)
    ckpt = int(os.environ.get("BENCH_CHECKPOINTING", 0))
    # 32 steps per dispatch (lax.scan): measures device throughput without
    # the sandbox relay's per-call RPC overhead, and amortizes the loop-entry
    # relayout when the AUTO-layout path is unavailable (BENCH_SCAN=1
    # reverts; measured 13.20 -> 13.62 samples/s across the scan sweep,
    # PERF.md round 3; the no-AUTO fallback reads 13.61 at scan=32)
    scan_k = int(os.environ.get("BENCH_SCAN", 32))

    nettype = os.environ.get("BENCH_NETTYPE", "SFNO")
    # BENCH_ENSEMBLE=E (E>1): the reference's flagship probabilistic workload —
    # folded (B*E) ensemble forward with concatenated diffusion-noise channels,
    # scored by skillspread CRPS (ref makani/ensemble.py:36-229 and
    # config/fourcastnet3.yaml:222-233 train exactly this shape)
    ens = int(os.environ.get("BENCH_ENSEMBLE", "0") or 0)
    disco_family = nettype in ("FCN3", "FCN3.1", "SNO")
    if disco_family:
        # the DISCO family needs real ERA5 channel names: the encoders group
        # channels by pressure level (ref config/fourcastnet3.yaml channel list)
        names = ["u10m", "v10m", "u100m", "v100m", "t2m", "sp", "msl", "tcwv"]
        for v in ("u", "v", "z", "t", "q"):
            names += [f"{v}{p}" for p in (50, 100, 150, 200, 250, 300, 400, 500, 600, 700, 850, 925, 1000)]
    else:
        names = [f"ch{i}" for i in range(73)]
    params = ParamsBase(
        dict(
            nettype="SFNO",
            img_shape_x=nlat,
            img_shape_y=nlon,
            scale_factor=3,
            embed_dim=embed,
            num_layers=layers,
            operator_type="dhconv",
            normalization_layer="instance_norm",
            checkpointing_level=ckpt,
            # selective remat: "dots" recomputes elementwise chains in bwd
            # from saved GEMM outputs (BENCH_REMAT=dots|full|none)
            remat_policy=os.environ.get("BENCH_REMAT", "none"),
            channel_names=names,
            in_channels=list(range(73)),
            out_channels=list(range(73)),
            n_history=0,
            n_future=0,
            add_zenith=True,
            compute_dtype="bfloat16",
            losses=[{"type": "l2", "channel_weights": "constant", "parameters": {"squared": True}}],
            lr=1e-3,
            optimizer_type="Adam",
            scheduler="none",
            multistep={"push_forward": False},
        )
    )

    if nettype == "FCN3":
        # the published FCN3 recipe at the bench resolution (ref
        # config/fourcastnet3.yaml: morlet basis, kernel [3,3], 10 layers,
        # sfno_block_frequency 5, atmo/surf/aux embed 45/56/36)
        params.update(
            dict(
                nettype="FCN3",
                scale_factor=int(os.environ.get("BENCH_SCALE_FACTOR", 2)),
                atmo_embed_dim=int(os.environ.get("BENCH_ATMO_EMBED", 45)),
                surf_embed_dim=int(os.environ.get("BENCH_SURF_EMBED", 56)),
                aux_embed_dim=int(os.environ.get("BENCH_AUX_EMBED", 36)),
                num_layers=int(os.environ.get("BENCH_LAYERS", 10)),
                sfno_block_frequency=5,
                kernel_shape=[3, 3],
                filter_basis_type="morlet th",
                filter_basis_norm_mode="mean",
                normalization_layer="none",
                channels_last=os.environ.get("BENCH_CHANNELS_LAST", "1") == "1",
            ),
            allow_new=True,
        )
    elif nettype == "FCN3.1":
        # FCN3.1 ships no published training recipe; this is the net-default
        # configuration (ref models/networks/fourcastnet3_1.py:653-694:
        # per-variable embed 8, 4 layers, harmonic/mean basis, gelu,
        # hard_thresholding 0.25) at the bench resolution, scale_factor 2 to
        # match the FCN3 row's internal grid
        params.update(
            dict(
                nettype="FCN3.1",
                scale_factor=int(os.environ.get("BENCH_SCALE_FACTOR", 2)),
                embed_dim=int(os.environ.get("BENCH_EMBED", 8)),
                aux_embed_dim=int(os.environ.get("BENCH_AUX_EMBED", 8)),
                pos_embed_dim=8,
                num_layers=int(os.environ.get("BENCH_LAYERS", 4)),
                sfno_block_frequency=2,
                kernel_shape=[3, 3],
                filter_basis_type="harmonic",
                filter_basis_norm_mode="mean",
                hard_thresholding_fraction=0.25,
                normalization_layer="none",
                channels_last=os.environ.get("BENCH_CHANNELS_LAST", "1") == "1",
            ),
            allow_new=True,
        )
    elif nettype == "SNO":
        # SNO net defaults (ref models/networks/snonet.py:576-604) sized to
        # the SFNO flagship width for comparability (embed 384, 8 layers)
        params.update(
            dict(
                nettype="SNO",
                scale_factor=int(os.environ.get("BENCH_SCALE_FACTOR", 2)),
                embed_dim=int(os.environ.get("BENCH_EMBED", 384)),
                num_layers=int(os.environ.get("BENCH_LAYERS", 8)),
                kernel_shape=[3, 3],
                encoder_kernel_shape=[3, 3],
                filter_basis_type="harmonic",
                filter_basis_norm_mode="mean",
                normalization_layer="none",
                channels_last=os.environ.get("BENCH_CHANNELS_LAST", "1") == "1",
            ),
            allow_new=True,
        )

    if ens > 1:
        # default B=1 in ensemble mode: the folded batch is B*E members
        batch = int(os.environ.get("BENCH_BATCH", 1))
        params.update(
            dict(
                ensemble_size=ens,
                input_noise={
                    "type": "diffusion",
                    "mode": "concatenate",
                    "n_channels": 8,
                    "centered": True,
                    "sigma": 1.0,
                    "lambd": 1.0,
                },
                losses=[
                    {
                        "type": "crps",
                        "channel_weights": "constant",
                        "parameters": {"crps_type": "skillspread"},
                    }
                ],
            ),
            allow_new=True,
        )

    model, _ = get_model(params, multistep=True)
    loss_obj = LossHandler(params)

    rng = np.random.RandomState(0)
    if ens > 1:
        # members of a sample share the input; noise channels differentiate
        # them (EnsembleTrainer._prepare_ensemble_batch folds the same way)
        x1 = rng.randn(batch, 73, nlat, nlon).astype(np.float32)
        x = jnp.asarray(np.repeat(x1, ens, axis=0))
        # unpredicted channels: [zenith, 8 diffusion-noise] per member, drawn
        # outside the jitted step exactly as the trainer does
        zen = jnp.asarray(rng.randn(batch * ens, 1, 9, nlat, nlon).astype(np.float32))
        tar = jnp.asarray(rng.randn(batch, 73, nlat, nlon).astype(np.float32))
    else:
        x = jnp.asarray(rng.randn(batch, 73, nlat, nlon).astype(np.float32))
        zen = jnp.asarray(rng.randn(batch, 1, 1, nlat, nlon).astype(np.float32))
        tar = jnp.asarray(rng.randn(batch, 73, nlat, nlon).astype(np.float32))

    model_params = model.init(jax.random.PRNGKey(0), x, zen)
    # bf16 Adam first moment by default: halves the m-state HBM footprint and
    # traffic (+4.4% measured; nu stays fp32). BENCH_MU_DTYPE=float32 reverts.
    mu_dtype = {"bfloat16": jnp.bfloat16, "float32": None}[os.environ.get("BENCH_MU_DTYPE", "bfloat16")]
    # round-3 byte cuts (both default-on; set =0 to ablate):
    #   BENCH_NU_FACTORED — Adafactor-style factored second moment for the big
    #     weight stacks (kills ~0.6 GB/step of nu read+write traffic)
    #   BENCH_PARAM_MIRROR — carry a bf16 weight mirror across steps so the
    #     forward reads half the param bytes and the per-step fp32->bf16 cast
    #     of every weight disappears; the fp32 master lives with the optimizer
    # measured (PERF.md round 3): factored nu +3.7%; the mirror is a slight
    # net negative (XLA already CSEs the weight cast once per step, and the
    # mirror adds a bf16 param write) — default off, kept for ablations
    nu_factored = os.environ.get("BENCH_NU_FACTORED", "1") == "1"
    param_mirror = os.environ.get("BENCH_PARAM_MIRROR", "0") == "1"

    from makani_tpu.utils.training.optimizer import cast_params, scale_by_adam_factored

    if nu_factored:
        tx = optax.chain(scale_by_adam_factored(mu_dtype=mu_dtype), optax.scale_by_learning_rate(1e-3))
    else:
        tx = optax.adam(1e-3, mu_dtype=mu_dtype)
    opt_state = tx.init(model_params)

    from functools import partial

    if ens > 1:
        # BENCH_ENSEMBLE_CHUNK=c (divides E): member-chunked forward. The
        # model forward is member-independent — only the CRPS loss couples
        # members — so a rematerialized lax.scan over E/c chunks caps the
        # activation peak at one chunk (the bf16[E,H,W,2*embed] encoder
        # hidden at full res was the single-chip E=16 OOM) while storing only
        # the (E, C, H, W) predictions for the joint loss.
        chunk = int(os.environ.get("BENCH_ENSEMBLE_CHUNK", "0") or 0)

        if chunk and chunk < ens:
            n_chunks = ens // chunk

            def _to_chunks(t):
                # (B*E, ...) member-major per sample -> (E/c, B*c, ...)
                t = t.reshape(batch, n_chunks, chunk, *t.shape[1:])
                t = jnp.swapaxes(t, 0, 1)
                return t.reshape(n_chunks, batch * chunk, *t.shape[3:])

            def loss_fn(q, inp, target, z):
                xg, zg = _to_chunks(inp), _to_chunks(z)

                @jax.checkpoint
                def body(_, xz):
                    xi, zi = xz
                    return None, model.apply(q, xi, zi, train=True)

                _, preds = jax.lax.scan(body, None, (xg, zg))
                # (E/c, B*c, C, H, W) -> (B, E, C, H, W)
                preds = preds.reshape(n_chunks, batch, chunk, *preds.shape[2:])
                pred = jnp.swapaxes(preds, 0, 1).reshape(batch, ens, *preds.shape[3:])
                return loss_obj(pred, target, train=True)

        else:

            def loss_fn(q, inp, target, z):
                pred = model.apply(q, inp, z, train=True)  # (B*E, C, H, W)
                pred = pred.reshape(batch, ens, *pred.shape[1:])
                return loss_obj(pred, target, train=True)

    else:

        def loss_fn(q, inp, target, z):
            pred = model.apply(q, inp, z, train=True)
            return loss_obj(pred, target, inp=inp, train=True)

    tabs_arg = ()  # optional trailing (tables,) argument for the train step
    if param_mirror:
        mirror = cast_params(model_params, jnp.bfloat16)

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step(pc, master, s, inp, target, z):
            loss, grads = jax.value_and_grad(loss_fn)(pc, inp, target, z)
            g32 = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
            updates, s = tx.update(g32, s, master)
            master = optax.apply_updates(master, updates)
            pc = cast_params(master, jnp.bfloat16)
            return loss, pc, master, s

        carry = (mirror, model_params, opt_state)
    else:

        def _train_step(p, s, inp, target, z):
            loss, grads = jax.value_and_grad(loss_fn)(p, inp, target, z)
            updates, s = tx.update(grads, s, p)
            return loss, optax.apply_updates(p, updates), s

        # BENCH_SCAN=K runs K steps per dispatch via lax.scan: the relay's
        # per-call RPC overhead is a sandbox artifact, not a chip cost; the
        # scan body is the identical step (same batch re-fed — timing is
        # data-independent), so this measures pure device throughput.
        if scan_k > 1:
            step_fn = _train_step

            def _train_step(p, s, inp, target, z):
                def body(c, _):
                    loss, p2, s2 = step_fn(c[0], c[1], inp, target, z)
                    return (p2, s2), loss

                (p, s), losses = jax.lax.scan(body, (p, s), xs=None, length=scan_k)
                return losses[-1], p, s

        # MAKANI_DISCO_TABLE_ARGS=1: pass the DISCO psi tables as a runtime
        # jit argument instead of baking them as HLO constants. At FCN3.1's
        # dense-table sizes (and FCN3 at 0.25 deg) the baked constants push
        # the serialized compile request past the relay's body limit
        # (HTTP 413); as arguments the program stays small and the tables
        # ride one device_put. Protocol: one registry-filling abstract trace,
        # then trace/compile inside disco_table_context.
        if os.environ.get("MAKANI_DISCO_TABLE_ARGS", "0") == "1":
            from makani_tpu.ops import disco as _disco

            _base_step = _train_step
            jax.eval_shape(_base_step, model_params, opt_state, x, tar, zen)
            _host_tabs = dict(_disco.disco_table_registry())
            print(
                f"# disco table args: {len(_host_tabs)} tables, "
                f"{sum(v.nbytes for v in _host_tabs.values()) / 1e9:.2f} GB",
                file=sys.stderr,
            )
            tabs_arg = ({k: jax.device_put(jnp.asarray(v)) for k, v in _host_tabs.items()},)

            def _train_step(p, s, inp, target, z, tabs):
                with _disco.disco_table_context(tabs):
                    return _base_step(p, s, inp, target, z)

        carry = (model_params, opt_state)

        # AUTO layouts for the carried state: XLA picks the dhconv weight
        # layout its einsums want, so the per-step relayout copies of the
        # (1,384,384,L,2) stacks (~1.7 GB/step; HLO census scripts/r3)
        # disappear. Measured +3.5% (12.82 -> 13.27 samples/s). The batch
        # inputs keep default layouts (they arrive from the host).
        # BENCH_AUTO_LAYOUT=0 reverts.
        train_step = None
        if os.environ.get("BENCH_AUTO_LAYOUT", "1") == "1":
            try:
                from jax.experimental.layout import Format, Layout

                auto, deflt = Format(Layout.AUTO), Format()
                # AUTO for the batch too: the host-fed target otherwise takes
                # a 0.75 GB relayout copy per step ({2,3,1,0} -> {2,1,3,0},
                # the loss runs channels-last) — the loader's device transfer
                # can emit the preferred layout directly, so device_put here
                # mirrors production.
                # optional TPU compiler options (e.g. BENCH_SCOPED_VMEM_KIB
                # raises the scoped-VMEM budget for deeper fusions); passed
                # per-jit because the relay's local XLA client rejects TPU
                # server flags in XLA_FLAGS
                copts = {}
                if os.environ.get("BENCH_SCOPED_VMEM_KIB"):
                    copts["xla_tpu_scoped_vmem_limit_kib"] = os.environ["BENCH_SCOPED_VMEM_KIB"]
                jitted = jax.jit(
                    _train_step,
                    in_shardings=(auto, auto, auto, auto, auto) + (deflt,) * len(tabs_arg),
                    out_shardings=(deflt, auto, auto),
                    donate_argnums=(0, 1),
                    compiler_options=copts or None,
                )
                compiled = jitted.lower(model_params, opt_state, x, tar, zen, *tabs_arg).compile()
                fmts = compiled.input_formats[0]
                # relayout via a jitted identity rather than device_put: the
                # relay has been seen to drop device_put's custom layouts
                # (silently), while compiled-program OUTPUT layouts are the
                # same mechanism the train step itself relies on
                # donate the train state into its new layouts: at 0.25 deg the
                # un-donated relayout transiently doubles the whole state and
                # OOMs. x/tar/zen are NOT donated — the fallback path reuses
                # them (state it rebuilds from scratch).
                relayout_state = jax.jit(lambda t: t, out_shardings=tuple(fmts[:2]), donate_argnums=(0,))
                carry0, carry1 = relayout_state((model_params, opt_state))
                model_params = opt_state = None
                relayout_data = jax.jit(lambda t: t, out_shardings=tuple(fmts[2:5]))
                x_l, tar_l, zen_l = relayout_data((x, tar, zen))
                carry_l = (carry0, carry1)
                # probe one call end-to-end (including the loss fetch): the
                # relay's device_put has been seen to drop custom layouts,
                # which only surfaces at call time — fall back cleanly then
                loss, *carry_l = compiled(*carry_l, x_l, tar_l, zen_l, *tabs_arg)
                float(loss)
                carry = carry_l
                x, tar, zen = x_l, tar_l, zen_l
                train_step = compiled
                warmup = max(warmup - 1, 0)  # the probe was one warmup step
            except Exception as e:
                print(f"# auto-layout unavailable ({type(e).__name__}: {e}); falling back", file=sys.stderr)
                # free every AUTO-path buffer before the fallback rebuilds
                # state: at 0.25 deg the leftover relayout copies otherwise
                # OOM the fallback run
                carry0 = carry1 = x_l = tar_l = zen_l = carry_l = compiled = fmts = jitted = None  # noqa: F841
        if train_step is None:
            train_step = jax.jit(_train_step, donate_argnums=(0, 1))
            # the probe may have donated the original buffers; rebuild state
            model_params = model.init(jax.random.PRNGKey(0), x, zen)
            opt_state = tx.init(model_params)
            carry = (model_params, opt_state)

    # BENCH_DUMP_HLO=<path>: write the optimized HLO of the compiled step (to
    # map profiler fusion names back to ops) and exit without timing
    dump = os.environ.get("BENCH_DUMP_HLO")
    if dump:
        compiled = train_step if hasattr(train_step, "as_text") else train_step.lower(*carry, x, tar, zen, *tabs_arg).compile()
        with open(dump, "w") as f:
            f.write(compiled.as_text())
        print(json.dumps({"metric": "hlo-dump", "value": 0.0, "unit": "", "vs_baseline": 0.0}))
        return

    for _ in range(warmup):
        loss, *carry = train_step(*carry, x, tar, zen, *tabs_arg)
    # force a host readback: on the remote-TPU relay, block_until_ready
    # returns before execution completes, so only a value fetch synchronizes
    float(loss)

    t0 = time.perf_counter()
    for _ in range(steps):
        loss, *carry = train_step(*carry, x, tar, zen, *tabs_arg)
    final_loss = float(loss)
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(final_loss), f"non-finite loss {final_loss}"

    sps = batch * scan_k / dt

    # MFU from the XLA-compiled step's own cost analysis (flops per step)
    flops_per_sample = None
    mfu = None
    try:
        if hasattr(train_step, "cost_analysis"):  # pre-compiled (auto-layout path)
            ca = train_step.cost_analysis()
        else:
            ca = train_step.lower(*carry, x, tar, zen, *tabs_arg).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            # XLA's cost_analysis reports a while-loop body once, so the
            # scanned program's flops are already per-step
            flops_per_sample = flops / batch
            peak = float(os.environ.get("BENCH_PEAK_TFLOPS", 197)) * 1e12  # v5e bf16
            mfu = sps * flops_per_sample / peak
    except Exception:
        pass

    # FLOP/byte-roofline A100-80GB estimate of the reference at this config
    # (derivation in BASELINE.md); override with BENCH_BASELINE_SPS
    baseline = float(os.environ.get("BENCH_BASELINE_SPS", 13.6))
    if disco_family:
        desc = f"{nettype}-73ch {nlat}x{nlon} L{params.get('num_layers')}"
    else:
        desc = f"SFNO-73ch {nlat}x{nlon} e{embed}L{layers}"
    if ens > 1:
        desc += f" ens{ens} CRPS"
    result = {
        "metric": f"{desc} bf16 train samples/sec/chip",
        "value": round(sps, 4),
        "unit": "samples/s/chip",
        "vs_baseline": round(sps / baseline, 4),
    }
    if mfu is not None:
        result["mfu"] = round(mfu, 4)
        result["flops_per_sample"] = flops_per_sample
    result.update(_run_extras())
    print(json.dumps(result))


def _run_extras():
    """Sub-benchmarks machine-recorded alongside the headline (one JSON line).

    The headline row is the SFNO 0.5° deterministic step; the reference's
    other first-class workloads — FCN3 (published recipe) and the
    ensemble-CRPS probabilistic step — get their own measured rows so
    BENCH_r*.json tracks them round-over-round. Each runs as a SUBPROCESS so
    an OOM/crash in an extra cannot lose the headline measurement.

    BENCH_EXTRA: comma list from {fcn3, ensemble} (default both; "0" or ""
    disables). Children run with BENCH_EXTRA=0 set.
    """
    import subprocess

    spec = os.environ.get("BENCH_EXTRA", "fcn3,ensemble")
    if os.environ.get("BENCH_NETTYPE") or os.environ.get("BENCH_ENSEMBLE"):
        # already a specialized invocation — no recursion
        spec = ""
    if not spec or spec == "0":
        return {}
    budget = int(os.environ.get("BENCH_EXTRA_TIMEOUT", 2400))
    # overall wall budget across ALL extras: the driver runs bench.py under
    # its own timeout; never let sub-benchmarks starve the headline record
    deadline = time.time() + int(os.environ.get("BENCH_EXTRA_DEADLINE", 3300))
    # measured-best configs (PERF.md round 4/5): FCN3 needs bf16-DISCO +
    # remat 3 to fit; ensemble-16 at 0.5 deg needs the selective remat
    cfgs = {
        "fcn3": {
            "BENCH_NETTYPE": "FCN3",
            "BENCH_BATCH": os.environ.get("BENCH_FCN3_BATCH", "1"),
            "BENCH_CHECKPOINTING": "3",
            "BENCH_SCAN": "8",
            "MAKANI_DISCO_BF16": "1",
        },
        "ensemble": {
            "BENCH_ENSEMBLE": os.environ.get("BENCH_ENSEMBLE_SIZE", "16"),
            "BENCH_BATCH": "1",
            "BENCH_REMAT": os.environ.get("BENCH_ENSEMBLE_REMAT", "save_transforms_stats"),
            # E=16 unchunked OOMs on one 16 GB chip (the full-res encoder
            # hidden for all folded members); 4-member chunks fit
            "BENCH_ENSEMBLE_CHUNK": os.environ.get("BENCH_ENSEMBLE_CHUNK", "4"),
            "BENCH_SCAN": "8",
        },
    }
    out = {}
    for name in [s.strip() for s in spec.split(",") if s.strip()]:
        if name not in cfgs:
            out[name] = {"error": "unknown extra"}
            continue
        remaining = deadline - time.time()
        if remaining < 300:
            out[name] = {"error": "skipped: extras deadline"}
            continue
        env = dict(os.environ, BENCH_EXTRA="0", **cfgs[name])
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=min(budget, remaining),
            )
            line = next((l for l in reversed(proc.stdout.strip().splitlines()) if l.startswith("{")), None)
            if proc.returncode == 0 and line:
                out[name] = json.loads(line)
            else:
                text = (proc.stderr or proc.stdout or "").strip()
                lines = text.splitlines()
                # surface the OOM/abort summary (it sits near the top of the
                # allocation dump, not in the last lines)
                key = [l for l in lines if any(s in l for s in ("RESOURCE_EXHAUSTED", "Out of memory", "exceeds the", "Error"))][:2]
                out[name] = {"error": f"rc={proc.returncode}", "tail": " | ".join(key + lines[-2:])[-500:]}
        except subprocess.TimeoutExpired:
            out[name] = {"error": f"timeout>{budget}s"}
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {e}"}
    return {"extra": out} if out else {}


if __name__ == "__main__":
    main()
