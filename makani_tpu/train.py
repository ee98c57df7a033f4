"""Training CLI (ref makani/train.py:36-193).

    python -m makani_tpu.train --yaml_config config/sfnonet.yaml \
        --config sfno_linear_73chq_sc3_layers8_edim384 --run_num 0

Parallelism is expressed as mesh axis sizes (--h_parallel_size etc.); there is
no mpirun — one process drives all local devices under SPMD.
"""

from __future__ import annotations

import argparse
import logging
import os


def get_parser():
    parser = argparse.ArgumentParser(description="makani-tpu training")
    parser.add_argument("--yaml_config", type=str, default="config/sfnonet.yaml")
    parser.add_argument("--config", type=str, default="base_config")
    parser.add_argument("--run_num", type=str, default="00")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--max_epochs", type=int, default=None)
    parser.add_argument("--h_parallel_size", type=int, default=1)
    parser.add_argument("--w_parallel_size", type=int, default=1)
    parser.add_argument("--parameters_split_size", type=int, default=1)
    parser.add_argument("--ensemble_parallel_size", type=int, default=1)
    parser.add_argument("--amp_mode", type=str, default=None, choices=[None, "none", "bf16"])
    parser.add_argument("--enable_synthetic_data", action="store_true")
    parser.add_argument("--multistep_count", type=int, default=None)
    parser.add_argument("--save_checkpoint", type=str, default=None)
    parser.add_argument("--checkpoint_path", type=str, default=None)
    parser.add_argument("--pretrained_checkpoint_path", type=str, default=None)
    # multi-host SPMD (ref comm.py mpirun/srun bootstrap; here one process per
    # host, wired by jax.distributed). --multihost with no further args uses
    # TPU-pod/SLURM auto-detection.
    parser.add_argument("--multihost", action="store_true")
    parser.add_argument("--coordinator_address", type=str, default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    return parser


def init_multihost_from_args(args) -> int:
    """Bring up jax.distributed if requested; returns this process's rank."""
    from makani_tpu.parallel import multihost

    if getattr(args, "multihost", False) or getattr(args, "coordinator_address", None):
        multihost.init_multihost(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    return multihost.process_index()


def build_params(args):
    from makani_tpu.utils.parse_dataset_metadata import parse_dataset_metadata
    from makani_tpu.utils.yparams import YParams

    params = YParams(args.yaml_config, args.config)
    params["h_parallel_size"] = args.h_parallel_size
    params["w_parallel_size"] = args.w_parallel_size
    params["parameters_split_size"] = args.parameters_split_size
    params["ensemble_parallel_size"] = args.ensemble_parallel_size
    if args.batch_size is not None:
        params["batch_size"] = args.batch_size
    if args.max_epochs is not None:
        params["max_epochs"] = args.max_epochs
    if args.enable_synthetic_data:
        params["enable_synthetic_data"] = True
    if args.amp_mode is not None:
        params["compute_dtype"] = "bfloat16" if args.amp_mode == "bf16" else "float32"
    if args.multistep_count is not None:
        params["n_future"] = args.multistep_count - 1
    if args.save_checkpoint is not None:
        params["save_checkpoint"] = args.save_checkpoint

    meta_path = params.get("metadata_json_path")
    if meta_path and os.path.isfile(meta_path):
        parse_dataset_metadata(meta_path, params)
    elif params.get("in_channels") is None:
        n = len(params.get("channel_names"))
        params["in_channels"] = list(range(n))
        params["out_channels"] = list(range(n))

    exp_dir = os.path.join(params.get("exp_dir", "/tmp/makani_tpu_runs"), args.config, str(args.run_num))
    params["experiment_dir"] = exp_dir
    params["checkpoint_dir"] = os.path.join(exp_dir, "checkpoints")
    os.makedirs(exp_dir, exist_ok=True)

    # auto-detect resume (ref train.py:107-114)
    from makani_tpu.utils.checkpoint_helpers import get_latest_checkpoint_version

    params["resuming"] = get_latest_checkpoint_version(params["checkpoint_dir"]) is not None
    return params


def main():
    args = get_parser().parse_args()
    world_rank = init_multihost_from_args(args)  # must precede any backend use
    logging.basicConfig(level=logging.INFO if world_rank == 0 else logging.WARNING)
    params = build_params(args)

    if getattr(args, "enable_grad_anomaly_detection", False):
        # fail fast on the first NaN anywhere in a jit computation
        # (ref train.py:91-92 torch.autograd.set_detect_anomaly)
        import jax

        jax.config.update("jax_debug_nans", True)

    from makani_tpu.utils.training.deterministic_trainer import Trainer

    trainer = Trainer(params, world_rank=world_rank)

    trace_dir = getattr(args, "capture_trace_dir", None)
    if trace_dir:
        import jax

        with jax.profiler.trace(trace_dir):
            trainer.train()
    else:
        trainer.train()


if __name__ == "__main__":
    main()
