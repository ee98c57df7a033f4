"""CLI argument surface (ref makani/utils/argument_parser.py:25-181).

The canonical flag set shared by the train/ensemble/inference/stochastic
entry points; `makani_tpu.train.get_parser` builds on this.
"""

from __future__ import annotations

import argparse

__all__ = ["get_default_argument_parser"]


def get_default_argument_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="makani-tpu")

    # config selection
    parser.add_argument("--yaml_config", type=str, default="config/sfnonet.yaml")
    parser.add_argument("--config", type=str, default="base_config")
    parser.add_argument("--run_num", type=str, default="00")

    # parallelism (mesh axis sizes; ref flags --h_parallel_size etc.)
    parser.add_argument("--fin_parallel_size", type=int, default=1, help="legacy; folded into matmul")
    parser.add_argument("--fout_parallel_size", type=int, default=1, help="legacy; folded into matmul")
    parser.add_argument("--h_parallel_size", type=int, default=1)
    parser.add_argument("--w_parallel_size", type=int, default=1)
    parser.add_argument("--parameters_split_size", type=int, default=1)
    parser.add_argument("--ensemble_parallel_size", type=int, default=1)

    # training overrides
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--max_epochs", type=int, default=None)
    parser.add_argument("--amp_mode", type=str, default=None, choices=[None, "none", "bf16"])
    parser.add_argument("--enable_synthetic_data", action="store_true")
    parser.add_argument("--multistep_count", type=int, default=None)
    parser.add_argument("--multistep_checkpoint", action="store_true")
    parser.add_argument("--checkpointing_level", type=int, default=None)

    # checkpointing
    parser.add_argument("--save_checkpoint", type=str, default=None)
    parser.add_argument("--checkpoint_path", type=str, default=None)
    parser.add_argument("--pretrained_checkpoint_path", type=str, default=None)

    # profiling / debugging (ref argument_parser.py:133-155)
    parser.add_argument("--enable_benchy", action="store_true")
    parser.add_argument("--capture_range_start", type=int, default=1)
    parser.add_argument("--capture_range_stop", type=int, default=2)
    parser.add_argument("--capture_trace_dir", type=str, default=None, help="jax.profiler trace output dir")
    parser.add_argument(
        "--enable_grad_anomaly_detection",
        action="store_true",
        help="abort on NaN in any jit computation (jax_debug_nans; ref train.py:91-92 torch anomaly mode)",
    )
    return parser
