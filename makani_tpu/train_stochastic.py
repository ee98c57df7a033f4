"""Stochastic-interpolant training CLI (ref makani/train_stochastic.py)."""

from __future__ import annotations

import logging


def main():
    from makani_tpu.train import build_params, get_parser

    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO)
    params = build_params(args)

    from makani_tpu.utils.training.stochastic_trainer import StochasticTrainer

    StochasticTrainer(params).train()


if __name__ == "__main__":
    main()
