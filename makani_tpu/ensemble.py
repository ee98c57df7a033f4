"""Ensemble training CLI (ref makani/ensemble.py:36-229).

    python -m makani_tpu.ensemble --yaml_config config/fourcastnet3.yaml \
        --config fcn3_sc2_edim45_layers10 --run_num 0
"""

from __future__ import annotations

import logging


def main():
    from makani_tpu.train import build_params, get_parser

    parser = get_parser()
    parser.add_argument("--ensemble_size", type=int, default=None)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    params = build_params(args)
    if args.ensemble_size is not None:
        params["ensemble_size"] = args.ensemble_size

    from makani_tpu.utils.training.ensemble_trainer import EnsembleTrainer

    trainer = EnsembleTrainer(params)
    trainer.train()


if __name__ == "__main__":
    main()
