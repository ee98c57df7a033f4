"""Inference/scoring CLI (ref makani/inference.py).

    python -m makani_tpu.inference --yaml_config ... --config ... --run_num 0
"""

from __future__ import annotations

import logging


def main():
    from makani_tpu.train import build_params, get_parser

    parser = get_parser()
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--inf_data_path", type=str, default=None)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    params = build_params(args)
    if args.inf_data_path:
        params["inf_data_path"] = args.inf_data_path

    from makani_tpu.utils.inference.inferencer import Inferencer

    inferencer = Inferencer(params)
    logs = inferencer.score_model(output_dir=args.output_dir or params.get("experiment_dir"))
    inferencer.log_score(logs)


if __name__ == "__main__":
    main()
