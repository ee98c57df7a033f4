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
    # date-range IC selection + side datasets (ref makani/inference.py CLI)
    parser.add_argument("--start_date", type=str, default=None, help="first initial condition, ISO format YYYY-MM-DD")
    parser.add_argument("--end_date", type=str, default=None, help="last initial condition, ISO format YYYY-MM-DD")
    parser.add_argument("--mask_file", type=str, default=None, help="HDF5 of spatial masks for masked metrics")
    parser.add_argument("--climatology_file", type=str, default=None, help="HDF5 per-date climatology for anomaly scoring")
    parser.add_argument("--save_raw_forecasts", action="store_true")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    params = build_params(args)
    if args.inf_data_path:
        params["inf_data_path"] = args.inf_data_path
    for key in ("start_date", "end_date", "mask_file", "climatology_file"):
        if getattr(args, key, None):
            params[key] = getattr(args, key)
    if args.save_raw_forecasts:
        params["save_raw_forecasts"] = True

    from makani_tpu.utils.inference.inferencer import Inferencer

    inferencer = Inferencer(params)
    logs = inferencer.score_model(output_dir=args.output_dir or params.get("experiment_dir"))
    inferencer.log_score(logs)


if __name__ == "__main__":
    main()
