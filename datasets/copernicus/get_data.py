"""ERA5 downloader via the Copernicus CDS API
(ref datasets/copernicus/get_data.py; the reference marks it deprecated in
favor of data_process/convert_wb2_to_makani_input.py, which we also ship).

Fetches analysis fields (u, v, z, t, q on the 50..1000 hPa levels plus the
surface set) per (year, month) into netCDF files under <output_dir>/raw,
which h5_convert.py / convert_wb2_to_makani_input.py turn into yearly makani
HDF5. Requires the ``cdsapi`` package and a configured ~/.cdsapirc; both are
checked at runtime so the rest of the framework carries no CDS dependency.

    python -m datasets.copernicus.get_data --output_dir /data/era5 \
        --years 2017 2018 --hourly_subsample 6
"""

from __future__ import annotations

import argparse
import os

PRESSURE_LEVELS = list(range(50, 1050, 50))
# ECMWF GRIB parameter ids: u, v, z, t, q
PL_PARAMS = "131/132/129.128/130.128/133.128"
# surface: 10u, 10v, 100u, 100v, 2t, sp, msl, tcwv
SFC_PARAMS = "165.128/166.128/246.228/247.228/167.128/134.128/151.128/137.128"


def _client():
    try:
        import cdsapi
    except ImportError as e:
        raise SystemExit(
            "cdsapi is not installed. Install it (pip install cdsapi) and create "
            "~/.cdsapirc with your CDS credentials (https://cds.climate.copernicus.eu/how-to-api)."
        ) from e
    return cdsapi.Client()


def _retrieve(client, request: dict, path: str, overwrite: bool):
    if os.path.isfile(path):
        if not overwrite:
            print(f"{path} exists, skipping (use --overwrite to refetch)")
            return
        os.remove(path)
    client.retrieve("reanalysis-era5-complete", request, path)


def download_years(output_dir: str, years, hourly_subsample: int = 6, resolution: float = 0.25, overwrite: bool = False):
    base = os.path.join(output_dir, "raw")
    os.makedirs(base, exist_ok=True)
    times = [f"{t:02d}:00" for t in range(0, 24, hourly_subsample)]
    client = _client()

    common = {
        "class": "ea",
        "expver": "1",
        "stream": "oper",
        "type": "an",
        "grid": [resolution, resolution],
        "format": "netcdf",
        "time": times,
    }
    for year in years:
        for month in range(1, 13):
            date = f"{year}-{month:02d}-01/to/{year}-{month:02d}-31"
            for pl in PRESSURE_LEVELS:
                _retrieve(
                    client,
                    dict(common, levtype="pl", levelist=str(pl), param=PL_PARAMS, date=date),
                    os.path.join(base, f"pl_{pl}_{year}-{month:02d}.nc"),
                    overwrite,
                )
            _retrieve(
                client,
                dict(common, levtype="sfc", param=SFC_PARAMS, date=date),
                os.path.join(base, f"sfc_{year}-{month:02d}.nc"),
                overwrite,
            )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--years", type=int, nargs="+", required=True)
    parser.add_argument("--hourly_subsample", type=int, default=6)
    parser.add_argument("--resolution", type=float, default=0.25)
    parser.add_argument("--overwrite", action="store_true")
    args = parser.parse_args()
    download_years(args.output_dir, args.years, args.hourly_subsample, args.resolution, args.overwrite)


if __name__ == "__main__":
    main()
