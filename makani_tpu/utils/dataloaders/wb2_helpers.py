"""WeatherBench2 interop helpers (ref makani/utils/dataloaders/wb2_helpers.py
and data_process/convert_*_wb2*.py).

WeatherBench2 stores data as zarr with channel-per-variable layout,
ascending latitudes (south first) and hPa level coordinates; makani-style
datasets are single (T, C, H, W) HDF5 stacks with descending latitudes. These
helpers translate names, orderings and layouts. Zarr IO itself is gated on
the optional dependency (not present in this image); the array-level
conversions are dependency-free and unit-tested.
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence

import numpy as np

__all__ = [
    "wb2_variable_name",
    "makani_channel_name",
    "split_channel_name",
    "to_wb2_layout",
    "from_wb2_layout",
]

# surface-variable name mapping makani <-> WB2
_SURFACE_TO_WB2 = {
    "u10m": "10m_u_component_of_wind",
    "v10m": "10m_v_component_of_wind",
    "u100m": "100m_u_component_of_wind",
    "v100m": "100m_v_component_of_wind",
    "t2m": "2m_temperature",
    "2d": "2m_dewpoint_temperature",
    "sp": "surface_pressure",
    "msl": "mean_sea_level_pressure",
    "tcwv": "total_column_water_vapour",
    "tp": "total_precipitation",
    "sst": "sea_surface_temperature",
}
_ATMO_TO_WB2 = {
    "u": "u_component_of_wind",
    "v": "v_component_of_wind",
    "z": "geopotential",
    "t": "temperature",
    "q": "specific_humidity",
    "r": "relative_humidity",
    "w": "vertical_velocity",
}
_WB2_TO_SURFACE = {v: k for k, v in _SURFACE_TO_WB2.items()}
_WB2_TO_ATMO = {v: k for k, v in _ATMO_TO_WB2.items()}


def split_channel_name(name: str):
    """("z", 500) for "z500"; (name, None) for surface channels."""
    m = re.match(r"^([a-z]+?)(\d{1,4})$", name)
    if m and name not in _SURFACE_TO_WB2 and m.group(1) in _ATMO_TO_WB2:
        return m.group(1), int(m.group(2))
    return name, None


def wb2_variable_name(channel: str):
    """makani channel -> (wb2 variable, level or None)."""
    var, level = split_channel_name(channel)
    if level is None:
        if channel not in _SURFACE_TO_WB2:
            raise KeyError(f"no WB2 mapping for channel {channel}")
        return _SURFACE_TO_WB2[channel], None
    return _ATMO_TO_WB2[var], level


def makani_channel_name(wb2_var: str, level=None) -> str:
    if level is None:
        return _WB2_TO_SURFACE[wb2_var]
    return f"{_WB2_TO_ATMO[wb2_var]}{int(level)}"


def to_wb2_layout(fields: np.ndarray, channel_names: Sequence[str]) -> Dict[str, np.ndarray]:
    """(T, C, H, W) stack with descending lats -> {wb2_var: (T, [L,] H, W)}
    with ascending lats and level-stacked atmospheric variables."""
    out: Dict[str, List] = {}
    levels: Dict[str, List[int]] = {}
    for c, name in enumerate(channel_names):
        var, level = wb2_variable_name(name)
        arr = fields[:, c, ::-1, :]  # flip to ascending latitude
        if level is None:
            out[var] = arr
        else:
            out.setdefault(var, []).append(arr)
            levels.setdefault(var, []).append(level)
    result = {}
    for var, val in out.items():
        if isinstance(val, list):
            order = np.argsort(levels[var])
            result[var] = np.stack([val[i] for i in order], axis=1)
            result[var + "__levels"] = np.asarray(sorted(levels[var]))
        else:
            result[var] = val
    return result


def from_wb2_layout(data: Dict[str, np.ndarray], channel_names: Sequence[str]) -> np.ndarray:
    """Inverse of :func:`to_wb2_layout`: assemble the (T, C, H, W) stack."""
    sample = next(v for k, v in data.items() if not k.endswith("__levels"))
    T, H, W = sample.shape[0], sample.shape[-2], sample.shape[-1]
    C = len(channel_names)
    out = np.zeros((T, C, H, W), sample.dtype)
    for c, name in enumerate(channel_names):
        var, level = wb2_variable_name(name)
        if level is None:
            arr = data[var]
        else:
            lv = list(np.asarray(data[var + "__levels"]))
            arr = data[var][:, lv.index(level)]
        out[:, c] = arr[:, ::-1, :]  # back to descending latitude
    return out
