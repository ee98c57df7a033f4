"""NSF NCAR ERA5 (RDA d633000) S3 sourcing helpers
(ref makani/utils/dataloaders/ncar_helpers.py:48-343).

The public bucket ``s3://nsf-ncar-era5`` serves ERA5 at the native 0.25
degree grid (already the latitude 90..-90 / longitude 0..359.75 layout this
framework expects) as netCDF4/HDF5 objects, keyed

    <stream>/<YYYYMM>/<stream>.<param>_<short>.ll025<grid>.<start>_<end>.nc

with per-day files for pressure-level analysis, per-month files for surface
analysis, and per-half-month files for the de-accumulated forecast stream.
This module holds only the pure key/grouping/window arithmetic (no IO): the
object-store connector (``object_store.py``) does the fetching, and
``data_process/`` converts to the training layout.
"""

from __future__ import annotations

import calendar
import datetime as dt
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

__all__ = [
    "VarSpec",
    "NCAR_ERA5_BUCKET",
    "SURFACE_VARS",
    "ATMO_VARS",
    "ACCUM_VARS",
    "split_channel",
    "SourceGroup",
    "group_channels",
    "pl_day_key",
    "sfc_month_key",
    "accum_halfmonth_key",
    "accum_segments",
    "latest_accum_init",
    "hours_since_epoch",
]

NCAR_ERA5_BUCKET = "nsf-ncar-era5"

# netCDF "hours since" reference used throughout d633000
_EPOCH = dt.datetime(1900, 1, 1, tzinfo=dt.timezone.utc)

# the de-accumulated forecast stream initializes at 06Z/18Z, each run serving
# forecast hours 1..12 so the two daily runs tile every hour exactly once
ACCUM_INIT_HOURS = (6, 18)
ACCUM_HOURS_PER_RUN = 12


@dataclass(frozen=True)
class VarSpec:
    """One variable's location within the bucket: key-path pieces plus the
    (upper-case, irregular) netCDF variable name inside the file."""

    stream: str
    param: str  # ECMWF table_code, e.g. "128_129"
    short: str  # short name in the object key, e.g. "z"
    grid: str  # "sc" scalars / "uv" pressure-level winds
    nc_name: str  # variable name inside the netCDF, e.g. "Z" or "VAR_10U"


# dataset facts: ERA5 channel -> d633000 source (public bucket schema)
SURFACE_VARS: Dict[str, VarSpec] = {
    "u10m": VarSpec("e5.oper.an.sfc", "128_165", "10u", "sc", "VAR_10U"),
    "v10m": VarSpec("e5.oper.an.sfc", "128_166", "10v", "sc", "VAR_10V"),
    "u100m": VarSpec("e5.oper.an.sfc", "228_246", "100u", "sc", "VAR_100U"),
    "v100m": VarSpec("e5.oper.an.sfc", "228_247", "100v", "sc", "VAR_100V"),
    "t2m": VarSpec("e5.oper.an.sfc", "128_167", "2t", "sc", "VAR_2T"),
    "d2": VarSpec("e5.oper.an.sfc", "128_168", "2d", "sc", "VAR_2D"),
    "sp": VarSpec("e5.oper.an.sfc", "128_134", "sp", "sc", "SP"),
    "msl": VarSpec("e5.oper.an.sfc", "128_151", "msl", "sc", "MSL"),
    "tcwv": VarSpec("e5.oper.an.sfc", "128_137", "tcwv", "sc", "TCWV"),
    "sst": VarSpec("e5.oper.an.sfc", "128_034", "sstk", "sc", "SSTK"),
}

ATMO_VARS: Dict[str, VarSpec] = {
    "z": VarSpec("e5.oper.an.pl", "128_129", "z", "sc", "Z"),
    "t": VarSpec("e5.oper.an.pl", "128_130", "t", "sc", "T"),
    "u": VarSpec("e5.oper.an.pl", "128_131", "u", "uv", "U"),
    "v": VarSpec("e5.oper.an.pl", "128_132", "v", "uv", "V"),
    "q": VarSpec("e5.oper.an.pl", "128_133", "q", "sc", "Q"),
    "r": VarSpec("e5.oper.an.pl", "128_157", "r", "sc", "R"),
}

# accumulated channels are sums of source components (d633000 has no direct
# total precipitation; tp = large-scale + convective, both metres)
ACCUM_VARS: Dict[str, Tuple[VarSpec, ...]] = {
    "tp": (
        VarSpec("e5.oper.fc.sfc.accumu", "128_142", "lsp", "sc", "LSP"),
        VarSpec("e5.oper.fc.sfc.accumu", "128_143", "cp", "sc", "CP"),
    ),
}


def split_channel(channel: str) -> Tuple[str, Optional[int]]:
    """"z500" -> ("z", 500); surface names pass through with level None.
    Same classification as features.get_channel_groups ("d2" is surface)."""
    if channel != "d2" and re.search(r"[a-z]{1,3}[0-9]{1,4}$", channel):
        level = re.search(r"[0-9]{1,4}$", channel)
        return channel[: level.start()], int(level.group())
    return channel, None


@dataclass
class SourceGroup:
    """Channels served by one source variable (all levels of a pl variable
    share a file and its (1, n_levels, H, W) chunking — one read fills all)."""

    kind: str  # "pl" | "sfc" | "accum"
    name: str
    specs: Tuple[VarSpec, ...]
    channel_indices: List[int] = field(default_factory=list)
    levels: Optional[List[int]] = None


def group_channels(channel_names: Sequence[str], skip_missing: bool = False) -> List[SourceGroup]:
    """Group channel names by source file; pressure-level groups first."""
    pl: Dict[str, SourceGroup] = {}
    rest: List[SourceGroup] = []
    for idx, name in enumerate(channel_names):
        prefix, level = split_channel(name)
        if level is not None:
            spec = ATMO_VARS.get(prefix)
            if spec is None:
                if skip_missing:
                    continue
                raise ValueError(f"no NCAR source for atmospheric prefix {prefix!r} (channel {name!r})")
            g = pl.setdefault(prefix, SourceGroup("pl", prefix, (spec,), levels=[]))
            g.channel_indices.append(idx)
            g.levels.append(level)
        elif name in SURFACE_VARS:
            rest.append(SourceGroup("sfc", name, (SURFACE_VARS[name],), [idx]))
        elif name in ACCUM_VARS:
            rest.append(SourceGroup("accum", name, ACCUM_VARS[name], [idx]))
        elif not skip_missing:
            raise ValueError(f"no NCAR source for surface channel {name!r}")
    return list(pl.values()) + rest


def _key(spec: VarSpec, month: str, start: str, end: str) -> str:
    return f"{spec.stream}/{month}/{spec.stream}.{spec.param}_{spec.short}.ll025{spec.grid}.{start}_{end}.nc"


def pl_day_key(spec: VarSpec, day: dt.date) -> str:
    """Pressure-level analysis: one file per variable per day (24 hours, all
    37 levels)."""
    s = day.strftime("%Y%m%d")
    return _key(spec, day.strftime("%Y%m"), f"{s}00", f"{s}23")


def sfc_month_key(spec: VarSpec, day: dt.date) -> str:
    """Surface analysis: one file per variable per calendar month."""
    m = day.strftime("%Y%m")
    last = calendar.monthrange(day.year, day.month)[1]
    return _key(spec, m, f"{m}0100", f"{m}{last:02d}23")


def accum_halfmonth_key(spec: VarSpec, init_time: dt.datetime) -> str:
    """Accumulated forecast stream: half-month files stamped with *valid*-time
    bounds (the trailing 06 belongs to the first run of the next period)."""
    m = init_time.strftime("%Y%m")
    if init_time.day < 16:
        start, end = f"{m}0106", f"{m}1606"
    else:
        nxt = (init_time.replace(day=28) + dt.timedelta(days=7)).replace(day=1)
        start, end = f"{m}1606", f"{nxt:%Y%m}0106"
    return _key(spec, m, start, end)


def latest_accum_init(time: dt.datetime) -> dt.datetime:
    """Most recent 06Z/18Z forecast initialization at or before ``time``."""
    day = time.date()
    candidates = [dt.datetime(day.year, day.month, day.day, h, tzinfo=dt.timezone.utc) for h in ACCUM_INIT_HOURS]
    past = [c for c in candidates if c <= time]
    if past:
        return max(past)
    prev = day - dt.timedelta(days=1)
    return dt.datetime(prev.year, prev.month, prev.day, max(ACCUM_INIT_HOURS), tzinfo=dt.timezone.utc)


def accum_segments(valid_time: dt.datetime, window_hours: int) -> List[Tuple[dt.datetime, int, int]]:
    """Cut an accumulation window ending at ``valid_time`` into per-run pieces.

    d633000 stores the forecast accumulations de-accumulated (forecast hour h
    holds the single hour ending at init+h), so a window total is the plain
    sum of the hourly values it spans — but runs only reach hour 12 while
    starting 12 hours apart, so a window can straddle a run boundary. Returns
    ``(init_time, h_start, h_end)`` triples, each summing the zero-based
    forecast-hour range [h_start, h_end) of its run, chronological order.
    """
    if window_hours < 1:
        raise ValueError(f"accumulation window must be >= 1 hour, got {window_hours}")
    segments: List[Tuple[dt.datetime, int, int]] = []
    cursor = valid_time - dt.timedelta(hours=window_hours)
    while cursor < valid_time:
        init = latest_accum_init(cursor)
        run_end = init + dt.timedelta(hours=ACCUM_HOURS_PER_RUN)
        stop = min(valid_time, run_end)
        segments.append(
            (init, int((cursor - init).total_seconds() // 3600), int((stop - init).total_seconds() // 3600))
        )
        cursor = stop
    return segments


def hours_since_epoch(time: dt.datetime) -> int:
    """UTC datetime -> the d633000 netCDF time coordinate (hours since
    1900-01-01)."""
    return int((time - _EPOCH).total_seconds() // 3600)
