"""NCAR ERA5 (d633000) sourcing arithmetic (ref tests cover
utils/dataloaders/ncar_helpers.py): key layouts, channel grouping,
accumulation-window decomposition, epoch hours."""

import datetime as dt

import pytest

from makani_tpu.utils.dataloaders.ncar_helpers import (
    ACCUM_VARS,
    ATMO_VARS,
    SURFACE_VARS,
    accum_halfmonth_key,
    accum_segments,
    group_channels,
    hours_since_epoch,
    latest_accum_init,
    pl_day_key,
    sfc_month_key,
    split_channel,
)

UTC = dt.timezone.utc


def test_split_channel():
    assert split_channel("z500") == ("z", 500)
    assert split_channel("q1000") == ("q", 1000)
    assert split_channel("t2m") == ("t2m", None)
    assert split_channel("d2") == ("d2", None)  # dewpoint, not level 2
    assert split_channel("tcwv") == ("tcwv", None)


def test_group_channels_structure():
    names = ["z500", "t2m", "z850", "t500", "tp", "tcwv"]
    groups = group_channels(names)
    kinds = [(g.kind, g.name) for g in groups]
    # pl groups first, one per variable prefix covering all its levels
    assert kinds[:2] == [("pl", "z"), ("pl", "t")]
    zg = groups[0]
    assert zg.channel_indices == [0, 2] and zg.levels == [500, 850]
    # accumulated tp carries both source components (lsp + cp)
    tp = [g for g in groups if g.kind == "accum"][0]
    assert len(tp.specs) == 2

    with pytest.raises(ValueError):
        group_channels(["madeup123"])
    assert group_channels(["madeup123", "t2m"], skip_missing=True)[0].name == "t2m"


def test_pl_day_key_layout():
    key = pl_day_key(ATMO_VARS["z"], dt.date(2020, 2, 29))
    assert key == "e5.oper.an.pl/202002/e5.oper.an.pl.128_129_z.ll025sc.2020022900_2020022923.nc"
    # wind components live on the uv grid
    key_u = pl_day_key(ATMO_VARS["u"], dt.date(2020, 2, 29))
    assert ".ll025uv." in key_u


def test_sfc_month_key_layout():
    key = sfc_month_key(SURFACE_VARS["t2m"], dt.date(2021, 2, 10))
    assert key == "e5.oper.an.sfc/202102/e5.oper.an.sfc.128_167_2t.ll025sc.2021020100_2021022823.nc"
    key_leap = sfc_month_key(SURFACE_VARS["t2m"], dt.date(2020, 2, 10))
    assert key_leap.endswith("2020020100_2020022923.nc")


def test_accum_halfmonth_key_layout():
    lsp = ACCUM_VARS["tp"][0]
    first = accum_halfmonth_key(lsp, dt.datetime(2020, 1, 3, 6, tzinfo=UTC))
    assert first.endswith("2020010106_2020011606.nc")
    second = accum_halfmonth_key(lsp, dt.datetime(2020, 1, 20, 18, tzinfo=UTC))
    assert second.endswith("2020011606_2020020106.nc")
    # december rolls into january of the next year
    dec = accum_halfmonth_key(lsp, dt.datetime(2020, 12, 31, 18, tzinfo=UTC))
    assert dec.endswith("2020121606_2021010106.nc")


def test_latest_accum_init():
    t = dt.datetime(2020, 5, 2, 7, tzinfo=UTC)
    assert latest_accum_init(t) == dt.datetime(2020, 5, 2, 6, tzinfo=UTC)
    t = dt.datetime(2020, 5, 2, 23, tzinfo=UTC)
    assert latest_accum_init(t) == dt.datetime(2020, 5, 2, 18, tzinfo=UTC)
    # before 06Z: previous day's 18Z run
    t = dt.datetime(2020, 5, 2, 3, tzinfo=UTC)
    assert latest_accum_init(t) == dt.datetime(2020, 5, 1, 18, tzinfo=UTC)


def test_accum_segments_single_run():
    """A 6h window ending 12Z sits inside the same day's 06Z run."""
    segs = accum_segments(dt.datetime(2020, 5, 2, 12, tzinfo=UTC), 6)
    assert segs == [(dt.datetime(2020, 5, 2, 6, tzinfo=UTC), 0, 6)]


def test_accum_segments_straddles_runs():
    """A 12h window ending 00Z starts at 12Z — between the 06Z and 18Z runs —
    and must be cut at the run boundary; hour ranges tile the window."""
    valid = dt.datetime(2020, 5, 3, 0, tzinfo=UTC)
    segs = accum_segments(valid, 12)
    assert segs == [
        (dt.datetime(2020, 5, 2, 6, tzinfo=UTC), 6, 12),
        (dt.datetime(2020, 5, 2, 18, tzinfo=UTC), 0, 6),
    ]
    total = sum(e - s for _, s, e in segs)
    assert total == 12


@pytest.mark.parametrize("window", [1, 3, 6, 12, 24])
def test_accum_segments_cover_any_window(window):
    valid = dt.datetime(2021, 7, 14, 13, tzinfo=UTC)
    segs = accum_segments(valid, window)
    # segments tile the window exactly, chronological, within run bounds
    assert sum(e - s for _, s, e in segs) == window
    cursor = valid - dt.timedelta(hours=window)
    for init, s, e in segs:
        assert init + dt.timedelta(hours=s) == cursor
        assert 0 <= s < e <= 12
        cursor = init + dt.timedelta(hours=e)
    assert cursor == valid


def test_hours_since_epoch():
    assert hours_since_epoch(dt.datetime(1900, 1, 1, tzinfo=UTC)) == 0
    assert hours_since_epoch(dt.datetime(1900, 1, 2, 6, tzinfo=UTC)) == 30
