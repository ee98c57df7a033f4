"""Channel naming/grouping helpers (ref makani/utils/features.py:20-140 and
its test coverage in tests/testutils.py usage)."""

import pytest

from makani_tpu.utils.features import (
    get_auxiliary_channels,
    get_channel_groups,
    get_water_channels,
    get_wind_channels,
)

ERA5ISH = ["u10m", "v10m", "t2m", "msl", "tcwv", "z500", "t500", "u500", "v500", "q500",
           "z850", "t850", "u850", "v850", "q850", "d2"]


def test_aux_channel_names_order():
    names = get_auxiliary_channels(
        add_zenith=True,
        n_noise_chan=2,
        add_grid=True,
        grid_type="sinusoidal",
        grid_num_frequencies=2,
        add_orography=True,
        add_landmask=True,
        landmask_preprocessing="floor",
    )
    assert names == [
        "xzen", "xnoise0", "xnoise1",
        "xsgrlat1", "xsgrlon1", "xsgrlat2", "xsgrlon2",
        "xoro", "xlsml", "xlsms",
    ]
    assert get_auxiliary_channels(add_landmask=True, landmask_preprocessing="raw") == ["xlsm"]
    assert get_auxiliary_channels() == []


def test_water_channels():
    idx = get_water_channels(ERA5ISH)
    assert [ERA5ISH[i] for i in idx] == ["tcwv", "q500", "q850"]


def test_wind_channels_interleaved_pairs():
    idx = get_wind_channels(ERA5ISH)
    names = [ERA5ISH[i] for i in idx]
    # interleaved (u, v) per level
    assert names == ["u10m", "v10m", "u500", "v500", "u850", "v850"]


def test_channel_groups_era5():
    atmo, surf, dyn_aux, stat_aux, plvls = get_channel_groups(ERA5ISH, ["xzen", "xoro", "xlsml"])
    assert list(plvls) == [500, 850]
    assert [ERA5ISH[i] for i in atmo] == ["z500", "t500", "u500", "v500", "q500",
                                          "z850", "t850", "u850", "v850", "q850"]
    # d2 (dewpoint) must be surface, not pressure-level 2
    assert [ERA5ISH[i] for i in surf] == ["u10m", "v10m", "t2m", "msl", "tcwv", "d2"]
    # aux indices are offset past the prognostic block; oro/lsm are static
    n = len(ERA5ISH)
    assert dyn_aux == [n]
    assert stat_aux == [n + 1, n + 2]


def test_channel_groups_ragged_levels_raise():
    with pytest.raises(ValueError):
        get_channel_groups(["z500", "t500", "z850"])  # 850 group is ragged
