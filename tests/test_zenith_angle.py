"""Solar zenith angle physics (ref tests/test_zenith_angle.py validates the
vendored climt implementation against pysolar pins; pysolar is not available
here, so this suite pins the independent Meeus-ephemeris implementation
against astronomical invariants that hold to much tighter tolerance than the
feature needs: subsolar-point declination limits at the solstices/equinoxes,
polar day/night, the 15 deg/hour westward drift of the subsolar longitude,
the equation-of-time bound at Greenwich, antipodal symmetry, and input-type
equivalences).
"""

import datetime

import numpy as np
import pytest

from makani_tpu.utils.zenith_angle import cos_zenith_angle, cos_zenith_angle_from_timestamp

UTC = datetime.timezone.utc

# fine grid for subsolar-point localization
LONS = np.linspace(-180.0, 180.0, 721, endpoint=False)
LATS = np.linspace(-89.9, 89.9, 719)


def _subsolar(t):
    """(lat, lon, max cos zenith) of the subsolar point on the fine grid."""
    cz = cos_zenith_angle(t, LONS, LATS)
    i, j = np.unravel_index(np.argmax(cz), cz.shape)
    return LATS[i], LONS[j], cz[i, j]


def test_subsolar_point_reaches_unity():
    """Somewhere on earth the sun is (nearly) overhead at any instant."""
    for t in (
        datetime.datetime(2020, 3, 20, 12, tzinfo=UTC),
        datetime.datetime(2021, 8, 1, 3, 30, tzinfo=UTC),
        datetime.datetime(1999, 12, 31, 18, tzinfo=UTC),
    ):
        _, _, czmax = _subsolar(t)
        # grid resolution 0.5 deg -> cos within ~(0.25 deg)^2/2 of 1
        assert czmax > 0.9999, (t, czmax)


def test_subsolar_latitude_is_declination_bounded():
    """|subsolar latitude| <= obliquity (23.44 deg) + tolerance, all year."""
    for month in range(1, 13):
        t = datetime.datetime(2020, month, 15, 9, tzinfo=UTC)
        lat, _, _ = _subsolar(t)
        assert abs(lat) < 23.55, (month, lat)


@pytest.mark.parametrize(
    "when, want_lat",
    [
        # solstice/equinox instants for 2020 (UTC), declination in degrees
        (datetime.datetime(2020, 6, 20, 21, 43, tzinfo=UTC), 23.43),
        (datetime.datetime(2020, 12, 21, 10, 2, tzinfo=UTC), -23.43),
        (datetime.datetime(2020, 3, 20, 3, 50, tzinfo=UTC), 0.0),
        (datetime.datetime(2020, 9, 22, 13, 31, tzinfo=UTC), 0.0),
    ],
)
def test_solstice_equinox_declination(when, want_lat):
    lat, _, _ = _subsolar(when)
    # ephemeris + 0.25 deg grid quantization; equinox declination moves
    # ~1 deg/day so a few-minute epoch error is < 0.01 deg
    assert abs(lat - want_lat) < 0.3, (when, lat)


def test_polar_night_and_midnight_sun():
    """North pole: sun never sets mid-June, never rises mid-December."""
    lons = np.linspace(-180, 180, 73)
    for hour in range(0, 24, 3):
        t_jun = datetime.datetime(2020, 6, 15, hour, tzinfo=UTC)
        t_dec = datetime.datetime(2020, 12, 15, hour, tzinfo=UTC)
        cz_jun = cos_zenith_angle(t_jun, lons, np.asarray([89.5]))
        cz_dec = cos_zenith_angle(t_dec, lons, np.asarray([89.5]))
        assert np.all(cz_jun > 0.0), (hour, cz_jun.min())
        assert np.all(cz_dec < 0.0), (hour, cz_dec.max())
        # and the south pole is the mirror image
        cz_jun_s = cos_zenith_angle(t_jun, lons, np.asarray([-89.5]))
        assert np.all(cz_jun_s < 0.0), hour


def test_subsolar_longitude_drifts_15_deg_per_hour_west():
    """One hour later the subsolar point sits ~15 deg further west."""
    t0 = datetime.datetime(2020, 4, 10, 8, tzinfo=UTC)
    lat0, lon0, _ = _subsolar(t0)
    lat1, lon1, _ = _subsolar(t0 + datetime.timedelta(hours=1))
    dlon = (lon0 - lon1 + 180.0) % 360.0 - 180.0  # westward positive
    # mean solar motion is 15 deg/h; EoT drift is < 0.05 deg/h
    assert abs(dlon - 15.0) < 0.6, dlon
    assert abs(lat1 - lat0) < 0.05  # declination moves ~1 deg/day max


def test_equation_of_time_bound_at_greenwich():
    """Solar noon at lon=0 stays within +/-17 minutes of 12:00 UTC."""
    for month in (2, 5, 7, 11):  # spans both EoT extremes (Feb -14m, Nov +16m)
        day = datetime.datetime(2020, month, 10, tzinfo=UTC)
        offsets = np.arange(-30 * 60, 30 * 60 + 1, 30.0)  # seconds around noon
        ts = day.timestamp() + 12 * 3600 + offsets
        cz = np.asarray([cos_zenith_angle_from_timestamp(t, np.asarray(0.0), np.asarray(10.0)) for t in ts])
        best = offsets[np.argmax(cz)]
        assert abs(best) < 17 * 60, (month, best / 60.0)


def test_antipodal_symmetry():
    """cos zenith at the antipode of the subsolar point is ~ -1, and the
    pointwise identity cz(lat, lon) = -cz(-lat, lon+180) holds exactly."""
    t = datetime.datetime(2020, 5, 5, 15, tzinfo=UTC)
    lat, lon, _ = _subsolar(t)
    anti = cos_zenith_angle(t, np.asarray([((lon + 180.0 + 180.0) % 360.0) - 180.0]), np.asarray([-lat]))
    assert anti[0, 0] < -0.9999
    lons = np.linspace(-180, 180, 37)
    lats = np.linspace(-85, 85, 19)
    cz = cos_zenith_angle(t, lons, lats)
    cz_anti = cos_zenith_angle(t, ((lons + 180.0 + 180.0) % 360.0) - 180.0, -lats)
    np.testing.assert_allclose(cz, -cz_anti, atol=1e-12)


def test_range_and_global_mean():
    """cos zenith in [-1, 1]; the area-weighted positive part integrates to
    ~1/4 (the flat-earth insolation factor: pi R^2 / 4 pi R^2)."""
    t = datetime.datetime(2020, 10, 2, 6, tzinfo=UTC)
    lats = np.linspace(-89.75, 89.75, 360)
    lons = np.linspace(0, 360, 720, endpoint=False)
    cz = cos_zenith_angle(t, lons, lats)
    assert cz.max() <= 1.0 + 1e-12 and cz.min() >= -1.0 - 1e-12
    w = np.cos(np.deg2rad(lats))[:, None]
    mean_pos = (np.maximum(cz, 0.0) * w).sum() / (w.sum() * cz.shape[1])
    assert abs(mean_pos - 0.25) < 0.005, mean_pos


def test_time_input_types_agree():
    dt = datetime.datetime(2020, 8, 17, 13, 45, 30, tzinfo=UTC)
    ts = dt.timestamp()
    dt64 = np.datetime64("2020-08-17T13:45:30")
    lons = np.linspace(-180, 180, 13)
    lats = np.linspace(-80, 80, 7)
    a = cos_zenith_angle(dt, lons, lats)
    b = cos_zenith_angle(ts, lons, lats)
    c = cos_zenith_angle(dt64, lons, lats)
    np.testing.assert_allclose(a, b, atol=0)
    np.testing.assert_allclose(a, c, atol=1e-9)
    # naive datetimes are interpreted as UTC
    d = cos_zenith_angle(dt.replace(tzinfo=None), lons, lats)
    np.testing.assert_allclose(a, d, atol=0)
    with pytest.raises(TypeError):
        cos_zenith_angle("2020-08-17", lons, lats)


def test_grid_broadcasting_matches_meshed():
    t = datetime.datetime(2021, 1, 20, 22, tzinfo=UTC)
    lons = np.linspace(-180, 180, 17)
    lats = np.linspace(-88, 88, 11)
    meshed_lon, meshed_lat = np.meshgrid(lons, lats)
    a = cos_zenith_angle(t, lons, lats)
    b = cos_zenith_angle(t, meshed_lon, meshed_lat)
    assert a.shape == (11, 17)
    np.testing.assert_allclose(a, b, atol=0)


def test_day_night_terminator_fraction():
    """At any instant ~half the globe (area-weighted) is sunlit."""
    t = datetime.datetime(2020, 7, 7, 4, tzinfo=UTC)
    lats = np.linspace(-89.75, 89.75, 360)
    lons = np.linspace(0, 360, 720, endpoint=False)
    cz = cos_zenith_angle(t, lons, lats)
    w = np.broadcast_to(np.cos(np.deg2rad(lats))[:, None], cz.shape)
    frac = (w * (cz > 0)).sum() / w.sum()
    assert abs(frac - 0.5) < 0.01, frac
