"""Orbit package tests: TLE parsing, SGP4 vs published vectors, geometry."""

import math

import numpy as np
import pytest

from doppler_tpu.orbit.observer import Observer, Predictor, gmst_rad, unix_to_jd
from doppler_tpu.orbit.sgp4 import SGP4, SGP4Error
from doppler_tpu.orbit.tle import Tle, TleError, _checksum


def fix(line: str) -> str:
    line = line.ljust(68)[:68]
    return line + str(_checksum(line))


# The classic Spacetrack Report #3 SGP4 verification satellite (public test
# case; WGS-72).  Published state vectors below are from the report.
L1 = fix("1 88888U          80275.98708465  .00073094  13844-3  66816-4 0    8")
L2 = fix("2 88888  72.8435 115.9689 0086731  52.6988 110.5714 16.05824518  105")


@pytest.fixture(scope="module")
def testsat():
    return SGP4(Tle.from_lines("TEST SAT", L1, L2))


def test_tle_fields():
    t = Tle.from_lines("TEST SAT", L1, L2)
    assert t.satnum == 88888
    assert abs(t.epoch_jd - 2444514.48708465) < 1e-8
    assert abs(t.bstar - 0.66816e-4) < 1e-12
    assert abs(t.ecco - 0.0086731) < 1e-12
    assert abs(t.inclo - math.radians(72.8435)) < 1e-12
    assert abs(t.no_kozai - 16.05824518 * 2 * math.pi / 1440.0) < 1e-12


def test_tle_checksum_rejected():
    bad = L1[:68] + str((int(L1[68]) + 1) % 10)
    with pytest.raises(TleError):
        Tle.from_lines("X", bad, L2)


def test_tle_negative_bstar():
    l1 = fix("1 25544U 98067A   08264.51782528 -.00002182  00000-0 -11606-4 0  292")
    l2 = fix("2 25544  51.6416 247.4627 0006703 130.5360 325.0288 15.72125391563537")
    t = Tle.from_lines("ISS (ZARYA)", l1, l2)
    assert t.bstar == pytest.approx(-0.11606e-4)
    assert t.ndot < 0


def test_tle_from_file(tmp_path):
    p = tmp_path / "sats.txt"
    p.write_text(f"SOME OTHER\n{L1}\n{L2}\nTEST SAT\n{L1}\n{L2}\n")
    t = Tle.from_file("TEST SAT", str(p))
    assert t.name == "TEST SAT"
    with pytest.raises(TleError):
        Tle.from_file("NO SUCH BIRD", str(p))


def test_sgp4_spacetrack_vectors(testsat):
    """Position/velocity vs the published SGP4 verification ephemeris."""
    published = {
        0.0: ((2328.97048951, -5995.22076416, 1719.97067261),
              (2.91207230, -0.98341546, -7.09081703)),
        360.0: ((2456.10705566, -6071.93853760, 1222.89727783),
                (2.67938992, -0.44829041, -7.22879231)),
    }
    for tmin, (rp, vp) in published.items():
        r, v = testsat.propagate(tmin)
        assert np.linalg.norm(r - np.array(rp)) < 0.1, (tmin, r)   # < 100 m
        assert np.linalg.norm(v - np.array(vp)) < 1e-3, (tmin, v)  # < 1 m/s


def test_sgp4_velocity_is_position_derivative(testsat):
    for tmin in [0.0, 47.3, 200.0, 350.0]:
        h = 1e-3
        r0, _ = testsat.propagate(tmin - h)
        r1, _ = testsat.propagate(tmin + h)
        _, v = testsat.propagate(tmin)
        fd = (r1 - r0) / (2 * h) / 60.0
        assert np.abs(fd - v).max() < 2e-4, tmin


def test_sgp4_vectorized_matches_scalar(testsat):
    ts = np.array([0.0, 10.0, 123.456, 359.9])
    rv, vv = testsat.propagate(ts)
    for i, tmin in enumerate(ts):
        r, v = testsat.propagate(float(tmin))
        np.testing.assert_allclose(rv[i], r, rtol=0, atol=1e-9)
        np.testing.assert_allclose(vv[i], v, rtol=0, atol=1e-9)


def test_sgp4_orbit_radius_sane(testsat):
    ts = np.linspace(0, 360, 500)
    r, _ = testsat.propagate(ts)
    radius = np.linalg.norm(r, axis=-1)
    # perigee ~6583 km, apogee ~6700 km for this orbit
    assert radius.min() > 6500 and radius.max() < 6800


def test_deep_space_takes_sdp4_path():
    # geostationary-ish: ~1 rev/day → period ≫ 225 min → SDP4 (deepspace.py)
    l1 = fix("1 11111U          80275.98708465  .00000000  00000-0  00000-0 0    8")
    l2 = fix("2 11111   0.0500  75.0000 0002000 120.0000 240.0000  1.00270000  105")
    s = SGP4(Tle.from_lines("GEO", l1, l2))
    assert s.deep and s.isimp and s.ds is not None


def test_gmst_j2000():
    # GMST at 2000-01-01 12:00 UT is 280.46061837°
    got = math.degrees(float(gmst_rad(2451545.0)))
    assert abs(got - 280.46061837) < 1e-4


def test_unix_to_jd():
    # 2015-01-22T09:07:16Z
    import calendar, time
    unix = calendar.timegm(time.strptime("2015-01-22T09:07:16", "%Y-%m-%dT%H:%M:%S"))
    jd = float(unix_to_jd(unix))
    assert abs(jd - (2457044.5 + (9 * 3600 + 7 * 60 + 16) / 86400.0)) < 1e-9


def test_observer_range_rate_consistency(testsat):
    """range_rate must equal the numerical derivative of range."""
    obs = Observer(58.26541, 26.46667, 76.0)
    pred = Predictor(testsat.tle, obs)
    t0 = (testsat.tle.epoch_jd - 2440587.5) * 86400.0 + 600.0  # epoch + 10 min
    ts = t0 + np.arange(0.0, 120.0, 1.0)
    s = pred.observe_unix(ts)
    fd = np.gradient(s.range_km, 1.0)
    assert np.abs(fd - s.range_rate_km_sec).max() < 5e-3


def test_observer_zenith_geometry(testsat):
    """Site directly 'under' the satellite sees it near zenith: put the site
    at the sub-satellite point and check elevation is high."""
    t0_unix = (testsat.tle.epoch_jd - 2440587.5) * 86400.0
    r, _ = testsat.propagate(0.0)
    jd = unix_to_jd(t0_unix)
    # geocentric lat/lon of the satellite at t0
    lat = math.degrees(math.asin(r[2] / np.linalg.norm(r)))
    lon = math.degrees(math.atan2(r[1], r[0]) - float(gmst_rad(jd)))
    s = Predictor(testsat.tle, Observer(lat, lon, 0.0)).observe_unix(t0_unix)
    assert float(s.el_deg) > 85.0
    assert 180.0 < float(s.range_km) < 350.0  # ~height of this orbit at t0
