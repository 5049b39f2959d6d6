"""C++ SGP4 vs Python SGP4: mutual cross-validation (same algorithm, two
independent transcriptions — agreement to ~1e-6 km catches typos in both)."""

import numpy as np
import pytest

from doppler_tpu.orbit import Observer, Predictor, Tle
from doppler_tpu.orbit.tle import _checksum
from doppler_tpu.runtime import native


def fix(line):
    line = line.ljust(68)[:68]
    return line + str(_checksum(line))


L1 = fix("1 88888U          80275.98708465  .00073094  13844-3  66816-4 0    8")
L2 = fix("2 88888  72.8435 115.9689 0086731  52.6988 110.5714 16.05824518  105")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@pytest.fixture(scope="module")
def tle():
    return Tle.from_lines("TEST SAT", L1, L2)


def test_native_matches_python_states(tle):
    from doppler_tpu.orbit.sgp4 import SGP4

    py = SGP4(tle)
    cc = native.NativeSGP4(tle)
    ts = np.array([0.0, 47.3, 123.456, 359.9, 720.0])
    rp, vp = py.propagate(ts)
    rc, vc = cc.propagate(ts)
    assert np.abs(rp - rc).max() < 1e-6      # km: same algorithm, f64
    assert np.abs(vp - vc).max() < 1e-9


def test_native_doppler_curve_matches_predictor(tle):
    pred = Predictor(tle, Observer(58.26541, 26.46667, 76.0))
    cc = native.NativeSGP4(tle)
    t0 = (tle.epoch_jd - 2440587.5) * 86400.0
    ts = t0 + np.arange(0.0, 600.0, 7.0)
    dop_py, obs = pred.doppler_hz(ts, 437505000.0)
    dop_c, rng_c, rate_c, az_c, el_c = cc.doppler_curve(
        ts, 58.26541, 26.46667, 76.0, 437505000.0)
    assert np.abs(dop_py - dop_c).max() < 1e-4      # Hz
    assert np.abs(obs.range_km - rng_c).max() < 1e-6
    assert np.abs(obs.az_deg - az_c).max() < 1e-7
    assert np.abs(obs.el_deg - el_c).max() < 1e-7


def test_native_rejects_deep_space():
    l1 = fix("1 11111U          80275.98708465  .00000000  00000-0  00000-0 0    8")
    l2 = fix("2 11111   0.0500  75.0000 0002000 120.0000 240.0000  1.00270000  105")
    with pytest.raises(RuntimeError, match="deep-space"):
        native.NativeSGP4(Tle.from_lines("GEO", l1, l2))


def test_native_curve_speed(tle):
    """The point of the C++ path: full curves at ≳1e6 evaluations/s."""
    import time

    cc = native.NativeSGP4(tle)
    t0 = (tle.epoch_jd - 2440587.5) * 86400.0
    ts = t0 + np.arange(100000, dtype=np.float64)
    start = time.perf_counter()
    cc.doppler_curve(ts, 58.0, 26.0, 76.0, 437505000.0)
    dt = time.perf_counter() - start
    assert 100000 / dt > 2e5, f"only {100000/dt:.0f} eval/s"
