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


# ---------------------------------------------------------------------------
# Vectorized planner (VERDICT r2 #6): run-based plan_blocks and the batched
# plan_fields_uniform must be row-for-row, state-for-state twins of the
# per-block sequential planner.

from doppler_tpu.ops.phase_plan import (  # noqa: E402
    _plan_blocks_sequential,
    plan_fields_uniform,
)

_FIELDS = ("d_hi", "d_lo", "c1_hi", "c1_lo", "c2_hi", "c2_lo", "t")


def _assert_plans_equal(p1, p2, tag):
    for f in _FIELDS:
        a, b = getattr(p1, f), getattr(p2, f)
        assert np.array_equal(a, b), (tag, f, np.nonzero(a != b)[0][:5])


def _compare_chunked(shifts, counts, fs, L, chunks=1, tag="", **kw):
    s1, s2 = NCOState(), NCOState()
    n = len(shifts) // chunks
    for ci in range(chunks):
        sh, co = shifts[ci * n:(ci + 1) * n], counts[ci * n:(ci + 1) * n]
        p1 = plan_blocks(sh, co, fs, s1, L, **kw)
        p2 = _plan_blocks_sequential(sh, co, fs, s2, L, **kw)
        _assert_plans_equal(p1, p2, (tag, ci))
        assert s1.samplenum == s2.samplenum, (tag, ci)
        assert s1.abs_offset == s2.abs_offset, (tag, ci)


def test_vectorized_config5_rounding_reset_regime():
    """100 Msps ratios fire rounding resets every ~10^5 samples; the
    closed-form periodic branch must reproduce them all."""
    _compare_chunked([9000.0] * 256, [8192] * 256, 100_000_000, 8192,
                     chunks=8, tag="cfg5")


def test_vectorized_q31_dyadic_and_staircase():
    _compare_chunked([12200.0] * 64, [8192] * 64, 100_000_000, 8192,
                     chunks=8, tag="q31")
    stair = [float(np.float32(9000.0 - 0.01 * (k // 12))) for k in range(128)]
    _compare_chunked(stair, [8192] * 128, 100_000_000, 8192,
                     chunks=4, tag="stair")


def test_vectorized_u32_wrap_and_large_counter():
    for m0 in ((1 << 32) - 3 * 8192 - 100, (1 << 31) + 12345):
        s1, s2 = NCOState(samplenum=m0), NCOState(samplenum=m0)
        for _ in range(3):
            p1 = plan_blocks([1234.567] * 16, [8192] * 16, 1024000, s1, 8192)
            p2 = _plan_blocks_sequential(
                [1234.567] * 16, [8192] * 16, 1024000, s2, 8192)
            _assert_plans_equal(p1, p2, m0)
            assert s1.samplenum == s2.samplenum


def test_vectorized_fuzz_vs_sequential():
    rng = np.random.default_rng(0xF00)
    for trial in range(30):
        fs = int(rng.choice([256000, 1024000, 2400000, 100_000_000]))
        L = int(rng.choice([1024, 2048, 8192]))
        B = int(rng.integers(4, 40))
        nruns = int(rng.integers(1, 6))
        vals = rng.uniform(-fs / 2, fs / 2, size=nruns)
        shifts = [float(vals[min(k * nruns // B, nruns - 1)])
                  for k in range(B)]
        counts = [L] * B
        counts[-1] = int(rng.integers(0, L + 1))
        if rng.random() < 0.3:
            counts[-2] = 0
        _compare_chunked(shifts, counts, fs, L,
                         chunks=2 if B % 2 == 0 else 1, tag=f"fz{trial}")
    # the SURVEY-erratum ratio and an integer-valued ratio
    _compare_chunked([9660.609375] * 32, [2048] * 32, 256000, 2048,
                     chunks=4, tag="erratum")
    _compare_chunked([512000.0 * 4] * 8, [1024] * 8, 256000, 1024, tag="int")
    _compare_chunked([5000.0] * 8, [1024] * 8, 256000, 1024,
                     fast_path=False, tag="nofast")
    _compare_chunked([5000.0] * 8, [1024] * 8, 256000, 1024,
                     reset_quirk=False, tag="noquirk")


def test_uniform_batch_matches_per_channel():
    fs, L, C, B = 100_000_000, 8192, 24, 64
    shifts = [float(np.float32(9000.0 + c * 100)) for c in range(C)]

    def mk():
        sts = []
        for c in range(C):
            s = NCOState()
            plan_blocks([shifts[c]] * 4, [L] * 4, fs, s, L)  # past genesis
            sts.append(s)
        return sts

    sa, sb = mk(), mk()
    for chunk in range(4):
        counts = [L] * B
        if chunk == 2:
            counts[-1] = 777
        f = plan_fields_uniform(shifts, counts, fs, sa, L)
        assert f is not None, f"chunk {chunk} unexpectedly fell back"
        for c in range(C):
            p = plan_blocks([shifts[c]] * len(counts), counts, fs, sb[c], L)
            for fi, name in enumerate(_FIELDS):
                assert np.array_equal(f[fi, c], getattr(p, name)), \
                    (chunk, c, name)
            assert sa[c].samplenum == sb[c].samplenum, (chunk, c)
            assert sa[c].abs_offset == sb[c].abs_offset


def test_uniform_batch_no_quirk_and_fallbacks():
    fs, L = 100_000_000, 8192
    shifts = [9000.0, -44100.0]
    sa = [NCOState(samplenum=5, abs_offset=5),
          NCOState(samplenum=9, abs_offset=9)]
    sb = [NCOState(samplenum=5, abs_offset=5),
          NCOState(samplenum=9, abs_offset=9)]
    f = plan_fields_uniform(shifts, [L] * 8, fs, sa, L, reset_quirk=False)
    for c in range(2):
        p = plan_blocks([shifts[c]] * 8, [L] * 8, fs, sb[c], L,
                        reset_quirk=False)
        for fi, name in enumerate(_FIELDS):
            assert np.array_equal(f[fi, c], getattr(p, name))
    # genesis counter (m0=0 fires immediately) must fall back, states untouched
    sts = [NCOState()]
    assert plan_fields_uniform([9000.0], [L] * 4, fs, sts, L) is None
    assert sts[0].samplenum == 0 and sts[0].abs_offset == 0
    # small-q dyadic ratio must fall back to the per-channel planner
    sts = [NCOState(samplenum=7)]
    assert plan_fields_uniform([1000.0], [2048] * 4, 256000, sts, 2048) is None


def test_planning_cost_config5_scale():
    """Regression pin for the config-5 host planner: C=256 x B=2048 at
    100 Msps must plan in well under a second per chunk (round 2: 18 s)."""
    import time

    fs, L, C, B = 100_000_000, 8192, 256, 2048
    shifts = [float(np.float32(9000.0 + c * 100)) for c in range(C)]
    states = [NCOState() for _ in range(C)]
    for c in range(C):
        plan_blocks([shifts[c]] * 2, [L] * 2, fs, states[c], L)
    best = min(
        (lambda t0: (plan_fields_uniform(shifts, [L] * B, fs, states, L),
                     time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(3)
    )
    assert best < 1.0, f"planning took {best:.2f}s per chunk"


def test_state_evolution_vs_native_loop_large_blocks():
    """Round-5 review find: _state_after_run's exact-period shortcut fired
    outside the exact-only regime (a ROUNDING reset below q from the
    restarted counter broke periodicity), silently corrupting the carried
    samplenum at large block lengths.  Regression: the planner's state must
    equal the per-sample C++ reference loop across a ratio/length scan."""
    import pytest

    from doppler_tpu.runtime import native

    if not native.available():
        pytest.skip("needs the native library")
    rng = np.random.default_rng(0xA11)
    checked = 0
    for _ in range(120):
        fs = int(rng.choice([256000, 1024000, 2400000, 100_000_000]))
        L = int(rng.choice([8192, 40960, 65536, 131072]))
        shift = float(rng.uniform(-fs / 2, fs / 2))
        _, end = native.reference_counter_blocks(
            np.full(3, np.float32(shift)), np.full(3, L, np.uint32), 0, fs)
        s = NCOState()
        plan_blocks([shift] * 3, [L] * 3, fs, s, L)
        assert s.samplenum == end, (fs, L, shift, s.samplenum, end)
        checked += 1
    assert checked == 120
    # the original repro ratio explicitly (shortcut fired with q=2^15;
    # pre-fix the planner carried 32768 after 3 blocks vs the loop's 1518)
    fs, L, shift = 1024000, 65536, 327843.7593835888
    _, end = native.reference_counter_blocks(
        np.full(3, np.float32(shift)), np.full(3, L, np.uint32), 0, fs)
    s = NCOState()
    plan_blocks([shift] * 3, [L] * 3, fs, s, L)
    assert s.samplenum == end == 1518


def test_multi_reset_block_phase_bound():
    """Multi-reset policy (ops/phase_plan.py note): a second rounding reset
    inside a block is not encoded; the resulting phase deviation in the
    block tail must stay within the f32-product-ulp class — the
    reference's OWN phase noise at those counters — so the SNR contract
    holds.  Golden: the native per-sample reference loop."""
    import pytest

    import jax.numpy as jnp

    from doppler_tpu import oracle
    from doppler_tpu.ops import nco
    from doppler_tpu.ops.phase_plan import (
        _exact_period,
        _offset_changing_within,
        _ratio_f32,
    )
    from doppler_tpu.runtime import native

    if not native.available():
        pytest.skip("needs the native library")
    fs, L, shift = 1024000, 65536, 327843.7593835888
    r32 = _ratio_f32(shift, fs)
    # the block really does contain a second (un-encoded) rounding reset
    assert _offset_changing_within(r32, _exact_period(r32), L) is not None

    s = NCOState()
    plan = plan_blocks([shift], [L], fs, s, L)
    i = np.ones(L, np.float32)
    q = np.zeros(L, np.float32)
    ri, rq, _ = native.reference_mix(i, q, 0, shift, fs)
    gi, gq = nco.mix_blocks(
        jnp.asarray(i[None]), jnp.asarray(q[None]),
        plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
        plan.c2_hi, plan.c2_lo, plan.t)
    want = ri + 1j * rq
    got = np.asarray(gi)[0] + 1j * np.asarray(gq)[0]
    # derived bound: this ratio fires ~11 restarts in the block (period
    # 6503, product ≈ 2082 at each firing → per-restart offset ≤
    # ulp(2082)/2 = 2^-13 cycles); the un-encoded restarts ACCUMULATE, so
    # the tail deviation is ≤ n_missed·2^-13 cycles ≈ 1.2e-3 cycles.
    n_missed = 10
    bound = 2 * np.pi * n_missed * 2.0 ** -13 * 1.5   # ×1.5 margin
    ang = np.abs(np.angle(got * np.conj(want)))
    assert ang.max() < bound, (ang.max(), bound)
    # and the encoded prefix (before the second restart) stays in the
    # single-product-ulp class (the framework's exact Q0.64 phase vs the
    # reference's own f32 product noise at counters ≤ 6503, a few ×
    # ulp(2082)/2 ≈ 7.7e-4 rad)
    assert ang[: 2 * 6503].max() < 4e-3, ang[: 2 * 6503].max()
    snr = oracle.snr_db(want, got)
    assert snr > 45.0, snr   # ≈ the accumulated-offset floor for THIS case
