"""Fuzz the NCO planner against the native sequential reference.

Hundreds of random (shift, samplerate, stream-length, block-split) configs
through the planned device mixer vs the C++ bit-faithful reference loop —
the broad-phase net for samplenum-emulation corner cases (exact-periodic
resets, rounding resets, ratio signs, tiny rates, huge rates).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from doppler_tpu import oracle
from doppler_tpu.ops import nco
from doppler_tpu.ops.phase_plan import NCOState, plan_blocks
from doppler_tpu.runtime import native

RNG = np.random.default_rng(0xF055)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (fast oracle)"
)


def planned_mix(x, shifts, counts, fs):
    state = NCOState()
    L = max(counts)
    B = len(counts)
    plan = plan_blocks(shifts, counts, fs, state, L)
    xi = np.zeros(B * L, dtype=np.float32)
    xq = np.zeros(B * L, dtype=np.float32)
    # ragged blocks: pack each block at stride L
    pos = 0
    for b, cnt in enumerate(counts):
        xi[b * L : b * L + cnt] = x.real[pos : pos + cnt]
        xq[b * L : b * L + cnt] = x.imag[pos : pos + cnt]
        pos += cnt
    i, q = nco.mix_blocks(
        jnp.asarray(xi).reshape(B, L), jnp.asarray(xq).reshape(B, L),
        plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
        plan.c2_hi, plan.c2_lo, plan.t,
    )
    i = np.asarray(i).reshape(B, L)
    q = np.asarray(q).reshape(B, L)
    out = np.empty(sum(counts), dtype=np.complex64)
    pos = 0
    for b, cnt in enumerate(counts):
        out[pos : pos + cnt] = i[b, :cnt] + 1j * q[b, :cnt]
        pos += cnt
    return out


def native_reference(x, shifts, counts, fs):
    out_i = np.empty(x.size, dtype=np.float32)
    out_q = np.empty(x.size, dtype=np.float32)
    sn = 0
    pos = 0
    for s, cnt in zip(shifts, counts):
        oi, oq, sn = native.reference_mix(
            x.real[pos : pos + cnt], x.imag[pos : pos + cnt], sn,
            np.float32(s), fs,
        )
        out_i[pos : pos + cnt] = oi
        out_q[pos : pos + cnt] = oq
        pos += cnt
    return out_i + 1j * out_q


@pytest.mark.parametrize("trial", range(40))
def test_fuzz_planner_vs_native_reference(trial):
    rng = np.random.default_rng(1000 + trial)
    fs = int(rng.choice([48000, 250000, 256000, 1024000, 2400000, 10000000]))
    kind = trial % 4
    if kind == 0:       # dyadic-friendly rational (exact periodic resets)
        shift0 = float(rng.integers(-fs // 2, fs // 2) & ~0xFF)
    elif kind == 1:     # reset-prone magnitudes (rounding resets)
        shift0 = float(np.float32(fs * rng.uniform(0.03, 0.05)))
    elif kind == 2:     # tiny shift
        shift0 = float(rng.uniform(-2.0, 2.0))
    else:               # arbitrary
        shift0 = float(rng.uniform(-fs / 2, fs / 2))

    n_blocks = int(rng.integers(2, 12))
    counts = [int(rng.choice([512, 1024, 2048]))] * n_blocks
    if rng.random() < 0.5:
        counts[-1] = int(rng.integers(1, counts[-1]))   # ragged tail
    # per-block drifting shift half the time (track-style)
    if rng.random() < 0.5:
        shifts = [shift0 + 0.37 * k for k in range(n_blocks)]
    else:
        shifts = [shift0] * n_blocks

    n = sum(counts)
    x = (0.4 * (rng.normal(size=n) + 1j * rng.normal(size=n))).astype(np.complex64)
    got = planned_mix(x, shifts, counts, fs)
    want = native_reference(x, shifts, counts, fs)
    snr = oracle.snr_db(want, got)
    assert snr > 60.0, (fs, shifts[:2], counts, snr)


@pytest.mark.parametrize("trial", range(20))
def test_fast_plan_path_equivalent_to_scan(trial):
    """The O(1)-per-block exact-regime fast path must agree with the full
    per-sample mask scan: identical counter state, outputs within 1 ulp."""
    rng = np.random.default_rng(2000 + trial)
    fs = int(rng.choice([256000, 1024000]))
    # dyadic-friendly shifts keep q small → fast path eligible
    shift = float(rng.integers(-200, 200) * fs / 512)
    n_blocks = int(rng.integers(2, 8))
    counts = [2048] * n_blocks
    shifts = [shift] * n_blocks

    s_fast, s_slow = NCOState(), NCOState()
    p_fast = plan_blocks(shifts, counts, fs, s_fast, 2048)
    p_slow = plan_blocks(shifts, counts, fs, s_slow, 2048, fast_path=False)
    assert s_fast.samplenum == s_slow.samplenum

    n = sum(counts)
    x = (0.4 * (rng.normal(size=n) + 1j * rng.normal(size=n))).astype(np.complex64)

    def apply(plan):
        i, q = nco.mix_blocks(
            jnp.asarray(x.real).reshape(n_blocks, 2048),
            jnp.asarray(x.imag).reshape(n_blocks, 2048),
            plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
            plan.c2_hi, plan.c2_lo, plan.t,
        )
        return (np.asarray(i) + 1j * np.asarray(q)).reshape(-1)

    a, b = apply(p_fast), apply(p_slow)
    assert np.abs(a - b).max() < 3e-7, (fs, shift)
