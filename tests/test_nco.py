"""NCO mixer tests: fixed-point phase + samplenum emulation vs the oracle."""

import numpy as np
import jax.numpy as jnp

from doppler_tpu import oracle
from doppler_tpu.ops import fixedpoint as fxp
from doppler_tpu.ops import nco
from doppler_tpu.ops.phase_plan import NCOState, plan_blocks

RNG = np.random.default_rng(0x17)


def run_mix_abs(x, shift_hz, samplerate, n0=0):
    """Mixer with pure absolute-index phase starting at sample n0."""
    d = fxp.rate_to_q64(shift_hz, samplerate)
    c = fxp.mul64_mod(n0, d)
    i, q = nco.mix(
        jnp.asarray(x.real), jnp.asarray(x.imag),
        *fxp.split_u64(d), *fxp.split_u64(c),
    )
    return np.asarray(i) + 1j * np.asarray(q)


def run_mix_planned(x, shifts, counts, samplerate, state=None):
    """Mixer with full samplenum-reset emulation over equal-length blocks."""
    state = state or NCOState()
    L = counts[0]
    assert all(c == L for c in counts[:-1])
    B = len(counts)
    plan = plan_blocks(shifts, counts, samplerate, state, L)
    xi = np.zeros(B * L, dtype=np.float32)
    xq = np.zeros(B * L, dtype=np.float32)
    xi[: x.size] = x.real
    xq[: x.size] = x.imag
    i, q = nco.mix_blocks(
        jnp.asarray(xi).reshape(B, L), jnp.asarray(xq).reshape(B, L),
        plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
        plan.c2_hi, plan.c2_lo, plan.t,
    )
    return (np.asarray(i) + 1j * np.asarray(q)).reshape(-1)[: x.size]


def oracle_mix_threaded(x, shifts, counts, samplerate):
    """Reference loop: sequential f32, samplenum threaded across blocks."""
    out = np.empty_like(x)
    sn = 0
    pos = 0
    for s, c in zip(shifts, counts):
        blk = x[pos : pos + c]
        mixed, sn = oracle.shift_frequency_oracle(blk, sn, s, samplerate)
        out[pos : pos + c] = mixed
        pos += c
    return out


def test_umulhi32_exhaustive_random():
    a = RNG.integers(0, 1 << 32, size=20000, dtype=np.uint64).astype(np.uint32)
    b = RNG.integers(0, 1 << 32, size=20000, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(fxp.umulhi32(jnp.asarray(a), jnp.asarray(b)))
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) >> 32).astype(np.uint32)
    np.testing.assert_array_equal(got, want)


def test_phase_q32_exact_vs_python_ints():
    for _ in range(200):
        n = int(RNG.integers(0, 1 << 63))
        d = int(RNG.integers(0, 1 << 64, dtype=np.uint64))
        n_hi, n_lo = fxp.split_u64(n)
        d_hi, d_lo = fxp.split_u64(d)
        got = int(np.asarray(fxp.phase_q32(n_hi, n_lo, d_hi, d_lo)))
        want = ((n * d) % (1 << 64)) >> 32
        assert got == want, (n, d)


def test_phase_purity_sharding_invariance():
    """Mixing a stream in two shards with C = (n0·D) mod 2^64 equals the
    contiguous run bitwise — the property that makes time-sharding exact."""
    x = (RNG.normal(size=8192) + 1j * RNG.normal(size=8192)).astype(np.complex64)
    whole = run_mix_abs(x, -15000.0, 256000)
    half = 4096
    parts = np.concatenate(
        [run_mix_abs(x[:half], -15000.0, 256000, n0=0),
         run_mix_abs(x[half:], -15000.0, 256000, n0=half)]
    )
    np.testing.assert_array_equal(whole, parts)


def _snr_case(shift_hz, fs, n_samples, min_snr_db):
    """Planned mixer (reset emulation on) vs the sequential oracle."""
    x = (RNG.normal(size=n_samples) + 1j * RNG.normal(size=n_samples)).astype(
        np.complex64
    ) * np.float32(0.3)
    L = 2048
    counts = [L] * (n_samples // L) + ([n_samples % L] if n_samples % L else [])
    shifts = [shift_hz] * len(counts)
    ref = oracle_mix_threaded(x, shifts, counts, fs)
    got = run_mix_planned(x, shifts, counts, fs)
    snr = oracle.snr_db(ref, got)
    assert snr > min_snr_db, f"SNR {snr:.1f} dB < {min_snr_db} (shift={shift_hz})"


def test_mix_const_neg15k_256k():
    # BASELINE config 1 rate: dyadic ratio −15/256 → exact resets every 256
    _snr_case(-15000.0, 256000, 20000, 70.0)


def test_mix_const_815k_2p4m():
    # the reference pseudo-bench workload (dsp.rs:142-143)
    _snr_case(815000.0, 2400000, 20000, 70.0)


def test_mix_const_rounding_resets():
    # ratio 9660.609375/256000: first *rounding* reset at samplenum 20802 —
    # crossing it must stay faithful (this is where absolute-index phase
    # alone would slowly drift from the reference)
    _snr_case(9660.609375, 256000, 50000, 70.0)


def test_mix_track_style_changing_shifts_with_resets():
    """Changing shifts + rounding resets: the case that breaks pure
    absolute-index phase (counter carries across rate changes)."""
    fs = 256000
    L = 2048
    B = 40
    x = (0.3 * (RNG.normal(size=B * L) + 1j * RNG.normal(size=B * L))).astype(
        np.complex64
    )
    # shift drifts slowly like a Doppler ramp through the reset-prone region
    shifts = [9660.609375 - 0.5 * k for k in range(B)]
    counts = [L] * B
    ref = oracle_mix_threaded(x, shifts, counts, fs)
    got = run_mix_planned(x, shifts, counts, fs)
    snr = oracle.snr_db(ref, got)
    assert snr > 70.0, snr


def test_mix_zero_shift_is_identity():
    x = (RNG.normal(size=1000) + 1j * RNG.normal(size=1000)).astype(np.complex64)
    got = run_mix_abs(x, 0.0, 256000)
    np.testing.assert_allclose(got, x, rtol=0, atol=0)


def test_plan_state_matches_oracle_samplenum():
    """The host closed-form counter must track the scalar loop exactly."""
    fs = 256000
    cases = [
        ([9660.609375] * 30, [2048] * 30),          # rounding resets
        ([-15000.0] * 10, [2048] * 10),             # exact period 256
        ([0.0] * 3, [2048] * 3),                    # resets every sample
        ([64000.0] * 5, [2048] * 5),                # period 4
        ([9660.609375 - 0.5 * k for k in range(25)], [2048] * 25),
        ([1234.5] * 4, [2048] * 3 + [100]),         # short tail
    ]
    for shifts, counts in cases:
        x = np.zeros(sum(counts), dtype=np.complex64)
        sn = 0
        for s, c in zip(shifts, counts):
            _, sn = oracle.shift_frequency_oracle(
                x[:c], sn, s, fs
            )
        state = NCOState()
        plan_blocks(shifts, counts, fs, state, max(counts))
        assert state.samplenum == sn, (shifts[0], state.samplenum, sn)


def test_mix_large_n_still_tracks_ideal():
    """With the quirk off, huge absolute offsets stay on the ideal curve."""
    fs = 1024000
    shift = 5000.0
    n0 = 10**12
    from fractions import Fraction

    r32 = float(np.float32(np.float32(shift) / np.float32(fs)))
    rfrac = Fraction(r32) % 1
    n = range(n0, n0 + 4096)
    ideal_cycles = np.array([float((rfrac * k) % 1) for k in n])
    ideal = np.exp(-2j * np.pi * ideal_cycles)
    x = np.ones(4096, dtype=np.complex64)
    got = run_mix_abs(x, shift, fs, n0=n0)
    assert np.abs(got - ideal).max() < 1e-5


def test_sincos_fold_bitwise_vs_select_chain():
    """The round-5 XOR sign-fold quadrant formulation must be bitwise
    identical to the original select-chain over ALL 2^24 phase words —
    the tone is THE shared numerical contract of every mixer path, so a
    single differing ulp would shift bytes everywhere."""
    import jax
    import jax.numpy as jnp

    from doppler_tpu.ops.sincos import sincos_q24_neg

    def select_chain(q24):
        quad = q24 >> 22
        frac = (q24 & jnp.int32(0x3FFFFF)).astype(jnp.float32)
        x = frac * jnp.float32((np.pi / 2) * 2.0 ** -22)
        x2 = x * x
        s_p = x * (
            jnp.float32(0.9999999660) + x2 * (
                jnp.float32(-0.1666665247) + x2 * (
                    jnp.float32(0.0083330520) + x2 * (
                        jnp.float32(-0.0001980742)
                        + x2 * jnp.float32(2.6019031e-06)))))
        c_p = jnp.float32(1.0) + x2 * (
            jnp.float32(-0.4999999963) + x2 * (
                jnp.float32(0.0416666418) + x2 * (
                    jnp.float32(-0.0013888397) + x2 * (
                        jnp.float32(0.0000247609)
                        + x2 * jnp.float32(-2.605e-07)))))
        k0 = quad == 0
        k1 = quad == 1
        k2 = quad == 2
        cos_u = jnp.where(k0, c_p,
                          jnp.where(k1, -s_p, jnp.where(k2, -c_p, s_p)))
        sin_u = jnp.where(k0, s_p,
                          jnp.where(k1, c_p, jnp.where(k2, -s_p, -c_p)))
        return cos_u, -sin_u

    f_old = jax.jit(select_chain)
    f_new = jax.jit(sincos_q24_neg)
    bits = lambda a: np.asarray(  # noqa: E731
        jax.lax.bitcast_convert_type(a, jnp.int32))
    for lo in range(0, 1 << 24, 1 << 22):
        q = jnp.arange(lo, lo + (1 << 22), dtype=jnp.int32)
        c0, s0 = f_old(q)
        c1, s1 = f_new(q)
        assert np.array_equal(bits(c0), bits(c1)), lo
        assert np.array_equal(bits(s0), bits(s1)), lo
