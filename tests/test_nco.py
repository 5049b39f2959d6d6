"""NCO mixer tests: fixed-point phase vs. the sequential reference oracle."""

import numpy as np
import jax.numpy as jnp

from doppler_tpu import oracle
from doppler_tpu.ops import fixedpoint as fxp
from doppler_tpu.ops import nco

RNG = np.random.default_rng(0x17)


def run_mix(x, shift_hz, samplerate, n0=0):
    d = fxp.rate_to_q64(shift_hz, samplerate)
    d_hi, d_lo = fxp.split_u64(d)
    n0_hi, n0_lo = fxp.split_u64(n0)
    i, q = nco.mix(
        jnp.asarray(x.real), jnp.asarray(x.imag), d_hi, d_lo, n0_hi, n0_lo
    )
    return np.asarray(i) + 1j * np.asarray(q)


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
    """Phase at absolute index n is identical whether computed from offset 0
    or from any shard start — the property that makes time-sharding exact."""
    d = fxp.rate_to_q64(-15000, 256000)
    d_hi, d_lo = fxp.split_u64(d)
    offsets = jnp.arange(4096, dtype=jnp.uint32)
    c0, s0 = nco.nco_corrector(d_hi, d_lo, *fxp.split_u64(0), offsets)
    # same absolute indices reached as shard starting at 1_000_000_000_000
    start = 1_000_000_000_000
    c1, s1 = nco.nco_corrector(d_hi, d_lo, *fxp.split_u64(start), offsets)
    c0b, s0b = nco.nco_corrector(
        d_hi, d_lo, *fxp.split_u64(0),
        offsets + jnp.uint32(start % (1 << 32)),
    )
    del c0, s0  # different indices; just ensure shard-start path == offset path
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c0b))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s0b))


def _snr_case(shift_hz, fs, n_samples, min_snr_db, n0=0):
    x = (RNG.normal(size=n_samples) + 1j * RNG.normal(size=n_samples)).astype(
        np.complex64
    ) * np.float32(0.3)
    ref, _ = oracle.shift_frequency_oracle(x, n0, shift_hz, fs)
    got = run_mix(x, shift_hz, fs, n0)
    snr = oracle.snr_db(ref, got)
    assert snr > min_snr_db, f"SNR {snr:.1f} dB < {min_snr_db} (shift={shift_hz}, fs={fs})"


def test_mix_const_neg15k_256k():
    # BASELINE config 1: const -15 kHz @ 256 ksps
    _snr_case(-15000.0, 256000, 20000, 70.0)


def test_mix_const_815k_2p4m():
    # The reference pseudo-bench workload (dsp.rs:142-143)
    _snr_case(815000.0, 2400000, 20000, 70.0)


def test_mix_rational_resets():
    # shift/fs = 1/4: the reference's samplenum reset fires every 4 samples
    _snr_case(64000.0, 256000, 8192, 90.0)


def test_mix_zero_shift_is_identity():
    x = (RNG.normal(size=1000) + 1j * RNG.normal(size=1000)).astype(np.complex64)
    got = run_mix(x, 0.0, 256000)
    np.testing.assert_allclose(got, x, rtol=0, atol=0)


def test_mix_blocks_matches_per_block_mix():
    fs = 256000
    L, B = 2048, 6
    x = (RNG.normal(size=B * L) + 1j * RNG.normal(size=B * L)).astype(np.complex64)
    shifts = [-15000.0, -14800.0, -14810.5, 3000.25, 0.0, 99999.0]
    d_hi, d_lo = nco.make_block_increments(shifts, fs)
    i2, q2 = nco.mix_blocks(
        jnp.asarray(x.real).reshape(B, L),
        jnp.asarray(x.imag).reshape(B, L),
        d_hi, d_lo, 0, 0,
    )
    got = (np.asarray(i2) + 1j * np.asarray(q2)).reshape(-1)

    want = np.empty_like(x)
    for b, s in enumerate(shifts):
        want[b * L : (b + 1) * L] = run_mix(x[b * L : (b + 1) * L], s, fs, n0=b * L)
    np.testing.assert_array_equal(got, want)


def test_mix_large_n_still_tracks_ideal():
    """At huge absolute offsets the fixed-point phase must stay on the ideal
    curve (the reference's own f32 phase has already degraded there)."""
    fs = 1024000
    shift = 5000.0
    n0 = 10**12
    n = np.arange(n0, n0 + 4096, dtype=object)
    r32 = float(np.float32(np.float32(shift) / np.float32(fs)))
    from fractions import Fraction

    rfrac = Fraction(r32) % 1
    ideal_cycles = np.array([float((rfrac * int(k)) % 1) for k in n])
    ideal = np.exp(-2j * np.pi * ideal_cycles)
    x = np.ones(4096, dtype=np.complex64)
    got = run_mix(x, shift, fs, n0=n0)
    err = np.abs(got - ideal).max()
    assert err < 1e-5, err
