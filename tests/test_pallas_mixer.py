"""Pallas fused mixer (interpret mode) vs the XLA path: ≤1 LSB agreement."""

import numpy as np
import jax.numpy as jnp

from doppler_tpu.ops import codec, nco
from doppler_tpu.ops.pallas.mixer import mix_blocks_pallas
from doppler_tpu.ops.phase_plan import NCOState, plan_blocks

RNG = np.random.default_rng(0x9A)


def test_pallas_mixer_matches_xla_path():
    B, L, fs = 4, 2048, 256000
    words = RNG.integers(-(1 << 31), 1 << 31, size=(B, L), dtype=np.int64).astype(
        np.int32
    )
    plan = plan_blocks(
        [9660.609375, -15000.0, 0.0, 7777.5], [L] * B, fs, NCOState(), L
    )
    arrs = (plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
            plan.c2_hi, plan.c2_lo, plan.t)

    i, q = codec.i16_words_to_iq(jnp.asarray(words))
    i, q = nco.mix_blocks(i, q, *arrs)
    want = np.asarray(codec.iq_to_i16_words(i, q))

    got = np.asarray(mix_blocks_pallas(jnp.asarray(words), *arrs, interpret=True))
    gi, gq = codec.i16_words_to_iq(jnp.asarray(got))
    wi, wq = codec.i16_words_to_iq(jnp.asarray(want))
    diff = np.maximum(
        np.abs(np.asarray(gi) - np.asarray(wi)),
        np.abs(np.asarray(gq) - np.asarray(wq)),
    ) * 32768.0
    assert diff.max() <= 1.0 + 1e-3
    assert np.mean(got == want) > 0.99


def _plan_arrs(shifts, L, fs):
    from doppler_tpu.ops.phase_plan import NCOState, plan_blocks

    plan = plan_blocks(shifts, [L] * len(shifts), fs, NCOState(), L)
    return (plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
            plan.c2_hi, plan.c2_lo, plan.t)


def test_pallas_mixer_f32_in_f32_out_matches_xla():
    from doppler_tpu.ops.pallas.mixer import mix_blocks_pallas_fmt

    B, L, fs = 3, 1024, 256000
    planar = RNG.normal(size=(2, B, L)).astype(np.float32)
    arrs = _plan_arrs([815000.0, -4321.0, 0.5], L, fs)

    wi, wq = nco.mix_blocks(jnp.asarray(planar[0]), jnp.asarray(planar[1]),
                            *arrs)
    out = np.asarray(mix_blocks_pallas_fmt(
        jnp.asarray(planar), *arrs, intype="f32", outtype="f32",
        interpret=True,
    ))
    np.testing.assert_allclose(out[0], np.asarray(wi), atol=2e-6)
    np.testing.assert_allclose(out[1], np.asarray(wq), atol=2e-6)


def test_pallas_mixer_f32_in_i16_out_nan_guard():
    """f32 inputs can carry NaN; the reference encodes NaN as 0 (main.rs:77)."""
    from doppler_tpu.ops.pallas.mixer import mix_blocks_pallas_fmt

    B, L, fs = 2, 512, 48000
    planar = RNG.normal(size=(2, B, L)).astype(np.float32)
    planar[0, 0, :16] = np.nan
    planar[1, 1, 100:110] = np.nan
    arrs = _plan_arrs([1000.0, -2000.0], L, fs)

    wi, wq = nco.mix_blocks(jnp.asarray(planar[0]), jnp.asarray(planar[1]),
                            *arrs)
    want = np.asarray(codec.iq_to_i16_words(wi, wq))
    got = np.asarray(mix_blocks_pallas_fmt(
        jnp.asarray(planar), *arrs, intype="f32", outtype="i16",
        interpret=True,
    ))
    gi, gq = (np.asarray(a) for a in codec.i16_words_to_iq(jnp.asarray(got)))
    ei, eq = (np.asarray(a) for a in codec.i16_words_to_iq(jnp.asarray(want)))
    diff = np.maximum(np.abs(gi - ei), np.abs(gq - eq)) * 32768.0
    assert diff.max() <= 1.0 + 1e-3
    # NaN lanes must encode to exactly 0 in both halves (a rotated NaN I
    # poisons both output components, so I and Q words must both be 0)
    assert np.all(got[0, :16] & 0xFFFF == 0)
    assert np.all((got[0, :16] >> 16) & 0xFFFF == 0)
    assert np.all(got[1, 100:110] & 0xFFFF == 0)
    assert np.all((got[1, 100:110] >> 16) & 0xFFFF == 0)


def test_pallas_mixer_i16_in_f32_out():
    from doppler_tpu.ops.pallas.mixer import mix_blocks_pallas_fmt

    B, L, fs = 2, 640, 96000
    words = RNG.integers(-(1 << 31), 1 << 31, size=(B, L),
                         dtype=np.int64).astype(np.int32)
    arrs = _plan_arrs([333.25, 44100.0], L, fs)

    i, q = codec.i16_words_to_iq(jnp.asarray(words))
    wi, wq = nco.mix_blocks(i, q, *arrs)
    out = np.asarray(mix_blocks_pallas_fmt(
        jnp.asarray(words), *arrs, intype="i16", outtype="f32",
        interpret=True,
    ))
    np.testing.assert_allclose(out[0], np.asarray(wi), atol=2e-6)
    np.testing.assert_allclose(out[1], np.asarray(wq), atol=2e-6)


def test_pallas_mixer_blocks_per_step_equivalence():
    """Every W dividing B produces identical words (W only regroups DMAs)."""
    B, L, fs = 4, 1024, 256000
    words = RNG.integers(-(1 << 31), 1 << 31, size=(B, L), dtype=np.int64).astype(
        np.int32
    )
    plan = plan_blocks([1234.5, -9000.0, 300.0, 0.25], [L] * B, fs, NCOState(), L)
    arrs = (plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
            plan.c2_hi, plan.c2_lo, plan.t)
    outs = [
        np.asarray(mix_blocks_pallas(jnp.asarray(words), *arrs, interpret=True,
                                     blocks_per_step=w))
        for w in (1, 2, 4)
    ]
    assert np.array_equal(outs[0], outs[1])
    assert np.array_equal(outs[0], outs[2])


def test_pallas_mixer_large_block_exact_phase():
    """L > 2^16 must route phase_q24 off the small_j fast path (ADVICE r4 high).

    With the old ``small_j=True`` default, every sample with j ≥ 65536 got a
    silently wrong Q0.64 phase (first divergence at j=75330 for this plan).
    The kernel builders now pass ``small_j = (L <= 65536)`` from the static
    block shape; this pins the full mixer at L=131072 against the XLA path.
    """
    B, L, fs = 1, 131072, 1024000
    words = RNG.integers(-(1 << 31), 1 << 31, size=(B, L),
                         dtype=np.int64).astype(np.int32)
    arrs = _plan_arrs([9660.609375], L, fs)

    i, q = codec.i16_words_to_iq(jnp.asarray(words))
    wi, wq = nco.mix_blocks(i, q, *arrs)
    want = np.asarray(codec.iq_to_i16_words(wi, wq))
    got = np.asarray(mix_blocks_pallas(jnp.asarray(words), *arrs,
                                       interpret=True))
    # the tail of the block (j >= 65536) is exactly where small_j corrupted
    tail = slice(70000, L)
    gi, gq = (np.asarray(a) for a in codec.i16_words_to_iq(jnp.asarray(got)))
    ei, eq = (np.asarray(a) for a in codec.i16_words_to_iq(jnp.asarray(want)))
    diff = np.maximum(np.abs(gi - ei), np.abs(gq - eq)) * 32768.0
    assert diff[:, tail].max() <= 1.0 + 1e-3
    assert diff.max() <= 1.0 + 1e-3
    assert np.mean(got == want) > 0.99


def test_phase_q24_umulhi_exact_large_j():
    """phase_q24(small_j=False) == exact 64-bit host arithmetic for j ≥ 2^16."""
    from doppler_tpu.ops.pallas.mixer import phase_q24

    j = np.arange(60000, 140000, dtype=np.uint64)
    D = np.uint64(0x9E3779B97F4A7C15)
    C1 = np.uint64(0x0123456789ABCDEF)
    C2 = np.uint64(0xFEDCBA9876543210)
    t = np.uint64(75330)
    C = np.where(j < t, C1, C2)
    want = ((j * D + C) & np.uint64(0xFFFFFFFFFFFFFFFF)) >> np.uint64(40)

    got = phase_q24(
        jnp.asarray(j.astype(np.uint32)),
        jnp.uint32(D >> np.uint64(32)), jnp.uint32(D & np.uint64(0xFFFFFFFF)),
        jnp.uint32(C1 >> np.uint64(32)), jnp.uint32(C1 & np.uint64(0xFFFFFFFF)),
        jnp.uint32(C2 >> np.uint64(32)), jnp.uint32(C2 & np.uint64(0xFFFFFFFF)),
        jnp.uint32(t), small_j=False,
    )
    np.testing.assert_array_equal(
        np.asarray(got).astype(np.uint32), want.astype(np.uint32))


def test_pallas_mixer_rejects_bad_blocks_per_step():
    import pytest

    words = np.zeros((4, 256), dtype=np.int32)
    plan = plan_blocks([0.0] * 4, [256] * 4, 256000, NCOState(), 256)
    with pytest.raises(ValueError, match="must divide"):
        mix_blocks_pallas(
            jnp.asarray(words), plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
            plan.c2_hi, plan.c2_lo, plan.t, interpret=True, blocks_per_step=3,
        )


def test_pallas_mixer_rejects_unaligned_block():
    import pytest

    words = np.zeros((2, 100), dtype=np.int32)
    plan = plan_blocks([0.0, 0.0], [100, 100], 256000, NCOState(), 100)
    with pytest.raises(ValueError, match="multiple of 128"):
        mix_blocks_pallas(
            jnp.asarray(words), plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
            plan.c2_hi, plan.c2_lo, plan.t, interpret=True,
        )


def test_phase_q24_outer_bitwise():
    """phase_q24_outer (row/lane outer-product reassociation) must equal
    phase_q24 bitwise over full blocks — kept as a measured experiment
    (slightly SLOWER on v5e: broadcast materialization outweighs the
    multiply savings; see docs/architecture.md round-5 notes)."""
    import jax

    from doppler_tpu.ops.pallas.mixer import phase_q24, phase_q24_outer

    rng = np.random.default_rng(11)
    for S in (1, 4, 64, 512):
        d = int(rng.integers(0, 1 << 64, dtype=np.uint64))
        c1 = int(rng.integers(0, 1 << 64, dtype=np.uint64))
        c2 = int(rng.integers(0, 1 << 64, dtype=np.uint64))
        t = int(rng.integers(0, S * 128 + 2))
        j = (jax.lax.broadcasted_iota(jnp.uint32, (S, 128), 0)
             * jnp.uint32(128)
             + jax.lax.broadcasted_iota(jnp.uint32, (S, 128), 1))
        args = (jnp.uint32(d >> 32), jnp.uint32(d & 0xFFFFFFFF),
                jnp.uint32(c1 >> 32), jnp.uint32(c1 & 0xFFFFFFFF),
                jnp.uint32(c2 >> 32), jnp.uint32(c2 & 0xFFFFFFFF),
                jnp.uint32(t))
        a = np.asarray(phase_q24(j, *args, small_j=(S * 128 <= 65536)))
        b = np.asarray(phase_q24_outer(S, *args))
        np.testing.assert_array_equal(a, b)


def test_chain_phase_impl_knob_bitwise():
    """The chain's phase_impl='outer' experiment path stays bitwise equal
    to the default 'flat' path (same Q0.64 words by modular
    reassociation)."""
    from doppler_tpu.ops.pallas.chain import (
        carry_rows,
        make_chain_taps,
        mix_resample_chain_pallas_stream,
    )
    from doppler_tpu.ops.resample import RationalResampler

    fs, L, B = 1024000, 4096, 4
    rs = RationalResampler(fs, 48000)
    words = RNG.integers(-(1 << 31), 1 << 31, size=(B, L),
                         dtype=np.int64).astype(np.int32)
    plan = plan_blocks([9000.0, -5000.5, 0.25, 7777.0], [L] * B, fs,
                       NCOState(), L)
    arrs = (plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
            plan.c2_hi, plan.c2_lo, plan.t)
    taps = jnp.asarray(make_chain_taps(rs.bank, rs.P, rs.Q))
    c0 = jnp.zeros((2, carry_rows(rs.T), 128), jnp.float32)
    outs = {}
    for impl in ("flat", "outer"):
        o, c = mix_resample_chain_pallas_stream(
            jnp.asarray(words), *arrs, taps, c0, P=rs.P, Q=rs.Q, T=rs.T,
            interpret=True, phase_impl=impl)
        outs[impl] = (np.asarray(o), np.asarray(c))
    np.testing.assert_array_equal(outs["flat"][0], outs["outer"][0])
    np.testing.assert_array_equal(outs["flat"][1], outs["outer"][1])
