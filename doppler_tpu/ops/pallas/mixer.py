"""Fused Pallas mixer: i16-decode → NCO mix → i16-encode in one VMEM pass.

The Pallas realization of the framework's hot kernel (SURVEY §7 step 7),
replacing the reference's per-sample ``ccexpf`` C FFI (``src/complex.c``)
with on-chip VPU transcendentals.  One grid step processes one reference
block: the raw int32 IQ words stream HBM→VMEM (Pallas double-buffers grid
steps automatically), the per-block plan words (rate D, offsets C1/C2,
segment switch t — see ``ops.phase_plan``) ride scalar prefetch in SMEM, and
only the re-encoded words return to HBM — 8 bytes of HBM traffic per sample,
the speed-of-light minimum for an i16→i16 shift.

The XLA path (``ops.nco.mix_blocks``) computes the identical math; this
kernel exists to pin the fusion explicitly rather than trusting the fuser,
and as the substrate for deeper fusion (resampler windows in VMEM).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from doppler_tpu.ops.sincos import mix_tone, sincos_q24_neg

__all__ = ["mix_blocks_pallas", "mix_blocks_pallas_fmt",
           "mix_blocks_pallas_q15"]

_MASK16 = np.uint32(0xFFFF)


# ONE umulhi implementation (round-5 review: a local duplicate risked
# drifting from the bitwise contract) — fixedpoint's version is the same
# 16-bit partial-product algorithm and traces identically under Mosaic.
from doppler_tpu.ops.fixedpoint import umulhi32 as _umulhi32  # noqa: E402


def phase_q24(j, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t,
              small_j: bool):
    """Exact Q0.64 phase → top-24-bit int32 word, the shared VPU hot loop.

    Computes ``(j·D + C) mod 2^64 >> 40`` on uint32 lanes where D/C are the
    per-block plan scalars and C selects C1/C2 on the samplenum-reset
    boundary ``j < t`` (ops.phase_plan).  Two exact strength reductions over
    the naive form (VERDICT r3 next #2 — the chain is VPU-mix-bound, so
    every lane op counts; both are integer-exact, bitwise-identical
    transformations):

    - ``small_j``: when the caller's block-local j is statically < 2^16
      (every L ≤ 65536), the high half of j is zero, so the 32×32 umulhi's
      a_hi partials vanish — 2 multiplies + 5 ops instead of 4 + 8.
      **Callers MUST pass** ``small_j = (L <= 65536)`` from their static
      block shape (ADVICE r4 high: a ``True`` default silently corrupted
      phases for any ``--block-bytes`` giving L > 65536 — the reduction is
      only exact while j's high half is actually zero);
    - the C1/C2 segment choice selects the *offset scalars* before ONE
      add-with-carry instead of computing both offset sums and selecting —
      u32 addition gives the same words either way.
    """
    jd_lo = j * d_lo
    if small_j:
        ll = j * (d_lo & _MASK16)
        lh = j * (d_lo >> 16)
        hi = (lh >> 16) + (((ll >> 16) + (lh & _MASK16)) >> 16)
    else:
        hi = _umulhi32(j, d_lo)
    jd_hi = hi + j * d_hi
    m = j < t
    c_hi = jnp.where(m, c1_hi, c2_hi)
    c_lo = jnp.where(m, c1_lo, c2_lo)
    lo = jd_lo + c_lo
    carry = (lo < jd_lo).astype(jnp.uint32)
    q32 = jd_hi + c_hi + carry
    return jax.lax.bitcast_convert_type(q32 >> 8, jnp.int32)


def phase_q24_outer(S, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t):
    """phase_q24 with the per-element multiplies hoisted to small shapes.

    ``j = 128·row + lane``, so ``j·D mod 2^64 = row·(128·D) + lane·D`` —
    pure modular reassociation (u32/u64 addition is associative), bitwise
    identical to :func:`phase_q24` over a full ``(S, 128)`` block (pinned
    by tests/test_pallas_mixer.py::test_phase_q24_outer_bitwise).  The
    products ride a ``(1, 128)`` lane vector and an ``(S, 1)`` row vector
    (~(S+128) elements instead of S·128), leaving only broadcast
    adds/compares per element — the VPU phase cost drops from 4 multiplies
    + ~7 ops to ~9 add-class ops per sample.

    Requires block-local j < 2²² (S ≤ 2¹⁵ rows — every practical block):
    ``j`` is rebuilt per element as ``(row << 7) + lane`` for the C1/C2
    segment compare.  Enforced at trace time — the small-j reduction on
    ``row`` drops row-high-half partials, exactly the silent-corruption
    class the small_j flag once shipped (ADVICE r4 high).
    """
    if S > (1 << 15):
        raise ValueError(
            f"phase_q24_outer needs S ≤ 2^15 rows (L ≤ 2^22 samples); "
            f"got S={S}")
    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.uint32, (S, 1), 0)
    # lane·D, lane < 2^7 — small-j umulhi (high halves of lane vanish)
    ll = lane * (d_lo & _MASK16)
    lh = lane * (d_lo >> 16)
    lane_hi = (lh >> 16) + (((ll >> 16) + (lh & _MASK16)) >> 16) \
        + lane * d_hi
    lane_lo = lane * d_lo
    # row·E with E = (128·D) mod 2^64; row < 2^15 — small-j umulhi again
    e_lo = jnp.left_shift(d_lo, 7)
    e_hi = jnp.left_shift(d_hi, 7) | (d_lo >> 25)
    ll2 = row * (e_lo & _MASK16)
    lh2 = row * (e_lo >> 16)
    row_hi = (lh2 >> 16) + (((ll2 >> 16) + (lh2 & _MASK16)) >> 16) \
        + row * e_hi
    row_lo = row * e_lo
    # 64-bit combine via broadcast adds: jd = lane·D + row·E  (mod 2^64)
    jd_lo = lane_lo + row_lo                       # (S, 128)
    carry0 = (jd_lo < row_lo).astype(jnp.uint32)
    jd_hi = lane_hi + row_hi + carry0
    # segment select + offset add-with-carry, identical to phase_q24
    j = jnp.left_shift(row, 7) + lane              # (S, 128), no multiply
    m = j < t
    c_hi = jnp.where(m, c1_hi, c2_hi)
    c_lo = jnp.where(m, c1_lo, c2_lo)
    lo = jd_lo + c_lo
    carry = (lo < jd_lo).astype(jnp.uint32)
    q32 = jd_hi + c_hi + carry
    return jax.lax.bitcast_convert_type(q32 >> 8, jnp.int32)


# the tone evaluation lives in ops.sincos (shared with the XLA mixer so both
# paths emit identical bytes); measured ~1.3 ms per 33.5M samples on v5e
_sincos_q24 = sincos_q24_neg


def _make_mixer_kernel(W: int, intype: str = "i16", outtype: str = "i16"):
    """Mixer kernel over W reference blocks per grid step.

    One grid step DMAs ``W·L·4`` bytes each way (32 KB blocks are far below
    the HBM DMA sweet spot; W=16 → 512 KB transfers) and unrolls a static
    per-block loop for the plan scalars, cutting sequential-grid overhead W×.

    ``intype``/``outtype`` select the wire format each side of the mix:
    ``i16`` moves packed int32 IQ words ``(W, S, 128)``; ``f32`` moves planar
    float32 planes ``(2, W, S, 128)`` (I at plane 0, Q at plane 1 — stride-2
    interleaved lanes are hostile to the VPU, so f32 rides planar; the
    host/XLA stages the deinterleave).
    """

    def kernel(d_hi_r, d_lo_r, c1_hi_r, c1_lo_r, c2_hi_r, c2_lo_r, t_r,
               in_ref, out_ref):
        b = pl.program_id(0)
        S = in_ref.shape[-2]             # (…, L // 128, 128) — TPU-tiled view
        scale = jnp.float32(1.0 / 32768.0)

        # local sample index within one reference block, (S, 128)
        j = (
            jax.lax.broadcasted_iota(jnp.uint32, (S, 128), 0) * jnp.uint32(128)
            + jax.lax.broadcasted_iota(jnp.uint32, (S, 128), 1)
        )

        for wi in range(W):
            k = b * W + wi

            if intype == "i16":
                # ---- decode: one int32 word = one LE i16 pair (dsp.rs:85-99)
                w = in_ref[wi]
                fi = (jnp.left_shift(w, 16) >> 16).astype(jnp.float32) * scale
                fq = (w >> 16).astype(jnp.float32) * scale
            else:
                # ---- f32 wire format decodes to itself (dsp.rs:101-115)
                fi = in_ref[0, wi]
                fq = in_ref[1, wi]

            # ---- exact Q0.64 phase: (j·D + C) mod 2^64, top 24 bits via
            # int32 (Mosaic has no uint32→f32 cast; f32 would only retain
            # 24 bits of the Q0.32 phase anyway)
            q24 = phase_q24(j, d_hi_r[k], d_lo_r[k], c1_hi_r[k], c1_lo_r[k],
                            c2_hi_r[k], c2_lo_r[k], t_r[k],
                            small_j=(S * 128 <= 65536))
            c, s = _sincos_q24(q24)

            oi, oq = mix_tone(fi, fq, c, s)

            if outtype == "i16":
                # ---- encode: ×32767, truncate toward zero, saturate
                # (main.rs:76-84).  For i16 inputs the reference's NaN→0
                # branch is provably unreachable (decoded values are finite
                # with |v| ≤ 1 and the rotation is finite) so no guard is
                # emitted; f32 inputs can carry NaN bits, so the guard stays.
                def enc(v):
                    v = jnp.trunc(v * jnp.float32(32767.0))
                    if intype == "f32":
                        v = jnp.where(jnp.isnan(v), jnp.float32(0.0), v)
                    v = jnp.clip(
                        v, jnp.float32(-32768.0), jnp.float32(32767.0))
                    return v.astype(jnp.int32)

                # per-plane store (jnp.stack of sublane-sliced planes crashes
                # the Mosaic lowering; indexed stores don't)
                out_ref[wi] = (
                    (enc(oi) & jnp.int32(0xFFFF)) | jnp.left_shift(enc(oq), 16)
                )
            else:
                out_ref[0, wi] = oi
                out_ref[1, wi] = oq

    return kernel


def _pick_blocks_per_step(B: int, L: int, planes: int = 1) -> int:
    """Largest W ≤ 16 dividing B with W·L·4·planes ≤ 2 MB per VMEM buffer."""
    cap = max(1, (2 << 20) // (L * 4 * planes))
    w = min(16, B, cap)
    while B % w:
        w -= 1
    return w


@functools.partial(
    jax.jit,
    static_argnames=("intype", "outtype", "interpret", "blocks_per_step"),
)
def mix_blocks_pallas_fmt(data, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t,
                          *, intype: str = "i16", outtype: str = "i16",
                          interpret: bool = False,
                          blocks_per_step: int | None = None):
    """Fused decode → mix → encode for any i16/f32 wire-format combination.

    ``data``: packed int32 IQ words ``(B, L)`` when ``intype='i16'``, planar
    float32 ``(2, B, L)`` (I plane, Q plane) when ``intype='f32'``.  Returns
    the matching layout for ``outtype``.  Per-block plan words ``(B,)`` ride
    scalar prefetch.  Semantically identical to decode → ``nco.mix_blocks``
    → encode.  ``interpret=True`` runs the Pallas interpreter (CPU tests).
    ``blocks_per_step`` (must divide B) batches W reference blocks per grid
    step; default auto-picks for ~0.5-2 MB DMA transfers.
    """
    if intype not in ("i16", "f32") or outtype not in ("i16", "f32"):
        raise ValueError(f"bad format combo {intype!r} → {outtype!r}")
    if intype == "i16":
        B, L = data.shape
    else:
        _, B, L = data.shape
    if L % 128:
        raise ValueError(f"block length {L} must be a multiple of 128")
    planes = max(2 if intype == "f32" else 1, 2 if outtype == "f32" else 1)
    W = blocks_per_step or _pick_blocks_per_step(B, L, planes)
    if B % W:
        raise ValueError(f"blocks_per_step {W} must divide block count {B}")
    S = L // 128

    if intype == "i16":
        in_spec = pl.BlockSpec((W, S, 128), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        in_arr = data.reshape(B, S, 128)
    else:
        in_spec = pl.BlockSpec((2, W, S, 128), lambda b, *_: (0, b, 0, 0),
                               memory_space=pltpu.VMEM)
        in_arr = data.reshape(2, B, S, 128)
    if outtype == "i16":
        out_spec = pl.BlockSpec((W, S, 128), lambda b, *_: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, S, 128), jnp.int32)
    else:
        out_spec = pl.BlockSpec((2, W, S, 128), lambda b, *_: (0, b, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((2, B, S, 128), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(B // W,),
        in_specs=[in_spec],
        out_specs=out_spec,
    )
    out = pl.pallas_call(
        _make_mixer_kernel(W, intype, outtype),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.asarray(d_hi, jnp.uint32), jnp.asarray(d_lo, jnp.uint32),
        jnp.asarray(c1_hi, jnp.uint32), jnp.asarray(c1_lo, jnp.uint32),
        jnp.asarray(c2_hi, jnp.uint32), jnp.asarray(c2_lo, jnp.uint32),
        jnp.asarray(t, jnp.uint32), in_arr,
    )
    if outtype == "i16":
        return out.reshape(B, L)
    return out.reshape(2, B, L)


def _make_q15_kernel(W: int):
    """Integer-domain mixer kernel (VERDICT r2 #4 experiment).

    Same phase plan and quarter-wave tone as the product kernel, but the
    sample path never leaves the integer domain: raw i16 components are mixed
    by a Q15-quantized tone with int32 MACs, truncated toward zero by an
    integer shift, saturated, and repacked — eliminating the four i16↔f32
    casts and four f32 scale/encode multiplies of the byte-exact kernel.

    NOT byte-exact vs the oracle: the tone carries 15 instead of 24 mantissa
    bits (≈90 dB SNR floor, far inside the reference's own f32 phase-noise
    bound, SURVEY §3.4).  Exists to measure whether the decode/encode floor
    is VPU-cast-bound or HBM/DMA-bound on real hardware (tools/roofline.py).
    """

    def kernel(d_hi_r, d_lo_r, c1_hi_r, c1_lo_r, c2_hi_r, c2_lo_r, t_r,
               in_ref, out_ref):
        b = pl.program_id(0)
        S = in_ref.shape[-2]
        j = (
            jax.lax.broadcasted_iota(jnp.uint32, (S, 128), 0) * jnp.uint32(128)
            + jax.lax.broadcasted_iota(jnp.uint32, (S, 128), 1)
        )
        for wi in range(W):
            k = b * W + wi
            w = in_ref[wi]
            iw = jnp.left_shift(w, 16) >> 16          # int32, [-32768, 32767]
            qw = w >> 16

            d_hi = d_hi_r[k]
            d_lo = d_lo_r[k]
            q24 = phase_q24(j, d_hi, d_lo, c1_hi_r[k], c1_lo_r[k],
                            c2_hi_r[k], c2_lo_r[k], t_r[k],
                            small_j=(S * 128 <= 65536))
            c, s = _sincos_q24(q24)

            # Q15 tone: round-half-away of ×32767 (scale 32767, not 32768,
            # keeps |i·c − q·s| < 2³¹ — no int32 overflow at the extremes)
            half = jnp.float32(0.5)

            def q15(v):
                return (v * jnp.float32(32767.0)
                        + jnp.where(v >= 0, half, -half)).astype(jnp.int32)

            c15 = q15(c)
            s15 = q15(s)
            re = iw * c15 - qw * s15
            im = iw * s15 + qw * c15

            # ÷2¹⁵ truncating toward zero (main.rs:77-78 semantics), saturate
            def down(v):
                v = (v + ((v >> 31) & jnp.int32(32767))) >> 15
                return jnp.clip(v, jnp.int32(-32768), jnp.int32(32767))

            out_ref[wi] = (
                (down(re) & jnp.int32(0xFFFF)) | jnp.left_shift(down(im), 16)
            )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "blocks_per_step"))
def mix_blocks_pallas_q15(words, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t,
                          *, interpret: bool = False,
                          blocks_per_step: int | None = None):
    """Integer-domain i16→i16 mixer (SNR-grade, not byte-exact; see kernel)."""
    B, L = words.shape
    if L % 128:
        raise ValueError(f"block length {L} must be a multiple of 128")
    W = blocks_per_step or _pick_blocks_per_step(B, L)
    if B % W:
        raise ValueError(f"blocks_per_step {W} must divide block count {B}")
    S = L // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(B // W,),
        in_specs=[pl.BlockSpec((W, S, 128), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((W, S, 128), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _make_q15_kernel(W),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, 128), jnp.int32),
        interpret=interpret,
    )(
        jnp.asarray(d_hi, jnp.uint32), jnp.asarray(d_lo, jnp.uint32),
        jnp.asarray(c1_hi, jnp.uint32), jnp.asarray(c1_lo, jnp.uint32),
        jnp.asarray(c2_hi, jnp.uint32), jnp.asarray(c2_lo, jnp.uint32),
        jnp.asarray(t, jnp.uint32), words.reshape(B, S, 128),
    )
    return out.reshape(B, L)


def mix_blocks_pallas(words, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t,
                      *, interpret: bool = False,
                      blocks_per_step: int | None = None):
    """i16 words ``(B, L)`` + per-block plan ``(B,)`` → mixed i16 words.

    The i16→i16 specialization of :func:`mix_blocks_pallas_fmt` (the
    framework's headline kernel — 8 bytes of HBM traffic per sample).
    """
    return mix_blocks_pallas_fmt(
        words, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t,
        intype="i16", outtype="i16", interpret=interpret,
        blocks_per_step=blocks_per_step,
    )
