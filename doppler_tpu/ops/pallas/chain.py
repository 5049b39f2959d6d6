"""Fully fused Pallas chain: i16-decode → NCO mix → P/Q resample → i16-encode.

One kernel, one HBM round trip: the raw int32 IQ words of each reference
block stream into VMEM, the mixed f32 planes never leave the chip, the
polyphase reduction runs as MXU matmuls against pre-shifted taps matrices,
and only the decimated output words return to HBM — ``4 + 4·P/Q`` bytes of
traffic per input sample, the fused-speed-of-light floor for this chain.

Status: exactness-first.  Mosaic's dot supports only DEFAULT (single-pass
bf16, ~1e-3 relative — fails the SNR contract) and HIGHEST (f32 passes) —
we use HIGHEST, which makes the small per-block matmuls MXU-bound and, in
this shape, slower than the XLA banded-matmul chain
(``ops.resample.resample_conv_block``), which remains the production path
(see docs/architecture.md for honest measured rates).  This kernel pins the
fully-fused single-pass structure
(per-block phase constants in SMEM, carry rows in persistent VMEM scratch)
for future tuning (wider blocks, bf16 split-taps accumulation).

Mosaic-friendly formulation (no lane-crossing reshapes):

- the mixed block keeps its natural ``(L/128, 128)`` row tiling;
- the overlap-save carry is the last ``HB/128`` whole rows of the previous
  block (HB = T−1 rounded up to 128), prepended as rows;
- with ``128 % Q == 0`` there are ``n_sub = 128/Q`` output groups per row;
  subgroup s (lane offset s·Q) gets its own taps matrix, zero-shifted by
  ``(HB − (T−1)) + s·Q`` rows (host-precomputed,
  :func:`make_chain_taps`), so every polyphase output is

      Y_s[a, p] = Σ_r  rows[a + r] @ taps_s[128·r : 128·(r+1)]

  — static row slices and ``(K_rows, 128) @ (128, P)`` MXU matmuls;
- the kernel writes subgroup-major outputs ``(n_sub, B, A, P)``; a cheap XLA
  epilogue interleaves them into stream order (touches only the decimated
  output, ~P/Q of the input bytes).

Cross-block state: the TPU grid runs sequentially
(``dimension_semantics=("arbitrary",)``), so the carry persists in VMEM
scratch across grid steps and streams in/out once per call for chunk
chaining.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from doppler_tpu.ops.pallas.mixer import _umulhi32

__all__ = [
    "make_chain_taps",
    "mix_resample_chain_pallas",
    "mix_resample_chain_pallas_stream",
    "carry_rows",
]


def _round_up(x, m):
    return -(-x // m) * m


def carry_rows(T: int) -> int:
    """Whole 128-lane rows needed to hold the T−1-sample FIR history."""
    return _round_up(max(T - 1, 1), 128) // 128


def make_chain_taps(bank: np.ndarray, P: int, Q: int) -> np.ndarray:
    """Host: per-subgroup zero-shifted taps matrices, stacked.

    Returns ``(n_sub, R128·128, P)`` float32 where subgroup s's window—
    starting ``HB − (T−1) + s·Q`` samples into its base row—reads
    ``taps[j − shift_s]`` at buffer offset j.
    """
    if 128 % Q:
        raise ValueError(f"pallas chain needs 128 % Q == 0 (Q={Q})")
    T = bank.shape[1]
    from doppler_tpu.ops.resample import make_taps_matrix

    base = make_taps_matrix(bank, P, Q)        # (Q−1+T, P)
    w_len = base.shape[0]
    hb = carry_rows(T) * 128
    lead0 = hb - (T - 1)                       # history padding offset
    n_sub = 128 // Q
    max_len = lead0 + (n_sub - 1) * Q + w_len
    rows128 = _round_up(max_len, 128)
    # pad the phase dim to ≥8 lanes (tiny-N matmuls crash the Mosaic lowering)
    pp = max(8, P)
    out = np.zeros((n_sub, rows128, pp), dtype=np.float32)
    for s in range(n_sub):
        shift = lead0 + s * Q
        out[s, shift : shift + w_len, :P] = base
    return out


def _make_kernel(L, P, Q, T, n_sub, taps_rows, PP):
    SL = L // 128                 # mixed rows per block
    HBR = carry_rows(T)           # history rows
    R = taps_rows // 128          # taps slices per subgroup
    A = L // 128                  # output groups per subgroup per block
    # subgroup s, group a reads buffer rows a .. a+R−1; max a+R−1 = A−1+R−1
    SRC_ROWS = HBR + SL
    PAD_ROWS = max(0, (A - 1 + R) - SRC_ROWS + 1)

    def kernel(d_hi_r, d_lo_r, c1_hi_r, c1_lo_r, c2_hi_r, c2_lo_r, t_r,
               words_ref, taps_ref, carry_in_ref, out_ref, carry_out_ref,
               carry_ref):
        b = pl.program_id(0)
        shape = words_ref.shape        # (1, SL, 128)

        # ---- decode
        w = words_ref[...]
        fi = (jnp.left_shift(w, 16) >> 16).astype(jnp.float32) * jnp.float32(1 / 32768.0)
        fq = (w >> 16).astype(jnp.float32) * jnp.float32(1 / 32768.0)

        # ---- exact Q0.64 phase (see ops/pallas/mixer.py)
        j = (
            jax.lax.broadcasted_iota(jnp.uint32, shape, 1) * jnp.uint32(128)
            + jax.lax.broadcasted_iota(jnp.uint32, shape, 2)
        )
        d_hi = d_hi_r[b]
        d_lo = d_lo_r[b]
        jd_lo = j * d_lo
        jd_hi = _umulhi32(j, d_lo) + j * d_hi

        def with_offset(c_hi, c_lo):
            lo = jd_lo + c_lo
            carry = (lo < jd_lo).astype(jnp.uint32)
            return jd_hi + c_hi + carry

        q32 = jnp.where(
            j < t_r[b],
            with_offset(c1_hi_r[b], c1_lo_r[b]),
            with_offset(c2_hi_r[b], c2_lo_r[b]),
        )
        q24 = jax.lax.bitcast_convert_type(q32 >> 8, jnp.int32)
        theta = jnp.float32(-2.0 * np.pi) * (
            q24.astype(jnp.float32) * jnp.float32(2.0 ** -24)
        )
        c = jnp.cos(theta)
        s = jnp.sin(theta)
        mi = (fi * c - fq * s)[0]              # (SL, 128)
        mq = (fi * s + fq * c)[0]

        # ---- overlap-save carry (whole rows; streamed in from prior chunk)
        @pl.when(b == 0)
        def _():
            carry_ref[...] = carry_in_ref[...]

        rows_i = jnp.concatenate([carry_ref[0], mi], axis=0)   # (HBR+SL, 128)
        rows_q = jnp.concatenate([carry_ref[1], mq], axis=0)
        if PAD_ROWS:
            z = jnp.zeros((PAD_ROWS, 128), jnp.float32)
            rows_i = jnp.concatenate([rows_i, z], axis=0)
            rows_q = jnp.concatenate([rows_q, z], axis=0)

        # per-plane writes: jnp.stack of sublane-sliced planes crashes the
        # Mosaic lowering (lower_to_llo "d >> 32" check), indexed stores don't
        carry_ref[0] = mi[SL - HBR:]
        carry_ref[1] = mq[SL - HBR:]
        carry_out_ref[0] = mi[SL - HBR:]       # last grid step's write survives
        carry_out_ref[1] = mq[SL - HBR:]

        # ---- polyphase: per-subgroup accumulated row-slice matmuls
        for sub in range(n_sub):
            acc_i = jnp.zeros((A, PP), jnp.float32)
            acc_q = jnp.zeros((A, PP), jnp.float32)
            for r in range(R):
                tap = taps_ref[sub, 128 * r : 128 * (r + 1), :]   # (128, PP)
                xi_r = rows_i[r : r + A, :]                        # (A, 128)
                xq_r = rows_q[r : r + A, :]
                acc_i = acc_i + jnp.dot(
                    xi_r, tap, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                acc_q = acc_q + jnp.dot(
                    xq_r, tap, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            # ---- encode (reference saturating trunc semantics)
            def enc(v):
                v = jnp.trunc(v * jnp.float32(32767.0))
                v = jnp.where(jnp.isnan(v), jnp.float32(0.0), v)
                v = jnp.clip(v, jnp.float32(-32768.0), jnp.float32(32767.0))
                return v.astype(jnp.int32)

            out_ref[sub, 0, :, :] = (
                (enc(acc_i) & jnp.int32(0xFFFF)) | jnp.left_shift(enc(acc_q), 16)
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("P", "Q", "T", "interpret"))
def mix_resample_chain_pallas_stream(words, d_hi, d_lo, c1_hi, c1_lo,
                                     c2_hi, c2_lo, t, chain_taps, carry_in,
                                     *, P: int, Q: int, T: int,
                                     interpret: bool = False):
    """Streaming fused chain.

    ``(B, L)`` i16 words + plans ``(B,)`` + :func:`make_chain_taps` output +
    ``(2, HBR, 128)`` carry → ``((B, L·P/Q) words, carry_out)``.

    Output m of block b has absolute output index ``b·L·P/Q + m`` (absolute
    output 0 ↔ absolute input 0, zero carry at stream start).
    """
    B, L = words.shape
    if L % Q or L % 128:
        raise ValueError(f"block length {L} must be a multiple of Q={Q} and 128")
    M = L * P // Q
    n_sub, taps_rows, PP = chain_taps.shape
    if n_sub != 128 // Q:
        raise ValueError("chain_taps does not match Q")
    HBR = carry_rows(T)
    A = L // 128
    kernel = _make_kernel(L, P, Q, T, n_sub, taps_rows, PP)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L // 128, 128), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sub, taps_rows, PP), lambda b, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, HBR, 128), lambda b, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_sub, 1, A, PP), lambda b, *_: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, HBR, 128), lambda b, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((2, HBR, 128), jnp.float32)],
    )
    out, carry_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_sub, B, A, PP), jnp.int32),
            jax.ShapeDtypeStruct((2, HBR, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),   # sequential: carry is stateful
        ),
        interpret=interpret,
    )(
        jnp.asarray(d_hi, jnp.uint32), jnp.asarray(d_lo, jnp.uint32),
        jnp.asarray(c1_hi, jnp.uint32), jnp.asarray(c1_lo, jnp.uint32),
        jnp.asarray(c2_hi, jnp.uint32), jnp.asarray(c2_lo, jnp.uint32),
        jnp.asarray(t, jnp.uint32),
        words.reshape(B, L // 128, 128), jnp.asarray(chain_taps),
        jnp.asarray(carry_in, jnp.float32),
    )
    # epilogue: subgroup-major (n_sub, B, A, PP) → stream order (B, A·n_sub·P)
    out = jnp.transpose(out, (1, 2, 0, 3))[..., :P].reshape(B, M)
    return out, carry_out


def mix_resample_chain_pallas(words, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t,
                              chain_taps, *, P: int, Q: int, T: int,
                              interpret: bool = False):
    """One-shot form (zero history): see the streaming variant above."""
    carry0 = jnp.zeros((2, carry_rows(T), 128), jnp.float32)
    out, _ = mix_resample_chain_pallas_stream(
        words, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t, chain_taps, carry0,
        P=P, Q=Q, T=T, interpret=interpret,
    )
    return out
