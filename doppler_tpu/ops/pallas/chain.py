"""Fully fused Pallas chain: i16-decode → NCO mix → P/Q resample → i16-encode.

One kernel, one HBM round trip: the raw int32 IQ words of each reference
block stream into VMEM, the mixed f32 planes never leave the chip, the
polyphase reduction runs as MXU matmuls against pre-shifted taps matrices,
and only the decimated output words return to HBM — ``4 + 4·P/Q`` bytes of
traffic per input sample, the fused-speed-of-light floor for this chain.

Exactness: Mosaic's dot supports only DEFAULT (single-pass bf16, ~1e-3
relative — fails the SNR contract) and HIGHEST (f32 passes) — we use
HIGHEST.  Matmul-granularity matters far more than precision passes here:
one grid step batches W reference blocks and reduces ALL subgroups, both
I/Q planes, and all W blocks in R accumulated ``(2·W·L/128, 128) @
(128, n_sub·PP)`` matmuls — a few hundred large matmuls per chunk instead
of tens of thousands of ``(64,128)@(128,8)`` ones, which were
pipeline-startup-bound.

Mosaic-friendly formulation (no lane-crossing reshapes):

- the mixed blocks keep their natural ``(W·L/128, 128)`` row tiling;
- the overlap-save carry is the last ``HB/128`` whole rows of the previous
  grid step (HB = T−1 rounded up to 128), prepended as rows;
- with ``128 % Q == 0`` there are ``n_sub = 128/Q`` output groups per row;
  subgroup s (lane offset s·Q) gets its own taps matrix, zero-shifted by
  ``(HB − (T−1)) + s·Q`` rows (host-precomputed, :func:`make_chain_taps`),
  so all subgroups share one LHS and stack as matmul *columns*, and the
  I/Q planes stack as matmul *rows*:

      Y[a, s·PP+p] = Σ_r  rows[a + r] @ taps_merged[128·r : 128·(r+1)]

- the kernel writes ``(B/W, A, n_sub·PP)``; a cheap XLA epilogue drops the
  PP−P pad phases into stream order (touches only the decimated output,
  ~P/Q of the input bytes).

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

from doppler_tpu.ops.pallas.mixer import (
    _sincos_q24,
    phase_q24,
    phase_q24_outer,
)
from doppler_tpu.ops.sincos import mix_tone

__all__ = [
    "make_chain_taps",
    "mix_resample_chain_pallas",
    "mix_resample_chain_pallas_stream",
    "mix_resample_chain_pallas_channels",
    "mix_cascade_pallas_stream",
    "mix_cascade_pallas_channels",
    "cascade_dims",
    "pick_cascade_blocks_per_step",
    "split_point",
    "front_taps",
    "taps_shapes",
    "cascade_replay_need",
    "widen_replay_span",
    "chain_channel",
    "carry_rows",
]


def _round_up(x, m):
    return -(-x // m) * m


def carry_rows(T: int) -> int:
    """Whole 128-lane rows needed to hold the T−1-sample FIR history."""
    return _round_up(max(T - 1, 1), 128) // 128


def make_chain_taps(bank: np.ndarray, P: int, Q: int,
                    pp: int | None = None) -> np.ndarray:
    """Host: per-subgroup zero-shifted taps matrices, stacked.

    Returns ``(n_sub, R128·128, pp)`` float32 where subgroup s's window—
    starting ``HB − (T−1) + s·Q`` samples into its base row—reads
    ``taps[j − shift_s]`` at buffer offset j.

    ``pp`` is the stored phase width per subgroup.  Default ``max(8, P)``
    (tiny-N matmuls crash the Mosaic lowering) with an XLA epilogue dropping
    the pad phases; cascade inner stages pass ``pp=P`` so the D-merged
    matmul output IS the dense 128-lane stream-row layout of the next stage
    (the total column count D·n_sub·P = 128 keeps the matmul N full-width).
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
    if pp is None:
        pp = max(8, P)
    out = np.zeros((n_sub, rows128, pp), dtype=np.float32)
    for s in range(n_sub):
        shift = lead0 + s * Q
        out[s, shift : shift + w_len, :P] = base
    return out


_DOT_PRECISIONS = {"highest": jax.lax.Precision.HIGHEST,
                   "default": jax.lax.Precision.DEFAULT}


def _split_bf16_exact(v):
    """``x ≈ x_h + x_l`` with both terms bf16-EXACT f32 values — THE one
    operand split of the split3 scheme (3-pass bf16-split: operands are
    rounded so each DEFAULT dot's internal f32→bf16 feed is lossless and
    one MXU pass; ``|x−x_h−x_l| ≤ 2⁻¹⁸|x|``).  Shared by every split3
    site — kernels and host taps prep MUST use the same split or the
    scheme's accuracy bound silently drifts (ROADMAP r5 dedup)."""
    h = v.astype(jnp.bfloat16).astype(jnp.float32)
    l = (v - h).astype(jnp.bfloat16).astype(jnp.float32)
    return h, l


def split3_taps(taps_wide):
    """Host/trace: widened taps → hi rows stacked over lo rows, the layout
    the split3 kernels slice (``taps_ref[:NS128]`` = t_h, rest = t_l)."""
    t_h, t_l = _split_bf16_exact(taps_wide)
    return jnp.concatenate([t_h, t_l], axis=0)


def _make_mix_front(W, SL, intype, phase_impl):
    """The shared decode → Q0.64 phase → tone → rotate front of every
    fused kernel (chain and cascade, stream and channel-batched): returns
    ``front(b, sidx, words_ref, *plan_refs) → (rows_i, rows_q)`` for one
    grid step.  One definition keeps the byte-exactness contract in one
    place (ROADMAP r5 dedup)."""

    def front(b, sidx, words_ref,
              d_hi_r, d_lo_r, c1_hi_r, c1_lo_r, c2_hi_r, c2_lo_r, t_r):
        # local sample index within one reference block — only the flat
        # phase path materializes it per element
        if phase_impl != "outer":
            j = (jax.lax.broadcasted_iota(jnp.uint32, (SL, 128), 0)
                 * jnp.uint32(128)
                 + jax.lax.broadcasted_iota(jnp.uint32, (SL, 128), 1))
        scale = jnp.float32(1.0 / 32768.0)
        mis, mqs = [], []
        for wi in range(W):
            k = b * W + wi
            # decode (i16 words unpack; f32 planes pass straight through)
            if intype == "i16":
                w = words_ref[wi]               # (SL, 128)
                fi = (jnp.left_shift(w, 16) >> 16).astype(jnp.float32) * scale
                fq = (w >> 16).astype(jnp.float32) * scale
            else:
                fi = words_ref[0, wi]           # planar f32
                fq = words_ref[1, wi]
            # exact Q0.64 phase (shared VPU hot loop, ops/pallas/mixer)
            plan_k = (sidx(d_hi_r, k), sidx(d_lo_r, k),
                      sidx(c1_hi_r, k), sidx(c1_lo_r, k),
                      sidx(c2_hi_r, k), sidx(c2_lo_r, k), sidx(t_r, k))
            if phase_impl == "outer":
                q24 = phase_q24_outer(SL, *plan_k)
            else:
                q24 = phase_q24(j, *plan_k, small_j=(SL * 128 <= 65536))
            c, s = _sincos_q24(q24)
            oi, oq = mix_tone(fi, fq, c, s)
            mis.append(oi)
            mqs.append(oq)
        rows_i = mis[0] if W == 1 else jnp.concatenate(mis, axis=0)
        rows_q = mqs[0] if W == 1 else jnp.concatenate(mqs, axis=0)
        return rows_i, rows_q

    return front


def _acc_slices(rows_i, rows_q, taps_ref, G, D, CC, NSLICE, dot_precision):
    """The shared NSLICE-accumulation over D-regrouped rows — one
    formulation for the chain and every cascade stage, at either
    precision.  ``split3`` computes ``acc += x_h·t_h + x_h·t_l + x_l·t_h``
    (3 lossless single-pass DEFAULT dots, dropping only the ~2⁻³⁶ lo·lo
    term — ~90 dB vs "highest" measured, ≤1 LSB); ``highest`` is the
    6-pass exact f32 path.  (An integer-mask split was measured ~11%
    slower than the converts on the v5e and dropped; see ROADMAP r5.)"""
    if dot_precision == "split3":
        ri_h, ri_l = _split_bf16_exact(rows_i)
        rq_h, rq_l = _split_bf16_exact(rows_q)
        if D == 1:
            r3 = [v[:, None, :] for v in (ri_h, ri_l, rq_h, rq_l)]
        else:
            r3 = [v.reshape(-1, D, 128) for v in (ri_h, ri_l, rq_h, rq_l)]
        ri_h3, ri_l3, rq_h3, rq_l3 = r3
        NS128 = NSLICE * 128
        acc = jnp.zeros((2 * G, D * CC), jnp.float32)
        for rp in range(NSLICE):
            q_, d_ = divmod(rp, D)
            x_h = jnp.concatenate(
                [ri_h3[q_:q_ + G, d_, :], rq_h3[q_:q_ + G, d_, :]], axis=0)
            x_l = jnp.concatenate(
                [ri_l3[q_:q_ + G, d_, :], rq_l3[q_:q_ + G, d_, :]], axis=0)
            t_h = taps_ref[128 * rp:128 * (rp + 1), :]
            t_l = taps_ref[NS128 + 128 * rp:NS128 + 128 * (rp + 1), :]
            acc = acc + (
                jnp.dot(x_h, t_h, preferred_element_type=jnp.float32)
                + jnp.dot(x_h, t_l, preferred_element_type=jnp.float32)
                + jnp.dot(x_l, t_h, preferred_element_type=jnp.float32))
        return acc
    if D == 1:
        r3i = rows_i[:, None, :]
        r3q = rows_q[:, None, :]
    else:
        r3i = rows_i.reshape(-1, D, 128)
        r3q = rows_q.reshape(-1, D, 128)
    acc = jnp.zeros((2 * G, D * CC), jnp.float32)
    for rp in range(NSLICE):
        q_, d_ = divmod(rp, D)
        x_r = jnp.concatenate(
            [r3i[q_:q_ + G, d_, :], r3q[q_:q_ + G, d_, :]], axis=0)
        acc = acc + jnp.dot(
            x_r, taps_ref[128 * rp:128 * (rp + 1), :],
            preferred_element_type=jnp.float32,
            precision=_DOT_PRECISIONS[dot_precision])
    return acc


def _make_kernel(L, P, Q, T, n_sub, taps_rows, PP, W, channels=False, D=1,
                 intype="i16", outtype="i16", dot_precision="highest",
                 phase_impl="flat"):
    SL = L // 128                 # mixed rows per reference block
    WSL = W * SL                  # mixed rows per grid step
    HBR = carry_rows(T)           # history rows
    R = taps_rows // 128          # taps slices per subgroup
    A = WSL                       # output groups per subgroup per step
    CC = n_sub * PP               # merged matmul columns per output group
    # ---- matmul-lane widening (D output groups per LHS row) ----
    # With CC ≪ 128 the matmul N-dim wastes MXU lanes (config 3: CC=16 →
    # 12.5% lane utilization).  Column block δ < D of the widened taps is
    # the base taps shifted down 128·δ rows, so LHS row a' covers output
    # groups a'·D+δ for all δ at once: N grows D×, MAC count only
    # (R+D−1)/R×.  The extra taps rows are exact zeros, so outputs are
    # bitwise identical to the D=1 formulation.
    assert A % D == 0, (A, D)
    G = A // D                    # LHS rows (output-group tiles) per step
    NSLICE = R + D - 1            # widened reduction slices
    # group a reads buffer rows a .. a+R−1; max needed = A−1+R−1;
    # the (rows → (rows/D, D, 128)) regrouping needs D | total rows
    SRC_ROWS = HBR + WSL
    PAD_ROWS = max(0, (A - 1 + R) - SRC_ROWS + 1)
    if (SRC_ROWS + PAD_ROWS) % D:
        PAD_ROWS += D - (SRC_ROWS + PAD_ROWS) % D

    front = _make_mix_front(W, SL, intype, phase_impl)

    def kernel(d_hi_r, d_lo_r, c1_hi_r, c1_lo_r, c2_hi_r, c2_lo_r, t_r,
               words_ref, taps_ref, carry_in_ref, out_ref, carry_out_ref,
               carry_ref):
        # channel-batched form: grid (C, B/W), c-major so the carry scratch
        # finishes one channel's stream before the next begins
        b = pl.program_id(1) if channels else pl.program_id(0)
        if channels:
            ch = pl.program_id(0)
            sidx = lambda r, k: r[ch, k]        # noqa: E731  (C, B) plans
        else:
            sidx = lambda r, k: r[k]            # noqa: E731  (B,) plans

        mi, mq = front(b, sidx, words_ref, d_hi_r, d_lo_r, c1_hi_r,
                       c1_lo_r, c2_hi_r, c2_lo_r, t_r)     # (WSL, 128)

        # ---- overlap-save carry (whole rows; streamed in from prior chunk,
        # re-seeded at each channel's first step in channel-batched form)
        @pl.when(b == 0)
        def _():
            carry_ref[...] = carry_in_ref[0] if channels else carry_in_ref[...]

        rows_i = jnp.concatenate([carry_ref[0], mi], axis=0)   # (HBR+WSL, 128)
        rows_q = jnp.concatenate([carry_ref[1], mq], axis=0)
        if PAD_ROWS:
            z = jnp.zeros((PAD_ROWS, 128), jnp.float32)
            rows_i = jnp.concatenate([rows_i, z], axis=0)
            rows_q = jnp.concatenate([rows_q, z], axis=0)

        # per-plane writes: jnp.stack of sublane-sliced planes crashes the
        # Mosaic lowering (lower_to_llo "d >> 32" check), indexed stores don't
        carry_ref[0] = mi[WSL - HBR:]
        carry_ref[1] = mq[WSL - HBR:]
        if channels:
            # last step of each channel's run survives into its (c,…) block
            carry_out_ref[0, 0] = mi[WSL - HBR:]
            carry_out_ref[0, 1] = mq[WSL - HBR:]
        else:
            carry_out_ref[0] = mi[WSL - HBR:]  # last grid step's write survives
            carry_out_ref[1] = mq[WSL - HBR:]

        # ---- polyphase: R+D−1 accumulated matmuls, I/Q row-stacked, all
        # subgroups AND D group-offsets column-stacked —
        # (2A/D, 128) @ (128, D·n_sub·PP) per slice.  The per-subgroup
        # window shifts are baked into the taps rows (make_chain_taps) and
        # the per-δ group offsets into the widened taps (wide_chain_taps),
        # so every column shares the same LHS.  Buffer row a'·D + r' =
        # rows3[a' + r'//D, r'%D], so each slice is a contiguous
        # fixed-plane view of the D-regrouped rows (see _acc_slices for
        # the exact-vs-split3 precision schemes).
        acc = _acc_slices(rows_i, rows_q, taps_ref, G, D, CC, NSLICE,
                          dot_precision)

        if outtype == "f32":
            # per-plane indexed stores (a stacked store crashes Mosaic)
            if channels:
                out_ref[0, 0, 0] = acc[:G]
                out_ref[1, 0, 0] = acc[G:]
            else:
                out_ref[0, 0] = acc[:G]
                out_ref[1, 0] = acc[G:]
            return

        # ---- encode (reference saturating trunc semantics).  The NaN→0
        # branch (main.rs:77-78 via the oracle contract) is reachable only
        # on f32 input — finite i16-decoded samples through a finite FIR
        # stay finite, so the i16-in kernel skips the select.
        def enc(v):
            w = jnp.trunc(v * jnp.float32(32767.0))
            w = jnp.clip(w, jnp.float32(-32768.0), jnp.float32(32767.0))
            if intype != "i16":
                w = jnp.where(jnp.isnan(v), jnp.float32(0.0), w)
            return w.astype(jnp.int32)

        word = (
            (enc(acc[:G]) & jnp.int32(0xFFFF))
            | jnp.left_shift(enc(acc[G:]), 16)
        )
        if channels:
            out_ref[0, 0] = word
        else:
            out_ref[0] = word

    return kernel


def _pick_group_cols(A: int, CC: int) -> int:
    """Largest D dividing A with D·CC ≤ 128 (full MXU lane width) and at
    least 4 output-group tiles per step (matmul M = 2·A/D ≥ 8)."""
    d = max(1, min(128 // CC, A // 4)) if CC <= 64 else 1
    while d > 1 and A % d:
        d -= 1
    return d


def _pick_chain_blocks_per_step(B: int, L: int, T: int, CC: int) -> int:
    """W dividing B sized for step efficiency: A = W·L/128 input rows
    targets 256·D (matmul M = 2A/D = 512).  An interleaved TPU A/B at the
    config-3 bench shape measured W∈{8,16,32} within ±1% (best-of 9.91 /
    9.99 / 10.03 GS/s) with W=64 collapsing on VMEM pressure — W=32's
    bigger DMA transfers are marginally ahead and never worse.  Capped at
    A ≤ 2048 rows (~2 MB/plane of live buffers fits scoped VMEM) and
    floored so the step spans the carry rows (the step must produce its
    own FIR history)."""
    sl = L // 128
    d_ideal = max(1, 128 // CC)
    w_target = max(1, (256 * d_ideal) // sl)
    cap = max(1, (2048 * 128) // L)
    w = min(w_target, B, cap)
    while w > 1 and (B % w or (w * L) // 128 < carry_rows(T)):
        w -= 1
    return w


def wide_chain_taps(taps_merged, D: int):
    """Widen merged taps ``(R·128, CC)`` → ``((R+D−1)·128, D·CC)``.

    Column block δ is the base taps shifted down 128·δ rows (zero-filled),
    matching the kernel's D-interleaved output-group assignment.  Traced
    (runs under jit); the result is ~D× the base taps, still ≪ VMEM.
    """
    if D == 1:
        return taps_merged
    return jnp.concatenate(
        [
            jnp.pad(taps_merged, ((128 * d, 128 * (D - 1 - d)), (0, 0)))
            for d in range(D)
        ],
        axis=1,
    )


@functools.partial(
    jax.jit, static_argnames=("P", "Q", "T", "interpret", "blocks_per_step",
                              "intype", "outtype", "dot_precision",
                              "phase_impl")
)
def mix_resample_chain_pallas_stream(words, d_hi, d_lo, c1_hi, c1_lo,
                                     c2_hi, c2_lo, t, chain_taps, carry_in,
                                     *, P: int, Q: int, T: int,
                                     interpret: bool = False,
                                     blocks_per_step: int | None = None,
                                     intype: str = "i16",
                                     outtype: str = "i16",
                                     dot_precision: str = "highest",
                                     phase_impl: str = "flat"):
    """Streaming fused chain, all four wire formats (dsp.rs:85-115).

    i16 input: ``(B, L)`` packed int32 words; f32 input: ``(2, B, L)``
    planar planes (the Pallas staging layout).  i16 output: ``(B, L·P/Q)``
    words; f32 output: ``(2, B, L·P/Q)`` planes.  Plans ``(B,)`` +
    :func:`make_chain_taps` output + ``(2, HBR, 128)`` carry; returns
    ``(out, carry_out)``.

    Output m of block b has absolute output index ``b·L·P/Q + m`` (absolute
    output 0 ↔ absolute input 0, zero carry at stream start).
    ``blocks_per_step`` batches W reference blocks per sequential grid step
    (identical output for any W: grouping only changes matmul/DMA sizes).

    NaN caveat (f32 input only): like the banded-matmul XLA formulation
    (``resample_conv_stream``), a NaN input sample pollutes every output
    whose matmul rows overlap it — wider than the T-sample window of the
    gather formulation.  i16→i16 encode output is NaN-free by construction;
    f32-in→i16-out applies the reference's NaN→0 encode rule.
    """
    if intype == "i16":
        B, L = words.shape
    else:
        _, B, L = words.shape
    if L % Q or L % 128:
        raise ValueError(f"block length {L} must be a multiple of Q={Q} and 128")
    M = L * P // Q
    n_sub, taps_rows, PP = chain_taps.shape
    if n_sub != 128 // Q:
        raise ValueError("chain_taps does not match Q")
    HBR = carry_rows(T)
    CC = n_sub * PP
    W = blocks_per_step or _pick_chain_blocks_per_step(B, L, T, CC)
    if B % W:
        raise ValueError(f"blocks_per_step {W} must divide block count {B}")
    if (W * L) // 128 < HBR:
        raise ValueError(
            f"blocks_per_step {W} too small: step must span ≥ {HBR} rows"
        )
    SL = L // 128
    A = W * SL
    D = _pick_group_cols(A, CC)
    G = A // D
    NSLICE = taps_rows // 128 + D - 1
    kernel = _make_kernel(L, P, Q, T, n_sub, taps_rows, PP, W, D=D,
                          intype=intype, outtype=outtype,
                          dot_precision=dot_precision,
                          phase_impl=phase_impl)

    if intype == "i16":
        data_spec = pl.BlockSpec((W, SL, 128), lambda b, *_: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        data = words.reshape(B, SL, 128)
    else:
        data_spec = pl.BlockSpec((2, W, SL, 128), lambda b, *_: (0, b, 0, 0),
                                 memory_space=pltpu.VMEM)
        data = words.reshape(2, B, SL, 128)
    if outtype == "i16":
        out_spec = pl.BlockSpec((1, G, D * CC), lambda b, *_: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B // W, G, D * CC), jnp.int32)
    else:
        out_spec = pl.BlockSpec((2, 1, G, D * CC), lambda b, *_: (0, b, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((2, B // W, G, D * CC), jnp.float32)

    taps_row_blocks = 2 if dot_precision == "split3" else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(B // W,),
        in_specs=[
            data_spec,
            pl.BlockSpec((taps_row_blocks * NSLICE * 128, D * CC),
                         lambda b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, HBR, 128), lambda b, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            out_spec,
            pl.BlockSpec((2, HBR, 128), lambda b, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((2, HBR, 128), jnp.float32)],
    )
    # merge subgroups into matmul columns: (n_sub, rows, PP) → (rows, n_sub·PP)
    taps_merged = jnp.transpose(
        jnp.asarray(chain_taps), (1, 0, 2)
    ).reshape(taps_rows, CC)
    taps_wide = wide_chain_taps(taps_merged, D)
    if dot_precision == "split3":
        taps_wide = split3_taps(taps_wide)
    out, carry_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            out_shape,
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
        data, taps_wide,
        jnp.asarray(carry_in, jnp.float32),
    )
    # epilogue: (…, G, D, n_sub, PP) → keep P real phases → stream order
    if outtype == "i16":
        out = out.reshape(B // W, A, n_sub, PP)[..., :P].reshape(B, M)
    else:
        out = out.reshape(2, B // W, A, n_sub, PP)[..., :P].reshape(2, B, M)
    return out, carry_out


@functools.partial(
    jax.jit, static_argnames=("P", "Q", "T", "interpret", "blocks_per_step")
)
def mix_resample_chain_pallas(words, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t,
                              chain_taps, *, P: int, Q: int, T: int,
                              interpret: bool = False,
                              blocks_per_step: int | None = None):
    """One-shot form (zero history): see the streaming variant above.

    jitted so the zero carry folds into the executable — an eager
    ``jnp.zeros`` per call costs a separate device dispatch, which through a
    remote relay is milliseconds of fixed overhead.
    """
    carry0 = jnp.zeros((2, carry_rows(T), 128), jnp.float32)
    out, _ = mix_resample_chain_pallas_stream(
        words, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t, chain_taps, carry0,
        P=P, Q=Q, T=T, interpret=interpret, blocks_per_step=blocks_per_step,
    )
    return out


@functools.partial(
    jax.jit, static_argnames=("P", "Q", "T", "interpret", "blocks_per_step",
                              "intype", "outtype", "dot_precision")
)
def mix_resample_chain_pallas_channels(words, fields, chain_taps, carries,
                                       *, P: int, Q: int, T: int,
                                       interpret: bool = False,
                                       blocks_per_step: int | None = None,
                                       intype: str = "i16",
                                       outtype: str = "i16",
                                       dot_precision: str = "highest"):
    """Channel-batched streaming chain: ONE kernel launch for all channels.

    ``words``   : shared wideband ``(B, L)`` i16 words, or ``(2, B, L)``
                  planar f32 planes (``intype='f32'``; round 4 closes the
                  i16-only gap of VERDICT r3 missing #3 — dsp.rs:101-115
                  makes f32 a first-class wire format).
    ``fields``  : ``(7, C, B)`` uint32 plan stack (d_hi…t, channel-major).
    ``carries`` : ``(C, 2, HBR, 128)`` per-channel FIR carries.
    → ``((C, B, M) words — or (2, C, B, M) planes — , carries)``.

    Grid ``(C, B/W)`` iterates channel-major; the carry scratch re-seeds
    from ``carries[c]`` at each channel's first step, so per-channel output
    matches C separate single-channel streaming calls (carries bitwise;
    words within 1 LSB — the stream kernel is a differently shaped XLA
    program whose fusion/FMA choices in the mix stage may differ by 1 ulp;
    see tests/test_pallas_chain.py::test_channel_batched_chain…).  One
    launch instead of C amortizes the per-dispatch host/relay overhead
    (~1 ms each through this environment's tunnel) that made per-channel
    dispatch launch-bound.
    """
    if intype == "i16":
        B, L = words.shape
    else:
        _, B, L = words.shape
    if L % Q or L % 128:
        raise ValueError(f"block length {L} must be a multiple of Q={Q} and 128")
    M = L * P // Q
    n_sub, taps_rows, PP = chain_taps.shape
    if n_sub != 128 // Q:
        raise ValueError("chain_taps does not match Q")
    C = carries.shape[0]
    if fields.shape != (7, C, B):
        raise ValueError(f"fields shape {fields.shape} != (7, {C}, {B})")
    HBR = carry_rows(T)
    CC = n_sub * PP
    W = blocks_per_step or _pick_chain_blocks_per_step(B, L, T, CC)
    if B % W:
        raise ValueError(f"blocks_per_step {W} must divide block count {B}")
    if (W * L) // 128 < HBR:
        raise ValueError(
            f"blocks_per_step {W} too small: step must span ≥ {HBR} rows"
        )
    SL = L // 128
    A = W * SL
    D = _pick_group_cols(A, CC)
    G = A // D
    NSLICE = taps_rows // 128 + D - 1
    kernel = _make_kernel(L, P, Q, T, n_sub, taps_rows, PP, W, channels=True,
                          D=D, intype=intype, outtype=outtype,
                          dot_precision=dot_precision)

    if intype == "i16":
        data_spec = pl.BlockSpec((W, SL, 128), lambda c, b, *_: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        data = words.reshape(B, SL, 128)
    else:
        data_spec = pl.BlockSpec((2, W, SL, 128),
                                 lambda c, b, *_: (0, b, 0, 0),
                                 memory_space=pltpu.VMEM)
        data = words.reshape(2, B, SL, 128)
    if outtype == "i16":
        out_spec = pl.BlockSpec((1, 1, G, D * CC),
                                lambda c, b, *_: (c, b, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((C, B // W, G, D * CC), jnp.int32)
    else:
        out_spec = pl.BlockSpec((2, 1, 1, G, D * CC),
                                lambda c, b, *_: (0, c, b, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((2, C, B // W, G, D * CC),
                                         jnp.float32)

    taps_row_blocks = 2 if dot_precision == "split3" else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(C, B // W),
        in_specs=[
            data_spec,
            pl.BlockSpec((taps_row_blocks * NSLICE * 128, D * CC),
                         lambda c, b, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, HBR, 128), lambda c, b, *_: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            out_spec,
            pl.BlockSpec((1, 2, HBR, 128), lambda c, b, *_: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((2, HBR, 128), jnp.float32)],
    )
    f = jnp.asarray(fields, jnp.uint32)
    taps_merged = jnp.transpose(
        jnp.asarray(chain_taps), (1, 0, 2)
    ).reshape(taps_rows, CC)
    taps_wide = wide_chain_taps(taps_merged, D)
    if dot_precision == "split3":
        taps_wide = split3_taps(taps_wide)
    out, carry_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            out_shape,
            jax.ShapeDtypeStruct((C, 2, HBR, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        f[0], f[1], f[2], f[3], f[4], f[5], f[6],
        data, taps_wide,
        jnp.asarray(carries, jnp.float32),
    )
    if outtype == "i16":
        out = out.reshape(C, B // W, A, n_sub, PP)[..., :P].reshape(C, B, M)
    else:
        out = out.reshape(2, C, B // W, A, n_sub, PP)[..., :P].reshape(
            2, C, B, M)
    return out, carry_out


@functools.partial(
    jax.jit, static_argnames=("P", "Q", "T", "interpret", "blocks_per_step")
)
def chain_channel(words, fields, c, chain_taps, carry_in, *, P: int, Q: int,
                  T: int, interpret: bool = False,
                  blocks_per_step: int | None = None):
    """Per-channel streaming chain over a shared plan tensor.

    ``fields`` is the uint32 ``(7, C, B)`` plan stack of
    ``runtime.channels.MultiChannelPipeline._plan_all``; ``c`` a traced
    channel index (one executable serves every channel).  Slicing inside the
    trace avoids 7·C tiny eager host→device transfers per chunk.
    """
    f = jnp.asarray(fields, jnp.uint32)
    return mix_resample_chain_pallas_stream(
        words, f[0, c], f[1, c], f[2, c], f[3, c], f[4, c], f[5, c], f[6, c],
        chain_taps, carry_in,
        P=P, Q=Q, T=T, interpret=interpret, blocks_per_step=blocks_per_step,
    )


# ---------------------------------------------------------------------------
# Fully fused multi-stage cascade (VERDICT r2 #5c/#7): decode → mix →
# halfband ÷2 stages → final rational stage → encode, ONE kernel, ONE HBM
# round trip.  Inner stages store taps with pp = P (no pad phases), so with
# D = Q/P output groups merged per LHS row the matmul result (G, D·n_sub·P)
# = (G, 128) IS the next stage's dense stream-row layout — intermediates
# never leave VMEM and never need a lane shuffle.  The final stage uses the
# padded-phase layout + XLA epilogue exactly like the single-stage chain.
# This is what makes ARBITRARY heavy decimations (100 Msps → 48 ksps) run at
# fused-chain speed: halfbands (Q=2) are always lane-aligned, and the sharp
# final filter runs at the lowest rate where even an XLA tail would be
# cheap.


def cascade_dims(L: int, W: int, stage_shapes,
                 final_dense: bool = False) -> list[dict]:
    """Static per-stage geometry for one grid step of W input blocks.

    ``stage_shapes``: per stage ``(P, Q, T, n_sub, taps_rows, PP)`` —
    from each stage's :func:`make_chain_taps` output (+ its resampler).
    Raises ValueError when the cascade cannot be fused at this (L, W).

    ``final_dense``: treat the LAST stage like an inner stage (pp=P,
    D=Q/P merged output groups) so the kernel's output is the dense
    128-lane stream-row layout — the *split-cascade* front (VERDICT r3
    next #1): a fusable ÷2^k halfband prefix emits f32 planes for an XLA
    final stage whose Q doesn't tile 128 lanes.
    """
    A = W * (L // 128)
    dims = []
    nstg = len(stage_shapes)
    for idx, (P, Q, T, n_sub, taps_rows, PP) in enumerate(stage_shapes):
        last = idx == nstg - 1 and not final_dense
        HBR = carry_rows(T)
        R = taps_rows // 128
        CC = n_sub * PP
        if last:
            D = _pick_group_cols(A, CC)
        else:
            if PP != P or Q % P:
                raise ValueError("inner cascade stage needs pp=P and P | Q")
            D = Q // P
            if D * CC != 128:
                raise ValueError(
                    f"inner stage (P={P}, Q={Q}) does not tile 128 lanes")
        if A % D or A < 1:
            raise ValueError(f"stage {idx}: {A} rows not divisible by D={D}")
        if A < HBR:
            raise ValueError(
                f"stage {idx}: step spans {A} rows < carry {HBR}")
        G = A // D
        SRC = HBR + A
        PAD = max(0, (A - 1 + R) - SRC + 1)
        if (SRC + PAD) % D:
            PAD += D - (SRC + PAD) % D
        dims.append(dict(P=P, Q=Q, T=T, n_sub=n_sub, PP=PP, HBR=HBR, R=R,
                         CC=CC, D=D, A=A, G=G, PAD=PAD, NSLICE=R + D - 1,
                         last=last))
        A = G if not last else A
    return dims


def _make_cascade_kernel(L, W, dims, intype="i16", outtype="i16",
                         channels=False, dot_precision="highest"):
    SL = L // 128
    nstg = len(dims)
    front = _make_mix_front(W, SL, intype, "flat")

    def kernel(d_hi_r, d_lo_r, c1_hi_r, c1_lo_r, c2_hi_r, c2_lo_r, t_r,
               words_ref, *rest):
        taps_refs = rest[:nstg]
        carry_in_refs = rest[nstg:2 * nstg]
        out_ref = rest[2 * nstg]
        carry_out_refs = rest[2 * nstg + 1:3 * nstg + 1]
        scratch_refs = rest[3 * nstg + 1:]
        b = pl.program_id(1) if channels else pl.program_id(0)
        if channels:
            ch = pl.program_id(0)
            sidx = lambda r, k: r[ch, k]        # noqa: E731  (C, B) plans
        else:
            sidx = lambda r, k: r[k]            # noqa: E731  (B,) plans

        rows_i, rows_q = front(b, sidx, words_ref, d_hi_r, d_lo_r, c1_hi_r,
                               c1_lo_r, c2_hi_r, c2_lo_r, t_r)

        acc = None
        for si, st in enumerate(dims):
            HBR, R, D, G, A, PAD = (st["HBR"], st["R"], st["D"], st["G"],
                                    st["A"], st["PAD"])

            @pl.when(b == 0)
            def _(si=si):
                scratch_refs[si][...] = (
                    carry_in_refs[si][0] if channels
                    else carry_in_refs[si][...]
                )

            full_i = jnp.concatenate([scratch_refs[si][0], rows_i], axis=0)
            full_q = jnp.concatenate([scratch_refs[si][1], rows_q], axis=0)
            if PAD:
                z = jnp.zeros((PAD, 128), jnp.float32)
                full_i = jnp.concatenate([full_i, z], axis=0)
                full_q = jnp.concatenate([full_q, z], axis=0)
            # carry = last HBR rows of this stage's input (overlap-save)
            scratch_refs[si][0] = rows_i[A - HBR:]
            scratch_refs[si][1] = rows_q[A - HBR:]
            if channels:
                carry_out_refs[si][0, 0] = rows_i[A - HBR:]
                carry_out_refs[si][0, 1] = rows_q[A - HBR:]
            else:
                carry_out_refs[si][0] = rows_i[A - HBR:]
                carry_out_refs[si][1] = rows_q[A - HBR:]

            acc = _acc_slices(full_i, full_q, taps_refs[si], G, D,
                              st["CC"], st["NSLICE"], dot_precision)
            if not st["last"]:
                rows_i = acc[:G]          # dense (G, 128) stream rows
                rows_q = acc[G:]

        G = dims[-1]["G"]
        if outtype == "f32":
            if channels:
                out_ref[0, 0, 0] = acc[:G]
                out_ref[1, 0, 0] = acc[G:]
            else:
                out_ref[0, 0] = acc[:G]
                out_ref[1, 0] = acc[G:]
            return

        def enc(v):
            w = jnp.trunc(v * jnp.float32(32767.0))
            w = jnp.clip(w, jnp.float32(-32768.0), jnp.float32(32767.0))
            if intype != "i16":
                w = jnp.where(jnp.isnan(v), jnp.float32(0.0), w)
            return w.astype(jnp.int32)

        word = (
            (enc(acc[:G]) & jnp.int32(0xFFFF))
            | jnp.left_shift(enc(acc[G:]), 16)
        )
        if channels:
            out_ref[0, 0] = word
        else:
            out_ref[0] = word

    return kernel


def pick_cascade_blocks_per_step(B: int, L: int, stage_shapes,
                                 final_dense: bool = False) -> int | None:
    """W dividing B whose geometry validates, sized for VMEM residency.

    The kernel keeps the mixed rows, per-stage full buffers, and
    accumulators live simultaneously, so A₀ = W·L/128 is capped at 1024
    rows (~1 MB/plane — measured: 4096 rows blows the 16 MB scoped-vmem
    limit on v5e); within that, prefer the largest valid W (bigger DMA
    transfers, fuller final-stage matmuls)."""
    cap = max(1, (1024 * 128) // L)
    w = min(B, cap)
    while w >= 1:
        if B % w == 0:
            try:
                cascade_dims(L, w, stage_shapes, final_dense=final_dense)
                return w
            except ValueError:
                pass
        w -= 1
    return None


def split_point(stages) -> int:
    """Longest lane-tiling integer-decimation prefix k of a cascade.

    THE one split-point rule (ADVICE r4: four hand-duplicated copies had to
    agree with the carry-seeding/taps construction or a drifted copy would
    silently corrupt cascade state).  ``stages[:k]`` runs as the fused
    Pallas front; a non-empty tail (odd final Q) runs as the XLA rational
    resampler at the 1/∏q front output rate.  Returns ``len(stages)`` when
    the whole cascade tiles (fully fused), else the count of leading stages
    with ``128 % Q == 0`` and integer decimation ``Q % P == 0``.
    """
    n = len(stages)
    if all(128 % st.Q == 0 for st in stages):
        return n
    k = 0
    while (k < n and 128 % stages[k].Q == 0
           and stages[k].Q % stages[k].P == 0):
        k += 1
    return k


def front_taps(stages, k: int):
    """Host: :func:`make_chain_taps` arrays for the fused front ``stages[:k]``.

    Inner stages (and ALL stages of a split front, where the final fused
    stage feeds dense stream rows to the XLA tail) are built with ``pp=P``
    so the D-merged matmul output IS the next consumer's dense row layout.
    Shared by every dispatch gate and state-seeding site — the gates and
    the carry construction MUST agree on this layout (ADVICE r4).
    """
    dense = k < len(stages)
    return tuple(
        make_chain_taps(st.bank, st.P, st.Q,
                        pp=(st.P if (i < k - 1 or dense) else None))
        for i, st in enumerate(stages[:k])
    )


def taps_shapes(stages, taps):
    """``(P, Q, T, n_sub, taps_rows, pp)`` per fused stage, from built taps.

    ``stages`` entries may be resampler stage objects or ``(P, Q, T)``
    tuples; extra entries beyond ``len(taps)`` are ignored (zip).
    """
    out = []
    for st, tp in zip(stages, taps):
        p_, q_, t_ = st if isinstance(st, tuple) else (st.P, st.Q, st.T)
        out.append((p_, q_, t_, tp.shape[0], tp.shape[1], tp.shape[2]))
    return tuple(out)


def cascade_replay_need(stages_front, in_rate: int) -> int:
    """Input-referred sample span a mesh shard must replay from its left
    neighbor to reconstruct every fused stage's carry bitwise: the
    zero-history corrupt head (2·(T_front−1) input samples) plus the
    deepest stage's carry cone (``carry_rows·128`` at the stage rate)."""
    t_front = 1 + sum(
        (st.T - 1) * (in_rate // st.in_rate) for st in stages_front)
    cone = max(
        carry_rows(st.T) * 128 * (in_rate // st.in_rate)
        for st in stages_front)
    return 2 * (t_front - 1) + cone


def widen_replay_span(need: int, L: int, b_loc: int, stage_shapes,
                      final_dense: bool = False) -> int:
    """Replay span in whole blocks: the carry cone's ⌈need/L⌉, widened until
    the cascade step geometry validates (large stage factors need A
    divisible by D, which can take more rows than the cone itself — e.g.
    ÷16 stages at the config-5 rate).  Extra REAL blocks only add correct
    history, so carries stay bitwise.  May return ``b_loc + 1`` (i.e. no
    valid span ≤ b_loc) — callers treat that as ineligible."""
    r_h = -(-need // L)
    while (r_h <= b_loc and pick_cascade_blocks_per_step(
            r_h, L, stage_shapes, final_dense=final_dense) is None):
        r_h += 1
    return r_h


@functools.partial(
    jax.jit, static_argnames=("stages", "interpret", "blocks_per_step",
                              "intype", "outtype", "final_dense",
                              "dot_precision")
)
def mix_cascade_pallas_stream(words, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo,
                              t, taps, carries, *, stages, interpret=False,
                              blocks_per_step=None, intype="i16",
                              outtype="i16", final_dense=False,
                              dot_precision="highest"):
    """Streaming fused mix + multi-stage resample cascade.

    ``stages``: static tuple of per-stage ``(P, Q, T)``; ``taps``: matching
    tuple of :func:`make_chain_taps` arrays (inner stages built with
    ``pp=P``); ``carries``: tuple of ``(2, carry_rows(T_s), 128)`` f32 per
    stage.  Input/output wire formats as in
    :func:`mix_resample_chain_pallas_stream`.  Returns
    ``(out, carries_out)`` with per-stage carries for chunk chaining.

    ``final_dense``: the split-cascade *front* — ALL stages use the dense
    inner-stage layout (build the last stage's taps with ``pp=P`` too) and
    the output is the final stage's dense stream rows, normally with
    ``outtype='f32'`` so an XLA final rational stage (Q ∤ 128) can consume
    the planes (see :func:`cascade_dims`).
    """
    if intype == "i16":
        B, L = words.shape
    else:
        _, B, L = words.shape
    stage_shapes = tuple(
        (P, Q, T, taps[i].shape[0], taps[i].shape[1], taps[i].shape[2])
        for i, (P, Q, T) in enumerate(stages)
    )
    W = blocks_per_step or pick_cascade_blocks_per_step(
        B, L, stage_shapes, final_dense=final_dense)
    if W is None or B % W:
        raise ValueError(f"no valid blocks_per_step for cascade (B={B})")
    dims = cascade_dims(L, W, stage_shapes, final_dense=final_dense)
    nstg = len(dims)
    SL = L // 128
    last = dims[-1]
    G, DCC = last["G"], last["D"] * last["CC"]

    if intype == "i16":
        data_spec = pl.BlockSpec((W, SL, 128), lambda b, *_: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        data = words.reshape(B, SL, 128)
    else:
        data_spec = pl.BlockSpec((2, W, SL, 128), lambda b, *_: (0, b, 0, 0),
                                 memory_space=pltpu.VMEM)
        data = words.reshape(2, B, SL, 128)
    if outtype == "i16":
        out_spec = pl.BlockSpec((1, G, DCC), lambda b, *_: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B // W, G, DCC), jnp.int32)
    else:
        out_spec = pl.BlockSpec((2, 1, G, DCC), lambda b, *_: (0, b, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((2, B // W, G, DCC), jnp.float32)

    taps_wide = []
    taps_specs = []
    for i, st in enumerate(dims):
        tm = jnp.transpose(jnp.asarray(taps[i]), (1, 0, 2)).reshape(
            st["R"] * 128, st["CC"])
        tw = wide_chain_taps(tm, st["D"])
        if dot_precision == "split3":
            tw = split3_taps(tw)
        taps_wide.append(tw)
        taps_specs.append(
            pl.BlockSpec(tw.shape, lambda b, *_: (0, 0),
                         memory_space=pltpu.VMEM))
    carry_specs = [
        pl.BlockSpec((2, st["HBR"], 128), lambda b, *_: (0, 0, 0),
                     memory_space=pltpu.VMEM)
        for st in dims
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(B // W,),
        in_specs=[data_spec] + taps_specs + carry_specs,
        out_specs=tuple([out_spec] + carry_specs),
        scratch_shapes=[pltpu.VMEM((2, st["HBR"], 128), jnp.float32)
                        for st in dims],
    )
    outs = pl.pallas_call(
        _make_cascade_kernel(L, W, dims, intype, outtype,
                             dot_precision=dot_precision),
        grid_spec=grid_spec,
        out_shape=tuple(
            [out_shape]
            + [jax.ShapeDtypeStruct((2, st["HBR"], 128), jnp.float32)
               for st in dims]
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        jnp.asarray(d_hi, jnp.uint32), jnp.asarray(d_lo, jnp.uint32),
        jnp.asarray(c1_hi, jnp.uint32), jnp.asarray(c1_lo, jnp.uint32),
        jnp.asarray(c2_hi, jnp.uint32), jnp.asarray(c2_lo, jnp.uint32),
        jnp.asarray(t, jnp.uint32), data, *taps_wide,
        *[jnp.asarray(c, jnp.float32) for c in carries],
    )
    out = outs[0]
    carries_out = tuple(outs[1:])
    A_f, n_sub, PP, P = last["A"], last["n_sub"], last["PP"], last["P"]
    M_step = A_f * n_sub * P                  # outputs per grid step
    if M_step % W:
        raise ValueError("cascade output does not tile the block structure")
    M = M_step // W                           # = L·P_tot/Q_tot per block
    if outtype == "i16":
        out = out.reshape(B // W, A_f, n_sub, PP)[..., :P].reshape(B, M)
    else:
        out = out.reshape(2, B // W, A_f, n_sub, PP)[..., :P].reshape(2, B, M)
    return out, carries_out


@functools.partial(
    jax.jit, static_argnames=("stages", "interpret", "blocks_per_step",
                              "intype", "outtype", "final_dense")
)
def mix_cascade_pallas_channels(words, fields, taps, carries, *, stages,
                                interpret=False, blocks_per_step=None,
                                intype="i16", outtype="i16",
                                final_dense=False):
    """Channel-batched fused cascade: ONE launch for all channels.

    ``words``   : shared wideband ``(B, L)`` i16 words, or ``(2, B, L)``
                  planar f32 planes (``intype='f32'``);
    ``fields``  : ``(7, C, B)`` uint32 plan stack;
    ``taps``    : per-stage tuple (:func:`make_chain_taps`, inner ``pp=P``);
    ``carries`` : per-stage tuple of ``(C, 2, HBR_s, 128)`` f32.
    → ``((C, B, M) words — or (2, C, B, M) planes —, per-stage carries)``.

    Grid ``(C, B/W)`` channel-major with per-stage carry scratches reseeded
    at each channel's first step — the cascade analog of
    :func:`mix_resample_chain_pallas_channels` (cross-kernel agreement with
    C streaming runs is ≤1 LSB per the mix_tone contraction contract,
    carries bitwise).  ``final_dense`` is the split-cascade front exactly
    as in :func:`mix_cascade_pallas_stream` (normally with
    ``outtype='f32'``).
    """
    if intype == "i16":
        B, L = words.shape
    else:
        _, B, L = words.shape
    C = carries[0].shape[0]
    if fields.shape != (7, C, B):
        raise ValueError(f"fields shape {fields.shape} != (7, {C}, {B})")
    stage_shapes = tuple(
        (P, Q, T, taps[i].shape[0], taps[i].shape[1], taps[i].shape[2])
        for i, (P, Q, T) in enumerate(stages)
    )
    W = blocks_per_step or pick_cascade_blocks_per_step(
        B, L, stage_shapes, final_dense=final_dense)
    if W is None or B % W:
        raise ValueError(f"no valid blocks_per_step for cascade (B={B})")
    dims = cascade_dims(L, W, stage_shapes, final_dense=final_dense)
    nstg = len(dims)
    SL = L // 128
    last = dims[-1]
    G, DCC = last["G"], last["D"] * last["CC"]

    if intype == "i16":
        data_spec = pl.BlockSpec((W, SL, 128), lambda c, b, *_: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        data = words.reshape(B, SL, 128)
    else:
        data_spec = pl.BlockSpec((2, W, SL, 128),
                                 lambda c, b, *_: (0, b, 0, 0),
                                 memory_space=pltpu.VMEM)
        data = words.reshape(2, B, SL, 128)
    if outtype == "i16":
        out_spec = pl.BlockSpec((1, 1, G, DCC), lambda c, b, *_: (c, b, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((C, B // W, G, DCC), jnp.int32)
    else:
        out_spec = pl.BlockSpec((2, 1, 1, G, DCC),
                                lambda c, b, *_: (0, c, b, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((2, C, B // W, G, DCC), jnp.float32)

    taps_wide = []
    taps_specs = []
    for i, st in enumerate(dims):
        tm = jnp.transpose(jnp.asarray(taps[i]), (1, 0, 2)).reshape(
            st["R"] * 128, st["CC"])
        tw = wide_chain_taps(tm, st["D"])
        taps_wide.append(tw)
        taps_specs.append(
            pl.BlockSpec(tw.shape, lambda c, b, *_: (0, 0),
                         memory_space=pltpu.VMEM))
    carry_specs = [
        pl.BlockSpec((1, 2, st["HBR"], 128), lambda c, b, *_: (c, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        for st in dims
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(C, B // W),
        in_specs=[data_spec] + taps_specs + carry_specs,
        out_specs=tuple([out_spec] + carry_specs),
        scratch_shapes=[pltpu.VMEM((2, st["HBR"], 128), jnp.float32)
                        for st in dims],
    )
    f = jnp.asarray(fields, jnp.uint32)
    outs = pl.pallas_call(
        _make_cascade_kernel(L, W, dims, intype, outtype, channels=True),
        grid_spec=grid_spec,
        out_shape=tuple(
            [out_shape]
            + [jax.ShapeDtypeStruct((C, 2, st["HBR"], 128), jnp.float32)
               for st in dims]
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        f[0], f[1], f[2], f[3], f[4], f[5], f[6],
        data, *taps_wide,
        *[jnp.asarray(c, jnp.float32) for c in carries],
    )
    out = outs[0]
    carries_out = tuple(outs[1:])
    A_f, n_sub, PP, P = last["A"], last["n_sub"], last["PP"], last["P"]
    M_step = A_f * n_sub * P
    M = M_step // W
    if outtype == "i16":
        out = out.reshape(C, B // W, A_f, n_sub, PP)[..., :P].reshape(C, B, M)
    else:
        out = out.reshape(2, C, B // W, A_f, n_sub, PP)[..., :P].reshape(
            2, C, B, M)
    return out, carries_out
