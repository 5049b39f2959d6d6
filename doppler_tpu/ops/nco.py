"""NCO frequency shifter — the framework's hot kernel, as pure array math.

Reference semantics (``src/dsp.rs:117-134`` + ``src/complex.c:33-39``):
per sample ``out = in · exp(i · (-2π · f32((shift/fs)·samplenum)))`` where
``samplenum`` increments but **resets to 1** whenever the f32 product
``(shift/fs)·samplenum`` has zero fractional part.  Two distinct reset kinds
fall out of f32 arithmetic:

- *exact* resets — the ratio is a dyadic rational (e.g. −15000/256000 =
  −15/256) and the product really is an integer.  These are phase-preserving:
  the post-reset phase equals the absolute-index phase.
- *rounding* resets — a large product **rounds** to an integer (ulp(r·n) grows
  with n).  These introduce a small phase offset, and in track mode — where
  the shift changes per block — a rounding reset makes the emitted phase
  diverge wholesale from the absolute-index pure function, because the
  counter value carries across the rate change.

The kernel therefore computes phase as ``(j·D + C) mod 2^64`` in exact Q0.64
fixed point (``fixedpoint.py``) with **per-block** rate words ``D`` and phase
offset words ``C``, plus an optional two-segment split ``(C1, C2, t)`` so a
reset *inside* a block switches offsets at local index ``t``.  The host plans
``C`` (see ``ops.phase_plan``), folding the whole samplenum history into
per-block constants — the device stays stateless and the sample axis shards
with zero communication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from doppler_tpu.ops import fixedpoint as fxp
from doppler_tpu.ops.sincos import mix_tone, sincos_q24_neg

__all__ = ["nco_corrector_blocks", "mix", "mix_blocks"]


def _phase_q32_with_offset(j, d_hi, d_lo, c_hi, c_lo):
    """Bits 63..32 of ``(j·D + C) mod 2^64`` — all uint32 lane math, exact."""
    j = j.astype(jnp.uint32)
    jd_lo = j * d_lo
    jd_hi = fxp.umulhi32(j, d_lo) + j * d_hi
    lo = jd_lo + c_lo
    carry = (lo < jd_lo).astype(jnp.uint32)
    return jd_hi + c_hi + carry


def nco_corrector_blocks(d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t, offsets):
    """Corrector tone (re, im) for local offsets within per-block segments.

    ``offsets``: uint32 local sample indices, shape ``(..., L)``.
    Per-block words broadcast against it; segment 2 applies at ``j >= t``.
    """
    q_a = _phase_q32_with_offset(offsets, d_hi, d_lo, c1_hi, c1_lo)
    q_b = _phase_q32_with_offset(offsets, d_hi, d_lo, c2_hi, c2_lo)
    q32 = jnp.where(offsets < t.astype(jnp.uint32), q_a, q_b)
    # top 24 phase bits (f32 would keep no more) → deterministic polynomial
    # tone — identical bytes under any sharding/fusion (see ops.sincos)
    q24 = jax.lax.bitcast_convert_type(q32 >> 8, jnp.int32)
    return sincos_q24_neg(q24)


def mix(i, q, d_hi, d_lo, c_hi=0, c_lo=0):
    """Shift a planar IQ vector: phase(j) = (j·D + C)/2^64 cycles.

    For a stream segment starting at absolute sample n0 with no reset quirk,
    pass ``C = (n0·D) mod 2^64`` (see ``fixedpoint.mul64_mod``).
    """
    offsets = jnp.arange(i.shape[-1], dtype=jnp.uint32)
    d_hi = jnp.asarray(d_hi, jnp.uint32)
    d_lo = jnp.asarray(d_lo, jnp.uint32)
    c_hi = jnp.asarray(c_hi, jnp.uint32)
    c_lo = jnp.asarray(c_lo, jnp.uint32)
    L = jnp.uint32(i.shape[-1])
    c, s = nco_corrector_blocks(d_hi, d_lo, c_hi, c_lo, c_hi, c_lo,
                                jnp.asarray(L), offsets)
    return mix_tone(i, q, c, s)


def mix_blocks(i, q, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t):
    """Per-block planned mixer over ``(..., B, L)`` planar IQ.

    Plan arrays have shape ``i.shape[:-1]`` — e.g. ``(B,)`` for a single
    stream or ``(C, B)`` for a channel batch (uint32; ``t`` in [0, L] with L
    meaning "no segment switch").  Mirrors main.rs:177: each reference block
    is mixed with its own scheduled shift and its own samplenum continuation.
    """
    L = i.shape[-1]
    offsets = jnp.arange(L, dtype=jnp.uint32)

    def col(x):
        return jnp.asarray(x, jnp.uint32)[..., None]

    c, s = nco_corrector_blocks(
        col(d_hi), col(d_lo), col(c1_hi), col(c1_lo),
        col(c2_hi), col(c2_lo), col(t), offsets,
    )
    return mix_tone(i, q, c, s)
