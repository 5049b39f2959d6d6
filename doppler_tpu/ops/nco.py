"""NCO frequency shifter — the framework's hot kernel, as pure array math.

Reference semantics (``src/dsp.rs:117-134`` + ``src/complex.c:33-39``):
per sample ``out[n] = in[n] · exp(i · (-2π · frac(r·n)))`` with
``r = shift_hz/samplerate`` and ``n`` the absolute sample index — SURVEY §3.4
verifies the reference's samplenum-reset makes the phase a *pure function of
n*.  Pure-function phase means:

- no sequential state → the sample axis is embarrassingly parallel;
- sharding the time axis over a mesh needs zero mixer communication;
- resume-from-checkpoint is just "seek to sample offset n".

Phase is computed with exact Q0.64 modular fixed-point (``fixedpoint.py``),
replacing both the reference's per-sample ``cexpf`` C FFI call and its f32
phase drift with on-chip VPU integer lanes + one sin/cos pair per sample.

Track mode varies ``shift_hz`` per input block (main.rs:161-205): the mixer
takes *per-block* Q0.64 increments and applies them to a ``(blocks, block)``
reshaped view — still stateless across blocks, since each block's phase is
``frac(r_k · n)`` with absolute ``n`` (the reference re-derives phase from the
same product when the shift changes; phase is intentionally not continuously
integrated — see SURVEY §3.4 "numerical contract").
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from doppler_tpu.ops import fixedpoint as fxp

__all__ = ["nco_corrector", "mix", "mix_blocks", "make_block_increments"]

_TWO_PI = np.float32(2.0 * np.pi)


def _sample_index_pair(n0_hi, n0_lo, offsets):
    """Absolute sample index (n0 + offsets) as carry-propagated uint32 pair."""
    off = offsets.astype(jnp.uint32)
    lo = jnp.asarray(n0_lo, jnp.uint32) + off
    carry = (lo < off).astype(jnp.uint32)
    hi = jnp.asarray(n0_hi, jnp.uint32) + carry
    return hi, lo


def nco_corrector(d_hi, d_lo, n0_hi, n0_lo, offsets):
    """Corrector tone e^{-2πi·frac(r·n)} for n = n0 + offsets, planar (re, im).

    All inputs may broadcast: per-block scalars against per-sample offsets.
    """
    n_hi, n_lo = _sample_index_pair(n0_hi, n0_lo, offsets)
    q32 = fxp.phase_q32(n_hi, n_lo, d_hi, d_lo)
    cycles = fxp.phase_cycles_f32(q32)
    theta = -_TWO_PI * cycles
    return jnp.cos(theta), jnp.sin(theta)


def mix(i, q, d_hi, d_lo, n0_hi=0, n0_lo=0):
    """Shift a planar IQ vector by the Q0.64 rate ``D`` starting at index n0.

    Complex multiply (i + jq)·(c + js) done in planar form; XLA fuses the
    whole decode→mix→encode chain into one HBM-bandwidth-bound loop.
    """
    offsets = jnp.arange(i.shape[-1], dtype=jnp.uint32)
    c, s = nco_corrector(d_hi, d_lo, n0_hi, n0_lo, offsets)
    return i * c - q * s, i * s + q * c


def mix_blocks(i, q, d_hi, d_lo, n0_hi=0, n0_lo=0):
    """Track-mode mixer: per-block rates over a ``(..., blocks, block_len)`` view.

    ``i, q``  : float32 ``(..., B, L)`` planar IQ.
    ``d_hi/lo``: uint32 ``(B,)`` (or broadcastable) per-block Q0.64 increments.
    ``n0``    : absolute sample index of element [..., 0, 0].

    The absolute index of element [b, l] is n0 + b·L + l; phase uses that
    block's own rate, mirroring main.rs:177 (each 8192-byte block mixed with
    the Doppler shift computed for it).
    """
    B, L = i.shape[-2], i.shape[-1]
    block_off = (jnp.arange(B, dtype=jnp.uint32) * jnp.uint32(L))[:, None]
    offsets = block_off + jnp.arange(L, dtype=jnp.uint32)[None, :]
    d_hi = jnp.asarray(d_hi, jnp.uint32).reshape(-1, 1)
    d_lo = jnp.asarray(d_lo, jnp.uint32).reshape(-1, 1)
    c, s = nco_corrector(d_hi, d_lo, n0_hi, n0_lo, offsets)
    return i * c - q * s, i * s + q * c


def make_block_increments(shifts_hz, samplerate, *, quantize_f32=True):
    """Host: per-block shift schedule (Hz) → (d_hi, d_lo) uint32 arrays."""
    d_hi = np.empty(len(shifts_hz), dtype=np.uint32)
    d_lo = np.empty(len(shifts_hz), dtype=np.uint32)
    for k, s in enumerate(shifts_hz):
        d = fxp.rate_to_q64(s, samplerate, quantize_f32=quantize_f32)
        d_hi[k], d_lo[k] = fxp.split_u64(d)
    return d_hi, d_lo
