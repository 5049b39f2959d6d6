"""Sharded chunk processing: the full device step over a (channel, time) mesh.

The mixer shards transparently (phase is per-block constants — pure
elementwise math, XLA partitions it with zero communication).  The
resampler's gather needs T−1 input samples of *left-neighbor halo* at each
time-shard boundary, exchanged with ``jax.lax.ppermute`` over the 'time'
axis inside ``shard_map`` — the overlap-save analog of context-parallel
boundary exchange (SURVEY §5 "long-context / sequence parallelism"), riding
ICI on real hardware.

Alignment is arithmetic, not communicated: shard k owns inputs
[k·N_loc, (k+1)·N_loc) and computes exactly the outputs m whose newest input
⌊mQ/P⌋ falls in that range — the same Bresenham bookkeeping the streaming
resampler uses across chunks (ops/resample.py), reused across space.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # JAX ≥ 0.6 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from doppler_tpu.ops import codec, nco

__all__ = ["make_sharded_step", "shard_valid_out_counts"]


def shard_valid_out_counts(n_samples_per_shard: int, n_time: int, P_: int, Q_: int):
    """Host: valid output count per time shard (for slicing padded outputs)."""
    counts = []
    for k in range(n_time):
        s0 = k * n_samples_per_shard
        s1 = (k + 1) * n_samples_per_shard
        m_lo = -(-s0 * P_ // Q_)
        m_hi = -(-s1 * P_ // Q_)
        counts.append(m_hi - m_lo)
    return counts


def make_sharded_step(
    mesh,
    *,
    intype: str = "i16",
    outtype: str = "i16",
    resampler=None,
):
    """Build the jitted sharded chunk step.

    Returns ``step(data, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t[, bank])``
    where ``data`` is ``(C, B, L)`` i16 words (int32) or ``(C, B, L, 2)``
    f32 pairs, sharded ``('channel', 'time', None)``, and the plan arrays are
    ``(C, B)`` uint32 sharded ``('channel', 'time')``.

    Without a resampler the output matches the input layout (mix + recode).
    With one, the output is ``(C, n_time, M_max)`` per-shard-padded samples
    (use :func:`shard_valid_out_counts` to slice), exchanged halos included.
    """
    n_time = mesh.shape["time"]
    data_spec = P("channel", "time", None) if intype == "i16" else P("channel", "time", None, None)
    plan_spec = P("channel", "time")

    def _decode_mix(data, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t):
        if intype == "i16":
            i, q = codec.i16_words_to_iq(data)
        else:
            i, q = data[..., 0], data[..., 1]
        return nco.mix_blocks(i, q, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t)

    if resampler is None:

        @functools.partial(
            jax.jit,
            in_shardings=(NamedSharding(mesh, data_spec),) + (NamedSharding(mesh, plan_spec),) * 7,
            out_shardings=NamedSharding(mesh, data_spec),
        )
        def step(data, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t):
            i, q = _decode_mix(data, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t)
            if outtype == "i16":
                return codec.iq_to_i16_words(i, q)
            return jnp.stack([i, q], axis=-1)

        return step

    Pr, Qr, T = resampler.P, resampler.Q, resampler.T
    bank_rev = jnp.asarray(resampler.bank[:, ::-1].copy())

    def _resample_local(xi, xq):
        """Per-shard resample; xi/xq are (C_loc, N_loc) local blocks."""
        C_loc, N_loc = xi.shape
        if N_loc * Pr >= (1 << 30):
            raise ValueError("shard too large for 32-bit phase arithmetic")
        M_max = N_loc * Pr // Qr + 2

        # left-neighbor halo (shard 0 reads zeros — the stream's zero history)
        perm = [(k, k + 1) for k in range(n_time - 1)]
        halo_i = lax.ppermute(xi[:, N_loc - (T - 1):], "time", perm=perm)
        halo_q = lax.ppermute(xq[:, N_loc - (T - 1):], "time", perm=perm)
        xi_full = jnp.concatenate([halo_i, xi], axis=-1)
        xq_full = jnp.concatenate([halo_q, xq], axis=-1)

        tidx = lax.axis_index("time")
        s0 = tidx.astype(jnp.int32) * jnp.int32(N_loc)
        m0 = -((-s0 * jnp.int32(Pr)) // jnp.int32(Qr))
        u0 = m0 * jnp.int32(Qr)
        rem0 = u0 % jnp.int32(Pr)
        n_m0 = u0 // jnp.int32(Pr)

        j = jnp.arange(M_max, dtype=jnp.int32)
        u = j * jnp.int32(Qr) + rem0
        n_rel = u // jnp.int32(Pr)
        phase = u % jnp.int32(Pr)
        base = (n_m0 - s0) + n_rel            # window start, halo-adjusted +0
        idx = base[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        # xi_full[0] is absolute s0 − (T−1); window start abs = n − (T−1)
        taps = jnp.take(bank_rev, phase, axis=0)            # (M_max, T)
        wi = jnp.take(xi_full, idx, axis=1, mode="clip")     # (C_loc, M_max, T)
        wq = jnp.take(xq_full, idx, axis=1, mode="clip")
        yi = jnp.sum(wi * taps[None], axis=-1)
        yq = jnp.sum(wq * taps[None], axis=-1)
        return yi[:, None, :], yq[:, None, :]   # (C_loc, 1, M_max)

    out_spec = (
        P("channel", "time", None) if outtype == "i16"
        else P("channel", "time", None, None)
    )

    @functools.partial(
        jax.jit,
        in_shardings=(NamedSharding(mesh, data_spec),) + (NamedSharding(mesh, plan_spec),) * 7,
        out_shardings=NamedSharding(mesh, out_spec),
    )
    def step(data, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t):
        i, q = _decode_mix(data, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t)
        C = i.shape[0]
        i = i.reshape(C, -1)
        q = q.reshape(C, -1)
        yi, yq = shard_map(
            _resample_local,
            mesh=mesh,
            in_specs=(P("channel", "time"), P("channel", "time")),
            out_specs=(P("channel", "time", None), P("channel", "time", None)),
        )(i, q)
        if outtype == "i16":
            return codec.iq_to_i16_words(yi, yq)      # (C, n_time, M_max)
        return jnp.stack([yi, yq], axis=-1)           # (C, n_time, M_max, 2)

    return step
