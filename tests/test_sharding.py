"""Sharding-equivalence tests (SURVEY §4c) on the 8-device fake-CPU mesh:
an N-way time/channel-sharded run must equal the single-device run bitwise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from doppler_tpu.ops import codec, nco
from doppler_tpu.ops.phase_plan import NCOState, plan_blocks
from doppler_tpu.ops.resample import RationalResampler, resample_oracle
from doppler_tpu.parallel import (
    iq_sharding,
    make_mesh,
    make_sharded_step,
    plan_sharding,
    shard_valid_out_counts,
)

RNG = np.random.default_rng(0x5A)


def make_channel_batch(C, B, L, fs):
    """C channels of B blocks with per-channel doppler-ish schedules."""
    words = RNG.integers(-(1 << 31), 1 << 31, size=(C, B, L), dtype=np.int64).astype(
        np.int32
    )
    plans = []
    for c in range(C):
        shifts = [9000.0 + 130.0 * c - 0.5 * k for k in range(B)]
        plans.append(plan_blocks(shifts, [L] * B, fs, NCOState(), L))
    stack = lambda f: np.stack([getattr(p, f) for p in plans])  # noqa: E731
    return words, tuple(
        stack(f) for f in ("d_hi", "d_lo", "c1_hi", "c1_lo", "c2_hi", "c2_lo", "t")
    )


@pytest.fixture(scope="module")
def mesh42():
    assert len(jax.devices()) >= 8, "conftest must fake 8 CPU devices"
    return make_mesh(time=2, channel=4)


def test_mix_sharding_equivalence(mesh42):
    C, B, L, fs = 4, 8, 2048, 256000
    words, plan = make_channel_batch(C, B, L, fs)

    # single device reference
    i, q = codec.i16_words_to_iq(jnp.asarray(words))
    i, q = nco.mix_blocks(i, q, *plan)
    want = np.asarray(codec.iq_to_i16_words(i, q))

    step = make_sharded_step(mesh42, intype="i16", outtype="i16")
    data = jax.device_put(jnp.asarray(words), iq_sharding(mesh42))
    plan_dev = [jax.device_put(jnp.asarray(a), plan_sharding(mesh42)) for a in plan]
    got = np.asarray(step(data, *plan_dev))

    # XLA may lower sin/cos differently under partitioning (different fusion
    # widths), so allow 1-ulp flips at i16 truncation boundaries — but any
    # real sharding/alignment bug would mismatch wholesale.
    gi, gq = codec.i16_words_to_iq(jnp.asarray(got))
    wi, wq = codec.i16_words_to_iq(jnp.asarray(want))
    diff = np.maximum(
        np.abs(np.asarray(gi) - np.asarray(wi)),
        np.abs(np.asarray(gq) - np.asarray(wq)),
    ) * 32768.0
    assert diff.max() <= 1.0 + 1e-3, diff.max()
    assert np.mean(diff == 0) > 0.999


def test_mix_and_resample_sharding_equivalence(mesh42):
    C, B, L, fs = 4, 8, 2048, 1024000
    words, plan = make_channel_batch(C, B, L, fs)
    rs = RationalResampler(1024000, 48000)
    n_time = 2
    N_loc = B * L // n_time

    step = make_sharded_step(mesh42, intype="i16", outtype="f32", resampler=rs)
    data = jax.device_put(jnp.asarray(words), iq_sharding(mesh42))
    plan_dev = [jax.device_put(jnp.asarray(a), plan_sharding(mesh42)) for a in plan]
    out = np.asarray(step(data, *plan_dev))       # (C, n_time, M_max, 2)

    counts = shard_valid_out_counts(N_loc, n_time, rs.P, rs.Q)
    got = np.concatenate(
        [out[:, k, : counts[k], :] for k in range(n_time)], axis=1
    )

    # reference 1: single-device mix, then the NumPy resample oracle
    i, q = codec.i16_words_to_iq(jnp.asarray(words))
    i, q = nco.mix_blocks(i, q, *plan)
    mixed = (np.asarray(i) + 1j * np.asarray(q)).reshape(C, -1)
    for c in range(C):
        want = resample_oracle(mixed[c], rs.P, rs.Q, rs.bank)
        assert got.shape[1] == len(want)
        err = np.abs((got[c, :, 0] + 1j * got[c, :, 1]) - want).max()
        assert err < 2e-5, (c, err)

    # reference 2 (VERDICT r4 next #5): BITWISE vs the single-device
    # window_dot formulation — the sharded step delegates to the same
    # fixed-order reduction inside the same barrier-island program
    # structure, so sharding must not change a single ulp.
    from doppler_tpu.ops.resample import window_dot

    @jax.jit
    def mix_island(data, *plan):
        i, q = codec.i16_words_to_iq(data)
        i, q = nco.mix_blocks(i, q, *plan)
        return jax.lax.optimization_barrier(jnp.stack([i, q], axis=-1))

    @jax.jit
    def resample_island(mi, mq):
        hist = jnp.zeros((C, rs.T - 1), jnp.float32)
        xi_full = jnp.concatenate([hist, mi], axis=-1)
        xq_full = jnp.concatenate([hist, mq], axis=-1)
        return window_dot(
            xi_full, xq_full, jnp.asarray(rs.bank[:, ::-1].copy()),
            jnp.int32(0), jnp.int32(0), P=rs.P, Q=rs.Q, T=rs.T,
            M=sum(counts))

    pairs = mix_island(jnp.asarray(words), *(jnp.asarray(a) for a in plan))
    planar = pairs.reshape(C, -1, 2)
    wi, wq = resample_island(planar[..., 0], planar[..., 1])
    np.testing.assert_array_equal(got[..., 0], np.asarray(wi))
    np.testing.assert_array_equal(got[..., 1], np.asarray(wq))


def test_sharded_resample_valid_counts():
    # Bresenham bookkeeping: shard output counts must sum to the global count
    counts = shard_valid_out_counts(8192, 4, 3, 64)
    assert sum(counts) == -(-4 * 8192 * 3 // 64)
    assert max(counts) - min(counts) <= 1


def test_mesh_requires_enough_devices():
    with pytest.raises(ValueError, match="need 16 devices"):
        make_mesh(time=4, channel=4)
