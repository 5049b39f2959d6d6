"""Mesh-width replay-overhead regression (VERDICT r4 next #4 / missing #2).

This rig has ONE real chip, so absolute multi-chip scaling cannot be
measured; what CAN be pinned is the only per-width cost the sharded steps
add — the left-neighbor halo-block REPLAY.  Each time shard of width
``n_time`` processes its ``b_loc = B/n_time`` blocks plus ``r_h`` replayed
blocks, so the kernel-work scaling efficiency is exactly

    eff(n_time) = b_loc / (b_loc + r_h)

These tests pin ``r_h`` at the product geometries (chain: 1 block;
cascades: the widened span) and the resulting efficiency floor — the
model behind BASELINE's ≥90%-linear row, checkable without a pod.
(`bench.py --mode chain-mesh --mesh-scan` measures the same wall-clock
curve on real hardware; on the 8-fake-device CPU mesh the wall numbers
conflate shared-core contention with replay cost, so the geometry is the
honest relative record — see docs/architecture.md.)
"""

import numpy as np

from doppler_tpu.ops.multistage import MultiStageResampler
from doppler_tpu.ops.pallas.chain import (
    carry_rows,
    cascade_replay_need,
    front_taps,
    split_point,
    taps_shapes,
    widen_replay_span,
)
from doppler_tpu.ops.resample import RationalResampler


def test_chain_replay_is_one_block():
    """Single-stage chain (config 3 shape): the T−1 carry fits in one
    8192-sample block, so every shard replays exactly 1 neighbor block."""
    rs = RationalResampler(1_024_000, 48000)
    L = 8192
    assert carry_rows(rs.T) * 128 <= L
    # efficiency at the bench shape (B=4096 blocks): ≥99% out to width 64
    B = 4096
    for n_time in (2, 4, 8, 16, 32, 64):
        b_loc = B // n_time
        eff = b_loc / (b_loc + 1)
        assert eff >= 0.98, (n_time, eff)


def test_cascade_replay_span_config3():
    """Fused cascade at 1.024 Msps → 48 ksps: the replay span stays small
    relative to any practical shard width (≈1/b_loc overhead per shard)."""
    ms = MultiStageResampler(1_024_000, 48000)
    k = split_point(ms.stages)
    assert k == len(ms.stages)  # fully fused at this rate
    shapes = taps_shapes(ms.stages, front_taps(ms.stages, k))
    need = cascade_replay_need(ms.stages[:k], 1_024_000)
    L, B = 8192, 4096
    for n_time in (2, 4, 8, 16, 32, 64):
        b_loc = B // n_time
        r_h = widen_replay_span(need, L, b_loc, shapes, final_dense=False)
        assert r_h <= b_loc, (n_time, r_h)
        eff = b_loc / (b_loc + r_h)
        # replay cost ≈ r_h/b_loc: ≥90% (the BASELINE north-star floor)
        # out to width 64, ≥97% at the pod-slice widths ≤ 16
        assert eff >= 0.90, (n_time, r_h, eff)
        if n_time <= 16:
            assert eff >= 0.97, (n_time, r_h, eff)


def test_cascade_replay_span_config5_literal_rate():
    """Split cascade at the literal 100 Msps → 48 ksps (÷16·÷16 fused
    front): the round-4 widened replay span must stay a small fraction of
    the shard at config-5's chunk geometry (B=2048, n_time ≤ 8)."""
    ms = MultiStageResampler(100_000_000, 48000)
    k = split_point(ms.stages)
    assert 0 < k < len(ms.stages)  # split: odd-Q tail stays on XLA
    shapes = taps_shapes(ms.stages, front_taps(ms.stages, k))
    need = cascade_replay_need(ms.stages[:k], 100_000_000)
    L, B = 8192, 2048
    for n_time in (2, 4, 8):
        b_loc = B // n_time
        r_h = widen_replay_span(need, L, b_loc, shapes, final_dense=True)
        assert r_h <= b_loc, (n_time, r_h)
        eff = b_loc / (b_loc + r_h)
        assert eff >= 0.90, (n_time, r_h, eff)


def test_replay_need_matches_seek_history():
    """The mesh replay bound and the seek/distribute history bound derive
    from the same carry-cone arithmetic — they must agree on the input
    span (the dispatch gates and state seeding share split_point; this
    pins the remaining pair of formulas against drift)."""
    ms = MultiStageResampler(100_000_000, 48000)
    k = split_point(ms.stages)
    need = cascade_replay_need(ms.stages[:k], 100_000_000)
    t_front = 1 + sum(
        (st.T - 1) * (100_000_000 // st.in_rate) for st in ms.stages[:k])
    assert need >= t_front - 1  # replay covers at least the FIR history
    # and the span in blocks covers the corrupt head + deepest carry cone
    assert need == 2 * (t_front - 1) + max(
        carry_rows(st.T) * 128 * (100_000_000 // st.in_rate)
        for st in ms.stages[:k])
