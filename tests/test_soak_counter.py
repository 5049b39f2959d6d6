"""Long-stream soak: ≥2³² samples of samplenum evolution vs the native
reference loop (VERDICT r4 next #8).

The SNR contract on hour-scale captures rides on the host planner
reproducing the reference's threaded ``samplenum`` counter — including
f32 rounding-resets (SURVEY erratum) and the u32 wrap — EXACTLY, because
every reset re-anchors the emitted phase.  The existing fuzz pins the
vectorized planner against the sequential planner; this soak pins BOTH
against the actual per-sample C++ reference loop
(``native/src/doppler_native.cpp dt_reference_counter_blocks``, the
dsp.rs:117-134 counter update) across 2³²⁺ samples of a real TLE track
schedule with per-second staircase shift changes.
"""

import numpy as np
import pytest

from doppler_tpu.ops.phase_plan import NCOState, plan_blocks
from doppler_tpu.orbit import Observer, Predictor, Tle, TrackScheduler
from doppler_tpu.orbit.tle import _checksum
from doppler_tpu.runtime import native


def fix(line):
    line = line.ljust(68)[:68]
    return line + str(_checksum(line))


L1 = fix("1 88888U          80275.98708465  .00073094  13844-3  66816-4 0    8")
L2 = fix("2 88888  72.8435 115.9689 0086731  52.6988 110.5714 16.05824518  105")
EPOCH_UNIX = (2444514.48708465 - 2440587.5) * 86400.0


@pytest.mark.skipif(not native.available(), reason="needs the native library")
def test_counter_soak_2pow32_track_schedule():
    fs, L = 1_024_000, 8192
    chunk_blocks = 4096                      # 33.55 M samples per chunk
    n_chunks = 129                           # ≈ 4.33e9 > 2^32 samples
    total = n_chunks * chunk_blocks * L
    assert total > (1 << 32)

    pred = Predictor(Tle.from_lines("T", L1, L2),
                     Observer(58.26541, 26.46667, 76.0))
    sched = TrackScheduler(pred, 437505000.0, 5000.0, fs, EPOCH_UNIX + 60.0,
                           telemetry=False)

    state = NCOState()
    sn_native = 0                            # reference starts at 0 (main.rs:60)
    counts = [L] * chunk_blocks
    counts_np = np.full(chunk_blocks, L, np.uint32)
    sampled = []                             # (chunk, plan, sn at block 0)
    for ci in range(n_chunks):
        shifts = np.asarray(sched.shifts(counts), dtype=np.float64)
        # the schedule really is a staircase with shift changes
        if ci == 0:
            assert len(np.unique(shifts)) > 8
        plan = plan_blocks(list(shifts), counts, fs, state, L)
        starts, sn_native = native.reference_counter_blocks(
            shifts, counts_np, sn_native, fs)
        # the planner's counter must equal the per-sample C++ loop's at
        # every chunk boundary — ~33.5 M samples and dozens of staircase
        # steps apart, 129 times across the 2^32-sample stream
        assert state.samplenum == sn_native, (ci, state.samplenum, sn_native)
        if ci in (0, 32, 64, 96, 128):
            sampled.append((ci, plan, int(starts[0]), float(shifts[0])))

    # spot-check emitted samples deep into the stream: the device mixer on
    # the plan constants vs the native per-sample reference mix.  The
    # reference computes its phase as an f32 PRODUCT ratio·f32(sn), whose
    # rounding error grows with the counter value — the framework computes
    # the exact Q0.64 product by design (SURVEY §3.4), so the comparison
    # is SNR-level, not bitwise; resets keep sn small enough that the
    # reference's own noise stays far above 55 dB here.
    import jax.numpy as jnp

    from doppler_tpu.ops import nco
    from doppler_tpu import oracle

    rng = np.random.default_rng(0x5AA5)
    for ci, plan, sn0, shift0 in sampled:
        i = rng.normal(scale=0.3, size=L).astype(np.float32)
        q = rng.normal(scale=0.3, size=L).astype(np.float32)
        ri, rq, _ = native.reference_mix(i, q, sn0, shift0, fs)
        gi, gq = nco.mix_blocks(
            jnp.asarray(i[None]), jnp.asarray(q[None]),
            plan.d_hi[:1], plan.d_lo[:1], plan.c1_hi[:1], plan.c1_lo[:1],
            plan.c2_hi[:1], plan.c2_lo[:1], plan.t[:1])
        want = ri + 1j * rq
        got = np.asarray(gi)[0] + 1j * np.asarray(gq)[0]
        snr = oracle.snr_db(want, got)
        assert snr > 55.0, (ci, sn0, snr)
