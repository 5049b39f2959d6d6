"""Track-mode Doppler scheduling — exact mirror of the reference loop.

The reference's recorded-overpass path (``src/main.rs:156-183``) produces a
*whole-second staircase* Doppler curve with a deliberate one-iteration lag:

    loop:                                   # per 8192-byte block
        predict.update(start + dt)          # dt from the PREVIOUS iteration
        doppler = −(range_rate·1000/c)·f
        dt = seconds(trunc_f32(sample_count / fs))   # sample_count EXCLUDES
        [telemetry if start+dt-last_time >= 5 s]     # the current block
        shift(doppler + offset)
        sample_count += block_samples

Every quirk is preserved: the f32 division and i64 truncation in the dt
computation (``main.rs:166``), the evaluation-time lag (dt is assigned
*after* propagation, so block k is corrected with the time derived from
blocks < k−1), and the 5-seconds-of-stream telemetry cadence
(``main.rs:167-175``).

Because dt depends only on *sample counts* — and all blocks before the tail
are full — the whole schedule is a pure function of the block index.  The
scheduler exploits that: per chunk it runs the cheap integer recurrence for
every block, then evaluates SGP4 **once, vectorized, over the unique
staircase times** (typically a handful per chunk), keeping host cost
O(seconds), not O(blocks).

Realtime mode (no ``--time``, ``main.rs:186-205``) uses wall-clock time; we
evaluate once per chunk (the stream arrives at 1× speed, so a chunk *is* the
natural wall-clock quantum) and log at ≥1 s cadence.
"""

from __future__ import annotations

import time as _time
from typing import Sequence

import numpy as np

from doppler_tpu.orbit.observer import Predictor
from doppler_tpu.runtime.telemetry import get_logger

__all__ = ["TrackScheduler", "RealtimeTrackScheduler", "SPEED_OF_LIGHT_M_S"]

SPEED_OF_LIGHT_M_S = 299792458.0   # main.rs:48

log = get_logger("track")


class TrackScheduler:
    """Recorded-overpass scheduler (``--time`` given): deterministic staircase."""

    def __init__(
        self,
        predictor: Predictor,
        frequency_hz: float,
        offset_hz: float,
        samplerate: int,
        start_time_unix: float,
        telemetry: bool = True,
    ):
        self.predictor = predictor
        self.frequency_hz = float(frequency_hz)
        self.offset_hz = float(offset_hz)
        self.samplerate = int(samplerate)
        self.start_time = float(start_time_unix)
        self.telemetry = telemetry

        self.sample_count = 0
        self.dt = 0                      # whole seconds, i64-truncated
        self.last_time = self.start_time  # telemetry anchor (main.rs:153)

    def _trunc_dt(self) -> int:
        # time::Duration::seconds((sample_count as f32 / samplerate as f32) as i64)
        return int(np.float32(np.float32(self.sample_count) / np.float32(self.samplerate)))

    def shifts(self, block_counts: Sequence[int]) -> Sequence[float]:
        # Pass 1: integer recurrence — evaluation time per block + telemetry marks.
        eval_dts: list[int] = []
        # (display dt for the time line, eval dt whose sat values are printed —
        # the reference logs the predictor state from update(start + dt_old)
        # under the freshly-assigned dt's timestamp, main.rs:162-175)
        telemetry_at: list[tuple[int, int]] = []
        for count in block_counts:
            dt_old = self.dt
            eval_dts.append(dt_old)
            new_dt = self._trunc_dt()
            self.dt = new_dt
            if self.start_time + new_dt - self.last_time >= 5.0:
                self.last_time = self.start_time + new_dt
                telemetry_at.append((new_dt, dt_old))
            self.sample_count += count

        # Pass 2: one vectorized SGP4 evaluation over the unique staircase times.
        uniq = sorted(set(eval_dts))
        times = self.start_time + np.asarray(uniq, dtype=np.float64)
        doppler, obs = self.predictor.doppler_hz(times, self.frequency_hz)
        by_dt = {dt: i for i, dt in enumerate(uniq)}

        if self.telemetry:
            for show_dt, dt in telemetry_at:
                i = by_dt[dt]
                log.info("time                : %s",
                         _time.strftime("%Y-%m-%dT%H:%M:%S+00:00",
                                        _time.gmtime(self.start_time + show_dt)))
                log.info("az                  : %.2f°", float(obs.az_deg[i]))
                log.info("el                  : %.2f°", float(obs.el_deg[i]))
                log.info("range               : %.0f km", float(obs.range_km[i]))
                log.info("range rate          : %.3f km/sec",
                         float(obs.range_rate_km_sec[i]))
                log.info("doppler@%.3f MHz : %.2f Hz", self.frequency_hz / 1e6,
                         float(doppler[i]))

        # shift handed to the mixer: f32(doppler) + f32(offset) (main.rs:177)
        return [
            float(np.float32(doppler[by_dt[dt]]) + np.float32(self.offset_hz))
            for dt in eval_dts
        ]


class RealtimeTrackScheduler:
    """Live-SDR scheduler (no ``--time``): wall clock, per-chunk update."""

    def __init__(
        self,
        predictor: Predictor,
        frequency_hz: float,
        offset_hz: float,
        samplerate: int,
        telemetry: bool = True,
        clock=_time.time,
    ):
        self.predictor = predictor
        self.frequency_hz = float(frequency_hz)
        self.offset_hz = float(offset_hz)
        self.samplerate = int(samplerate)
        self.telemetry = telemetry
        self.clock = clock
        self.last_time = clock()

    def shifts(self, block_counts: Sequence[int]) -> Sequence[float]:
        now = self.clock()
        doppler, obs = self.predictor.doppler_hz(now, self.frequency_hz)
        if self.telemetry and now - self.last_time >= 1.0:
            self.last_time = now
            log.info("time                : %s",
                     _time.strftime("%Y-%m-%dT%H:%M:%S+00:00", _time.gmtime(now)))
            log.info("az                  : %.2f°", float(obs.az_deg))
            log.info("el                  : %.2f°", float(obs.el_deg))
            log.info("range               : %.0f km", float(obs.range_km))
            log.info("range rate          : %.3f km/sec", float(obs.range_rate_km_sec))
            log.info("doppler@%.3f MHz : %.2f Hz", self.frequency_hz / 1e6,
                     float(doppler))
        shift = float(np.float32(doppler) + np.float32(self.offset_hz))
        return [shift] * len(block_counts)
