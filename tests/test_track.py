"""Track-mode tests: staircase schedule semantics vs a scalar mirror of the
reference loop, chunk invariance, and CLI end-to-end."""

import io
import subprocess
import sys

import numpy as np
import pytest

from doppler_tpu import oracle
from doppler_tpu.orbit import Observer, Predictor, Tle, TrackScheduler
from doppler_tpu.orbit.tle import _checksum
from doppler_tpu.runtime.pipeline import Pipeline

FS = 256000
FREQ = 437505000.0
OFFSET = 5000.0


def fix(line: str) -> str:
    line = line.ljust(68)[:68]
    return line + str(_checksum(line))


L1 = fix("1 88888U          80275.98708465  .00073094  13844-3  66816-4 0    8")
L2 = fix("2 88888  72.8435 115.9689 0086731  52.6988 110.5714 16.05824518  105")
START_UNIX = (2444514.48708465 - 2440587.5) * 86400.0 + 3600.0  # epoch + 1 h


@pytest.fixture(scope="module")
def predictor():
    return Predictor(Tle.from_lines("TEST SAT", L1, L2),
                     Observer(58.26541, 26.46667, 76.0))


def reference_loop_shifts(predictor, block_counts):
    """Literal scalar mirror of main.rs:156-183 (the golden model)."""
    sample_count = 0
    dt = 0
    out = []
    for count in block_counts:
        doppler, _ = predictor.doppler_hz(START_UNIX + dt, FREQ)
        out.append(float(np.float32(doppler) + np.float32(OFFSET)))
        dt = int(np.float32(np.float32(sample_count) / np.float32(FS)))
        sample_count += count
    return out


def make_scheduler(predictor):
    return TrackScheduler(predictor, FREQ, OFFSET, FS, START_UNIX, telemetry=False)


def test_schedule_matches_reference_loop(predictor):
    counts = [2048] * 400  # > 3 s of stream: several staircase steps
    want = reference_loop_shifts(predictor, counts)
    got = list(make_scheduler(predictor).shifts(counts))
    assert got == want


def test_schedule_staircase_shape(predictor):
    counts = [2048] * 500   # 4 s of stream
    got = np.array(make_scheduler(predictor).shifts(counts))
    # whole-second staircase: few unique values, each run ≥ 1 s of blocks
    uniq = np.unique(got)
    assert 3 <= uniq.size <= 6
    # doppler magnitude sane for LEO at UHF (< 12 kHz) plus 5 kHz offset
    assert np.all(np.abs(got - OFFSET) < 12000.0)


def test_schedule_lag_quirk(predictor):
    """The dt used for block k lags one assignment behind: with 2048-sample
    blocks at 256 ksps the first staircase step lands at block 126, not 125
    (125 blocks = 1.0 s; the reference evaluates dt before adding block k)."""
    counts = [2048] * 130
    got = make_scheduler(predictor).shifts(counts)
    first_change = next(i for i in range(1, len(got)) if got[i] != got[0])
    assert first_change == 126


def test_schedule_chunk_split_invariance(predictor):
    counts = [2048] * 300 + [1000]
    whole = make_scheduler(predictor).shifts(counts)
    s = make_scheduler(predictor)
    split = list(s.shifts(counts[:37])) + list(s.shifts(counts[37:200])) \
        + list(s.shifts(counts[200:]))
    assert split == list(whole)


def test_track_pipeline_end_to_end(predictor):
    """Full track run vs a from-scratch oracle: reference block framing,
    staircase schedule, sequential f32 NCO, i16 output."""
    n = 2048 * 260  # just over 2 s of stream
    rng = np.random.default_rng(7)
    x = (0.25 * (rng.normal(size=n) + 1j * rng.normal(size=n))).astype(np.complex64)
    buf = oracle.encode_i16_bytes(x)
    xq = oracle.decode_i16_bytes(buf)  # what the pipeline actually sees

    pipe = Pipeline(FS, "i16", "i16", make_scheduler(predictor), chunk_blocks=64)
    out = io.BytesIO()
    pipe.run(io.BytesIO(buf), out)
    got = oracle.decode_i16_bytes(out.getvalue())

    # golden model: per-block sequential mix with the reference-loop schedule
    shifts = reference_loop_shifts(predictor, [2048] * 260)
    want = np.empty_like(xq)
    samplenum = 0
    for k, s in enumerate(shifts):
        blk = xq[k * 2048:(k + 1) * 2048]
        mixed, samplenum = oracle.shift_frequency_oracle(blk, samplenum, s, FS)
        want[k * 2048:(k + 1) * 2048] = mixed
    want = oracle.decode_i16_bytes(oracle.encode_i16_bytes(want))

    snr = oracle.snr_db(want, got)
    assert snr > 60.0, snr


def test_cli_track_subprocess(tmp_path, predictor):
    tlefile = tmp_path / "cubesat.txt"
    tlefile.write_text(f"TEST SAT\n{L1}\n{L2}\n")
    n = 2048 * 8
    rng = np.random.default_rng(8)
    raw = rng.integers(-2000, 2000, size=2 * n, dtype=np.int16).astype("<i2").tobytes()

    import time as _t
    start_str = _t.strftime("%Y-%m-%dT%H:%M:%S", _t.gmtime(START_UNIX))
    proc = subprocess.run(
        [sys.executable, "-m", "doppler_tpu", "track",
         "-s", str(FS), "-i", "i16",
         "--tlefile", str(tlefile), "--tlename", "TEST SAT",
         "--location", "lat=58.26541,lon=26.46667,alt=76",
         "--frequency", str(int(FREQ)), "--offset", str(int(OFFSET)),
         "--time", start_str, "--platform", "cpu", "--chunk-blocks", "8"],
        input=raw, stdout=subprocess.PIPE, stderr=subprocess.PIPE, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr.decode()
    assert len(proc.stdout) == len(raw)
    assert b"tracking mode" in proc.stderr

    # must equal the in-process pipeline run (same scheduler semantics),
    # up to the whole-second truncation of START_UNIX used by --time
    sched = TrackScheduler(predictor, FREQ, OFFSET, FS, float(int(START_UNIX)),
                           telemetry=False)
    pipe = Pipeline(FS, "i16", "i16", sched, chunk_blocks=8)
    out = io.BytesIO()
    pipe.run(io.BytesIO(raw), out)
    assert proc.stdout == out.getvalue()


def test_cli_track_realtime_no_time(tmp_path):
    """Live mode (no --time): wall-clock propagation, stream still corrected."""
    from doppler_tpu.orbit.tle import _checksum

    def fx(line):
        line = line.ljust(68)[:68]
        return line + str(_checksum(line))

    # zero-drag TLE so propagating decades past epoch stays valid
    l1 = fx("1 88888U          80275.98708465  .00000000  00000-0  00000-0 0    8")
    l2 = fx("2 88888  72.8435 115.9689 0086731  52.6988 110.5714 16.05824518  105")
    tlefile = tmp_path / "t.txt"
    tlefile.write_text(f"TEST SAT\n{l1}\n{l2}\n")

    n = 2048 * 4
    rng = np.random.default_rng(12)
    raw = rng.integers(-2000, 2000, size=2 * n, dtype=np.int16).astype("<i2").tobytes()
    proc = subprocess.run(
        [sys.executable, "-m", "doppler_tpu", "track",
         "-s", str(FS), "-i", "i16",
         "--tlefile", str(tlefile), "--tlename", "TEST SAT",
         "--location", "lat=58.26541,lon=26.46667,alt=76",
         "--frequency", str(int(FREQ)), "--platform", "cpu",
         "--chunk-blocks", "4"],
        input=raw, stdout=subprocess.PIPE, stderr=subprocess.PIPE, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr.decode()
    assert len(proc.stdout) == len(raw)
    # output actually shifted (non-zero doppler at UHF for a moving LEO)
    assert proc.stdout != raw


def test_scheduler_native_equals_python(predictor):
    """TrackScheduler shifts must be identical whichever SGP4 backend the
    Predictor picked (C++ auto vs forced-Python)."""
    from doppler_tpu.orbit import Observer, Predictor as Pred, Tle

    pred_py = Pred(Tle.from_lines("TEST SAT", L1, L2),
                   Observer(58.26541, 26.46667, 76.0), use_native=False)
    counts = [2048] * 300
    a = TrackScheduler(predictor, FREQ, OFFSET, FS, START_UNIX,
                       telemetry=False).shifts(counts)
    b = TrackScheduler(pred_py, FREQ, OFFSET, FS, START_UNIX,
                       telemetry=False).shifts(counts)
    # identical after the reference's f32 rounding of the doppler value
    assert list(a) == list(b)


def test_telemetry_values_use_lagged_eval_time(predictor, caplog):
    """main.rs:162-175: the telemetry line prints the predictor state from
    update(start + dt_old) under the freshly-assigned dt's timestamp."""
    import logging
    import re

    sched = TrackScheduler(predictor, FREQ, OFFSET, FS, START_UNIX,
                           telemetry=True)
    with caplog.at_level(logging.INFO, logger="doppler_tpu.track"):
        sched.shifts([2048] * 700)   # > 5 s of stream → one telemetry group
    msgs = [r.getMessage() for r in caplog.records]
    dop_lines = [m for m in msgs if "doppler@" in m]
    assert dop_lines
    logged = float(re.search(r": (-?[\d.]+) Hz", dop_lines[0]).group(1))
    # the firing block's new_dt is 5; values must come from dt_old = 4
    want_old, _ = predictor.doppler_hz(START_UNIX + 4.0, FREQ)
    want_new, _ = predictor.doppler_hz(START_UNIX + 5.0, FREQ)
    assert abs(logged - float(want_old)) < 0.01
    assert abs(logged - float(want_new)) > 0.1   # and NOT the new-dt value
    time_lines = [m for m in msgs if m.startswith("time")]
    import time as _t
    want_ts = _t.strftime("%Y-%m-%dT%H:%M:%S", _t.gmtime(START_UNIX + 5.0))
    assert want_ts in time_lines[0]
