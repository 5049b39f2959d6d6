"""Multi-stage halfband-cascade resampler (ops.multistage)."""

import io

import numpy as np
import pytest

from doppler_tpu import oracle
from doppler_tpu.ops.multistage import (
    MultiStageResampler,
    halfband_taps_needed,
    make_resampler,
)
from doppler_tpu.ops.resample import RationalResampler

RNG = np.random.default_rng(0x35)
FS = 1024000


def run_stream(rs, x, chunk):
    """Feed complex x through a streaming resampler in `chunk`-sample pieces."""
    outs = []
    for k in range(0, len(x), chunk):
        piece = x[k : k + chunk]
        pad = chunk - len(piece)
        i = np.pad(piece.real.astype(np.float32), (0, pad))
        q = np.pad(piece.imag.astype(np.float32), (0, pad))
        yi, yq, n = rs.process(i, q, len(piece), rs.max_out_for(chunk))
        yi = np.asarray(yi)[..., :n]
        yq = np.asarray(yq)[..., :n]
        outs.append(yi + 1j * yq)
    return np.concatenate(outs)


def test_structure_and_tap_savings():
    ms = MultiStageResampler(FS, 48000)
    # 1.024M → 128k via 3 halfbands, then 3/8 rational
    assert len(ms.stages) == 4
    assert [(st.P, st.Q) for st in ms.stages][:3] == [(1, 2)] * 3
    assert (ms.stages[-1].P, ms.stages[-1].Q) == (3, 8)
    assert (ms.P, ms.Q) == (3, 64)
    single = RationalResampler(FS, 48000)
    # the cascade's win: no stage carries a long filter — per-stage taps
    # memory, FIR history, and carry rows stay small even for huge ratios
    # (single-stage taps-per-phase grows with max(P,Q); each cascade stage
    # is bounded by its own gentle transition)
    assert max(st.T for st in ms.stages) < single.T // 4
    total_single = single.T * single.P           # prototype length
    total_multi = sum(st.T * st.P for st in ms.stages)
    assert total_multi < total_single            # less filter memory overall


def test_passband_tone_preserved_stopband_rejected():
    n = 1 << 17
    t = np.arange(n)
    ms = MultiStageResampler(FS, 48000)
    # passband tone (10 kHz < 24 kHz output Nyquist)
    x = np.exp(2j * np.pi * 10000.0 / FS * t).astype(np.complex64)
    y = run_stream(ms, x, n)
    settle = ms.T * 48 // FS + 64
    core = y[settle:-settle] if settle else y
    amp = np.abs(core)
    assert abs(np.mean(amp) - 1.0) < 0.01
    # the tone frequency is preserved
    sp = np.fft.fft(core)
    f_peak = np.fft.fftfreq(core.size, d=1.0 / 48000)[np.argmax(np.abs(sp))]
    assert abs(f_peak - 10000.0) < 48000 / core.size * 2

    # stopband tone (200 kHz, far above output Nyquist): attenuated ≥ 55 dB
    xs = np.exp(2j * np.pi * 200000.0 / FS * t).astype(np.complex64)
    ys = run_stream(MultiStageResampler(FS, 48000), xs, n)
    rms = np.sqrt(np.mean(np.abs(ys[settle:]) ** 2))
    assert 20 * np.log10(max(rms, 1e-12)) < -55.0


def test_chunked_equals_oneshot():
    n = 1 << 15
    x = (RNG.normal(size=n) + 1j * RNG.normal(size=n)).astype(np.complex64)
    whole = run_stream(MultiStageResampler(FS, 48000), x, n)
    split = run_stream(MultiStageResampler(FS, 48000), x, 4096)
    assert whole.size == split.size
    np.testing.assert_allclose(split, whole, atol=1e-6)


def test_output_count_matches_rate():
    ms = MultiStageResampler(FS, 48000)
    n = FS  # one second
    got = ms.out_count_for(n)
    assert abs(got - 48000) <= 1


def test_state_roundtrip_resumes_bitwise():
    n = 1 << 15
    x = (RNG.normal(size=n) + 1j * RNG.normal(size=n)).astype(np.complex64)
    ref = run_stream(MultiStageResampler(FS, 48000), x, 4096)

    a = MultiStageResampler(FS, 48000)
    first = run_stream(a, x[: n // 2], 4096)
    state = a.state_dict()
    b = MultiStageResampler(FS, 48000)
    b.load_state({k: np.asarray(v) for k, v in state.items()})
    second = run_stream(b, x[n // 2 :], 4096)
    resumed = np.concatenate([first, second])
    assert resumed.size == ref.size
    np.testing.assert_array_equal(resumed, ref)


def test_channels_batch_matches_single():
    n = 1 << 14
    C = 3
    xs = (RNG.normal(size=(C, n)) + 1j * RNG.normal(size=(C, n))).astype(
        np.complex64
    )
    ms = MultiStageResampler(FS, 48000, channels=C)
    i = xs.real.astype(np.float32)
    q = xs.imag.astype(np.float32)
    yi, yq, n_out = ms.process(i, q, n, None)
    batch = np.asarray(yi)[:, :n_out] + 1j * np.asarray(yq)[:, :n_out]
    for c in range(C):
        single = run_stream(MultiStageResampler(FS, 48000), xs[c], n)
        np.testing.assert_allclose(batch[c], single[:n_out], atol=1e-6)


def test_make_resampler_selection():
    assert isinstance(make_resampler(FS, 48000, stages="single"),
                      RationalResampler)
    assert isinstance(make_resampler(FS, 48000, stages="auto"),
                      MultiStageResampler)
    # light decimation: auto stays single-stage
    assert isinstance(make_resampler(48000, 44100, stages="auto"),
                      RationalResampler)
    assert isinstance(make_resampler(FS, 48000, stages="multi"),
                      MultiStageResampler)
    with pytest.raises(ValueError, match="single|auto|multi"):
        make_resampler(FS, 48000, stages="bogus")
    with pytest.raises(ValueError, match="decimation-only"):
        MultiStageResampler(48000, 96000)


def test_halfband_taps_monotonic():
    # later (lower-rate) stages need more taps: narrower relative transition
    t1 = halfband_taps_needed(1024000, 24000, 70.0)
    t3 = halfband_taps_needed(256000, 24000, 70.0)
    assert t3 > t1
    assert t1 % 2 == 1 and t3 % 2 == 1


def test_pipeline_cli_multistage(tmp_path):
    """End-to-end: const + --resample-stages multi through the CLI."""
    import subprocess
    import sys

    n = 8192 * 8
    raw = RNG.integers(-20000, 20000, size=2 * n, dtype=np.int16)
    buf = raw.astype("<i2").tobytes()
    p = subprocess.run(
        [sys.executable, "-m", "doppler_tpu.cli", "const", "-s", str(FS),
         "-i", "i16", "--shift", "9000", "--resample-to", "48000",
         "--resample-stages", "multi", "--platform", "cpu"],
        input=buf, capture_output=True,
    )
    assert p.returncode == 0, p.stderr.decode()[-2000:]
    y = oracle.decode_i16_bytes(p.stdout)
    assert abs(y.size - n * 3 // 64) <= 2
    # compare against the single-stage output in the passband sense: both are
    # 70 dB anti-aliased decimators, so broadband noise energy should agree
    p2 = subprocess.run(
        [sys.executable, "-m", "doppler_tpu.cli", "const", "-s", str(FS),
         "-i", "i16", "--shift", "9000", "--resample-to", "48000",
         "--platform", "cpu"],
        input=buf, capture_output=True,
    )
    y2 = oracle.decode_i16_bytes(p2.stdout)
    r1 = np.sqrt(np.mean(np.abs(y) ** 2))
    r2 = np.sqrt(np.mean(np.abs(y2) ** 2))
    assert abs(r1 - r2) / r2 < 0.02
