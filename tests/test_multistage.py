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
    # 1.024M → 128k via one greedy ÷8 stage (round 4: larger stage factors
    # cut the fused kernel's MACs ~2.3× vs the classic 3-halfband chain),
    # then 3/8 rational
    assert len(ms.stages) == 2
    assert (ms.stages[0].P, ms.stages[0].Q) == (1, 8)
    assert (ms.stages[-1].P, ms.stages[-1].Q) == (3, 8)
    assert (ms.P, ms.Q) == (3, 64)
    # heavy front: 100M → 48k factors its ÷256 into just two ÷16 stages
    heavy = MultiStageResampler(100_000_000, 48000)
    assert [(st.P, st.Q) for st in heavy.stages] == [
        (1, 16), (1, 16), (384, 3125)]
    assert all(st.T <= 129 for st in heavy.stages[:-1])
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


# ---------------------------------------------------------------------------
# Fully fused Pallas cascade (round 3, VERDICT r2 #5c/#7): one kernel for
# mix + every stage + encode; intermediates never leave VMEM.

def _mk_pipe(impl, chunk=8, interpret=True, stages="multi"):
    from doppler_tpu.ops.resample import attach_resampler
    from doppler_tpu.runtime.pipeline import ConstScheduler, Pipeline

    p = Pipeline(FS, "i16", "i16", ConstScheduler(9000.0),
                 chunk_blocks=chunk, impl=impl,
                 pallas_interpret=interpret and impl == "pallas")
    attach_resampler(p, 48000, stages=stages)
    return p


def _run_bytes(pipe, raw):
    out = io.BytesIO()
    pipe.run(io.BytesIO(raw), out)
    return out.getvalue()


def test_fused_cascade_kernel_streaming_and_w_invariance():
    import jax.numpy as jnp

    from doppler_tpu.ops.phase_plan import NCOState, plan_blocks
    from doppler_tpu.ops.pallas.chain import (
        carry_rows,
        make_chain_taps,
        mix_cascade_pallas_stream,
    )

    ms = MultiStageResampler(FS, 48000)
    B, L = 8, 8192
    rng = np.random.default_rng(12)
    words = rng.integers(-(1 << 31), 1 << 31, size=(B, L),
                         dtype=np.int64).astype(np.int32)
    plan = plan_blocks([7000.0 + 1.5 * k for k in range(B)], [L] * B, FS,
                       NCOState(), L)
    arrs = [np.asarray(getattr(plan, f))
            for f in ("d_hi", "d_lo", "c1_hi", "c1_lo", "c2_hi", "c2_lo", "t")]
    n = len(ms.stages)
    stages = tuple((st.P, st.Q, st.T) for st in ms.stages)
    taps = tuple(
        jnp.asarray(make_chain_taps(st.bank, st.P, st.Q,
                                    pp=(st.P if i < n - 1 else None)))
        for i, st in enumerate(ms.stages))
    zc = tuple(jnp.zeros((2, carry_rows(st.T), 128), jnp.float32)
               for st in ms.stages)
    whole, _ = mix_cascade_pallas_stream(
        jnp.asarray(words), *[jnp.asarray(a) for a in arrs], taps, zc,
        stages=stages, interpret=True)
    o1, c1 = mix_cascade_pallas_stream(
        jnp.asarray(words[:4]), *[jnp.asarray(a[:4]) for a in arrs], taps, zc,
        stages=stages, interpret=True)
    o2, _ = mix_cascade_pallas_stream(
        jnp.asarray(words[4:]), *[jnp.asarray(a[4:]) for a in arrs], taps, c1,
        stages=stages, interpret=True)
    split = np.concatenate([np.asarray(o1), np.asarray(o2)])
    np.testing.assert_array_equal(split, np.asarray(whole))
    # Explicit-W reruns of the SAME bytes in ONE kernel call change the
    # interpret-mode program shape (grid step count, matmul M), and
    # XLA:CPU's codegen/microkernel choices then round ≤1 ulp apart (the
    # conv_stream_geometry K≥64 floor and the mix_tone FMA-contraction
    # contract document the same phenomenon; the Mosaic MXU reduction is
    # shape-invariant).  The product pipeline always streams at ONE fixed
    # W per instance — that chaining is pinned bitwise above — so the
    # cross-program check here pins ≤1 LSB.
    for w in (4, 2):
        ww, _ = mix_cascade_pallas_stream(
            jnp.asarray(words), *[jnp.asarray(a) for a in arrs], taps, zc,
            stages=stages, interpret=True, blocks_per_step=w)
        iww = np.asarray(ww)
        iwh = np.asarray(whole)
        di = np.abs((iww << 16 >> 16) - (iwh << 16 >> 16))
        dq = np.abs((iww >> 16) - (iwh >> 16))
        assert max(di.max(), dq.max()) <= 1, w


def test_pipeline_fused_cascade_matches_xla_cascade():
    n = 2048 * 33 + 500   # full chunks + ragged tail (fallback chunk)
    rng = np.random.default_rng(0x77)
    raw = rng.integers(-9000, 9000, size=2 * n,
                       dtype=np.int16).astype("<i2").tobytes()
    a = _run_bytes(_mk_pipe("xla"), raw)
    pb = _mk_pipe("pallas")
    b = _run_bytes(pb, raw)
    assert pb._cascade_w is not None, "fused cascade did not engage"
    assert len(a) == len(b)
    xa = np.frombuffer(a, dtype="<i2").astype(np.int32)
    xb = np.frombuffer(b, dtype="<i2").astype(np.int32)
    d = np.abs(xa - xb)
    assert d.max() <= 1
    assert np.mean(d > 0) < 0.01
    # chunk-width invariance of the fused path (bitwise)
    c = _run_bytes(_mk_pipe("pallas", chunk=4), raw)
    assert c == b


def test_pipeline_fused_cascade_checkpoint_resume_bitwise(tmp_path):
    from doppler_tpu.runtime import checkpoint

    n = 2048 * 32
    rng = np.random.default_rng(0x88)
    raw = rng.integers(-9000, 9000, size=2 * n,
                       dtype=np.int16).astype("<i2").tobytes()
    whole = _run_bytes(_mk_pipe("pallas"), raw)
    half = len(raw) // 2
    p1 = _mk_pipe("pallas")
    part1 = _run_bytes(p1, raw[:half])
    ck = str(tmp_path / "casc.npz")
    checkpoint.save(ck, p1)
    p2 = _mk_pipe("pallas")
    checkpoint.restore(ck, p2)
    part2 = _run_bytes(p2, raw[half:])
    assert part1 + part2 == whole


def test_fused_cascade_f32_formats():
    from doppler_tpu.ops.resample import attach_resampler
    from doppler_tpu.runtime.pipeline import ConstScheduler, Pipeline

    n = 2048 * 16
    rng = np.random.default_rng(0x99)
    x = (0.4 * rng.standard_normal(2 * n)).astype("<f4")
    raw = x.tobytes()

    def run(impl):
        p = Pipeline(FS, "f32", "f32", ConstScheduler(9000.0),
                     chunk_blocks=8, impl=impl,
                     pallas_interpret=impl == "pallas")
        attach_resampler(p, 48000, stages="multi")
        out = io.BytesIO()
        p.run(io.BytesIO(raw), out)
        return p, out.getvalue()

    _, a = run("xla")
    pb, b = run("pallas")
    assert pb._cascade_w is not None
    ya = np.frombuffer(a, dtype="<f4")
    yb = np.frombuffer(b, dtype="<f4")
    assert ya.size == yb.size
    # f32 out: 1-ulp-grade agreement between formulations
    num = np.sqrt(np.mean((ya - yb) ** 2))
    den = np.sqrt(np.mean(ya ** 2)) + 1e-30
    assert num / den < 1e-6


def test_odd_q_rate_eligibility_story():
    """VERDICT r2 #5b: rates whose reduced Q is odd (e.g. 250 ksps → 48 k,
    Q=125) can never tile the 128-lane row single-stage — 'auto' therefore
    routes heavy decimation through the cascade (fused front), and the
    single-stage path still works via the XLA formulation."""
    import jax.numpy as jnp

    from doppler_tpu.ops.resample import RationalResampler, attach_resampler
    from doppler_tpu.ops.pallas.chain import make_chain_taps
    from doppler_tpu.runtime.pipeline import ConstScheduler, Pipeline

    fs2 = 250000
    rs = RationalResampler(fs2, 48000)
    assert rs.Q == 125 and 128 % rs.Q != 0
    with pytest.raises(ValueError, match="128 % Q"):
        make_chain_taps(rs.bank, rs.P, rs.Q)     # the mathematical limit

    n = 2048 * 8
    rng = np.random.default_rng(0xAA)
    raw = rng.integers(-9000, 9000, size=2 * n,
                       dtype=np.int16).astype("<i2").tobytes()

    def run(stages):
        p = Pipeline(fs2, "i16", "i16", ConstScheduler(5000.0),
                     chunk_blocks=4, impl="pallas", pallas_interpret=True)
        attach_resampler(p, 48000, stages=stages)
        out = io.BytesIO()
        p.run(io.BytesIO(raw), out)
        return p, out.getvalue()

    p_auto, a = run("auto")
    # 250k/48k is ~5.2x: one halfband then a Q∤128 tail — round 4's SPLIT
    # cascade fuses the halfband front (final_dense f32 planes) and runs
    # only the final rational stage via XLA, at half the input rate
    assert getattr(p_auto.resampler, "stages", None) is not None
    assert p_auto._cascade_w is not None, "split front did not engage"
    assert p_auto._cascade_k == 1 < len(p_auto.resampler.stages)
    p_single, b = run("single")
    assert getattr(p_single.resampler, "stages", None) is None
    # both structures produce a 48 k stream of the same length ±filter delay
    assert abs(len(a) - len(b)) <= 4 * 8
    assert len(a) > 0 and len(b) > 0


# ---------------------------------------------------------------------------
# Split cascade (round 4, VERDICT r3 next #1): rates whose reduced final Q
# doesn't tile 128 lanes (odd Q — incl. BASELINE config 5's 384/3125 tail)
# keep the heavy ÷2^k front in the fused kernel; only the final rational
# stage runs via XLA, at 1/2^k of the input rate.


def _mk_split(fs, impl, chunk=8, interpret=True):
    from doppler_tpu.ops.resample import attach_resampler
    from doppler_tpu.runtime.pipeline import ConstScheduler, Pipeline

    p = Pipeline(fs, "i16", "i16", ConstScheduler(5000.0),
                 chunk_blocks=chunk, impl=impl,
                 pallas_interpret=interpret and impl == "pallas")
    attach_resampler(p, 48000, stages="multi")
    return p


@pytest.mark.parametrize("fs", [250000, 6250000])
def test_split_cascade_fused_front_engages_and_matches_xla(fs):
    """Q=125-class and Q=3125-class (config 5's own tail) rates run the
    fused front — asserted on the dispatch path — and agree with the
    all-XLA cascade within the usual 1-LSB formulation tolerance;
    chunk-width invariance of the split path is bitwise."""
    n = 2048 * 24 + 300
    rng = np.random.default_rng(0xAB ^ fs)
    raw = rng.integers(-9000, 9000, size=2 * n,
                       dtype=np.int16).astype("<i2").tobytes()
    a = _run_bytes(_mk_split(fs, "xla"), raw)
    pb = _mk_split(fs, "pallas")
    b = _run_bytes(pb, raw)
    assert pb._cascade_w is not None, "split front did not engage"
    assert 1 <= pb._cascade_k < len(pb.resampler.stages)
    assert pb.resampler.stages[-1].Q % 2 == 1      # odd-Q tail
    xa = np.frombuffer(a, dtype="<i2").astype(np.int32)
    xb = np.frombuffer(b, dtype="<i2").astype(np.int32)
    assert xa.size == xb.size
    d = np.abs(xa - xb)
    assert d.max() <= 1 and np.mean(d > 0) < 0.01
    c = _run_bytes(_mk_split(fs, "pallas", chunk=4), raw)
    assert c == b


def test_split_cascade_checkpoint_resume_bitwise(tmp_path):
    from doppler_tpu.runtime import checkpoint

    fs = 250000
    raw = np.random.default_rng(0xCE).integers(
        -9000, 9000, size=2 * 2048 * 32, dtype=np.int16
    ).astype("<i2").tobytes()
    whole = _run_bytes(_mk_split(fs, "pallas"), raw)
    half = len(raw) // 2
    p1 = _mk_split(fs, "pallas")
    part1 = _run_bytes(p1, raw[:half])
    ck = str(tmp_path / "split.npz")
    checkpoint.save(ck, p1)
    p2 = _mk_split(fs, "pallas")
    checkpoint.restore(ck, p2)
    part2 = _run_bytes(p2, raw[half:])
    assert part1 + part2 == whole


def test_split_cascade_seek_resumes_bitwise():
    fs = 250000
    bb = 8192
    raw = np.random.default_rng(0xCF).integers(
        -9000, 9000, size=2 * 2048 * 32, dtype=np.int16
    ).astype("<i2").tobytes()
    whole = _run_bytes(_mk_split(fs, "pallas"), raw)
    k = 16
    n_in = k * 2048
    p2 = _mk_split(fs, "pallas")
    for st in p2.resampler.stages:
        n_in = -(-n_in * st.P // st.Q)
    p2.seek_to_block(k, history=raw[(k - 1) * bb:k * bb])
    out = io.BytesIO()
    p2.run(io.BytesIO(raw[k * bb:]), out)
    assert out.getvalue() == whole[n_in * 4:] and out.getvalue()


@pytest.mark.parametrize("fs,out_rate", [
    (2_400_000, 48000),    # ÷16 front, 8/25 tail (Q=25)
    (768_000, 32000),      # ÷8 front, 1/3 tail (Q=3)
    (5_000_000, 125000),   # ÷8·÷2 front, 2/5 tail (Q=5)
])
def test_split_cascade_arbitrary_rates(fs, out_rate):
    """Rate fuzz for the split machinery: assorted odd-Q tails with
    different greedy fronts all engage the fused front, agree with the
    all-XLA cascade within 1 LSB, and are chunk-width bitwise."""
    ms = MultiStageResampler(fs, out_rate)
    assert ms.stages[-1].Q % 2 == 1          # odd-Q tail by construction

    def mk(impl, chunk=8):
        from doppler_tpu.ops.resample import attach_resampler
        from doppler_tpu.runtime.pipeline import ConstScheduler, Pipeline

        p = Pipeline(fs, "i16", "i16", ConstScheduler(fs / 100.0),
                     chunk_blocks=chunk, impl=impl,
                     pallas_interpret=impl == "pallas")
        attach_resampler(p, out_rate, stages="multi")
        return p

    rng = np.random.default_rng(fs ^ out_rate)
    raw = rng.integers(-9000, 9000, size=2 * 2048 * 16,
                       dtype=np.int16).astype("<i2").tobytes()
    a = _run_bytes(mk("xla"), raw)
    pb = mk("pallas")
    b = _run_bytes(pb, raw)
    assert pb._cascade_w is not None, "split front did not engage"
    assert 1 <= pb._cascade_k < len(pb.resampler.stages)
    xa = np.frombuffer(a, dtype="<i2").astype(np.int32)
    xb = np.frombuffer(b, dtype="<i2").astype(np.int32)
    assert xa.size == xb.size and xa.size > 0
    d = np.abs(xa - xb)
    assert d.max() <= 1 and np.mean(d > 0) < 0.01
    c = _run_bytes(mk("pallas", chunk=4), raw)
    assert c == b


def test_split_cascade_f32_formats():
    """f32 wire formats ride the split path too: the planar front planes
    and the XLA tail agree with the all-XLA cascade at 1-ulp grade."""
    from doppler_tpu.ops.resample import attach_resampler
    from doppler_tpu.runtime.pipeline import ConstScheduler, Pipeline

    fs = 250000
    rng = np.random.default_rng(0xF5)
    raw = (0.4 * rng.standard_normal(2 * 1024 * 16 * 4)).astype("<f4").tobytes()

    def run(impl, ot):
        p = Pipeline(fs, "f32", ot, ConstScheduler(5000.0),
                     chunk_blocks=16, impl=impl,
                     pallas_interpret=impl == "pallas")
        attach_resampler(p, 48000, stages="multi")
        out = io.BytesIO()
        p.run(io.BytesIO(raw), out)
        return p, out.getvalue()

    for ot in ("f32", "i16"):
        pa, a = run("xla", ot)
        pb, b = run("pallas", ot)
        assert pb._cascade_w is not None and pb._cascade_k == 1
        if ot == "f32":
            ya = np.frombuffer(a, "<f4")
            yb = np.frombuffer(b, "<f4")
            assert ya.size == yb.size and ya.size > 0
            rel = (np.sqrt(np.mean((ya - yb) ** 2))
                   / (np.sqrt(np.mean(ya ** 2)) + 1e-30))
            assert rel < 1e-6, rel
        else:
            ya = np.frombuffer(a, "<i2").astype(np.int32)
            yb = np.frombuffer(b, "<i2").astype(np.int32)
            assert ya.size == yb.size and np.abs(ya - yb).max() <= 1


def test_cascade_split3_precision_bound():
    """'fast' (split3) cascade: ≤1 LSB and ≥80 dB vs the exact cascade,
    with bitwise blocks_per_step invariance, on the config-3 shape."""
    import jax.numpy as jnp
    import numpy as np

    from doppler_tpu.ops import codec
    from doppler_tpu.ops.multistage import MultiStageResampler
    from doppler_tpu.ops.pallas.chain import (
        carry_rows,
        make_chain_taps,
        mix_cascade_pallas_stream,
    )
    from doppler_tpu.ops.phase_plan import NCOState, plan_blocks

    rng = np.random.default_rng(0x53)
    fs, L, B = 1_024_000, 4096, 8
    ms = MultiStageResampler(fs, 48000)
    nst = len(ms.stages)
    stages_cfg = tuple((st.P, st.Q, st.T) for st in ms.stages)
    taps = tuple(
        jnp.asarray(make_chain_taps(
            st.bank, st.P, st.Q, pp=(st.P if i < nst - 1 else None)))
        for i, st in enumerate(ms.stages))
    carries = tuple(
        jnp.zeros((2, carry_rows(st.T), 128), jnp.float32)
        for st in ms.stages)
    words = rng.integers(-(1 << 31), 1 << 31, size=(B, L),
                         dtype=np.int64).astype(np.int32)
    plan = plan_blocks([7000.0 + k for k in range(B)], [L] * B, fs,
                       NCOState(), L)
    arrs = (plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
            plan.c2_hi, plan.c2_lo, plan.t)

    def run(prec, w=None):
        out, _ = mix_cascade_pallas_stream(
            jnp.asarray(words), *arrs, taps, carries, stages=stages_cfg,
            interpret=True, dot_precision=prec, blocks_per_step=w)
        return np.asarray(out)

    exact = run("highest")
    fast = run("split3")
    ge, we = (np.frombuffer(codec.i16_words_to_bytes(a.reshape(-1)),
                            dtype="<i2").astype(np.int32)
              for a in (fast, exact))
    d = np.abs(ge - we)
    assert d.max() <= 1, d.max()
    err = (ge - we) / 32768.0
    sig = we / 32768.0
    snr = 10 * np.log10((sig ** 2).mean() / max((err ** 2).mean(), 1e-30))
    assert snr > 80.0, snr
    for w in (2, 4, 8):
        np.testing.assert_array_equal(fast, run("split3", w=w))
