"""End-to-end const-mode tests: Pipeline + CLI vs the reference oracle."""

import io
import os
import subprocess
import sys

import numpy as np

from doppler_tpu import oracle
from doppler_tpu.runtime.pipeline import ConstScheduler, Pipeline

RNG = np.random.default_rng(0xE2E)
FS = 256000


def make_f32_stream(n):
    x = (0.3 * (RNG.normal(size=n) + 1j * RNG.normal(size=n))).astype(np.complex64)
    return oracle.encode_f32_bytes(x), x


def make_i16_stream(n):
    raw = RNG.integers(-32768, 32768, size=2 * n, dtype=np.int16)
    return raw.astype("<i2").tobytes(), oracle.decode_i16_bytes(raw.tobytes())


def oracle_const(buf, intype, outtype, shift, fs):
    """Reference binary semantics for const mode over the whole stream."""
    dec = oracle.decode_i16_bytes if intype == "i16" else oracle.decode_f32_bytes
    enc = oracle.encode_i16_bytes if outtype == "i16" else oracle.encode_f32_bytes
    mixed, _ = oracle.shift_frequency_oracle(dec(buf), 0, shift, fs)
    return enc(mixed)


def run_pipeline(buf, intype, outtype, shift, fs=FS, chunk_blocks=4):
    pipe = Pipeline(fs, intype, outtype, ConstScheduler(shift),
                    chunk_blocks=chunk_blocks)
    out = io.BytesIO()
    pipe.run(io.BytesIO(buf), out)
    return out.getvalue()


def test_const_f32_to_i16_matches_oracle():
    # BASELINE config 1: const -15 kHz, f32 in, i16 out.
    buf, _ = make_f32_stream(3000)  # 24000 bytes: 2 full blocks + tail
    got = run_pipeline(buf, "f32", "i16", -15000.0)
    want = oracle_const(buf, "f32", "i16", -15000.0, FS)
    assert len(got) == len(want)
    snr = oracle.snr_db(oracle.decode_i16_bytes(want), oracle.decode_i16_bytes(got))
    assert snr > 60.0, snr
    # and the vast majority of i16 words should be bit-identical
    same = np.mean(
        np.frombuffer(got, dtype="<i2") == np.frombuffer(want, dtype="<i2")
    )
    assert same > 0.9, same


def test_const_i16_to_i16_matches_oracle():
    buf, _ = make_i16_stream(5000)
    got = run_pipeline(buf, "i16", "i16", 5000.0)
    want = oracle_const(buf, "i16", "i16", 5000.0, FS)
    assert len(got) == len(want)
    snr = oracle.snr_db(oracle.decode_i16_bytes(want), oracle.decode_i16_bytes(got))
    assert snr > 60.0, snr


def test_const_i16_to_f32_roundtrip_types():
    buf, x = make_i16_stream(2048)
    got = run_pipeline(buf, "i16", "f32", 0.0)
    # zero shift: output f32 must equal decoded input exactly
    np.testing.assert_array_equal(oracle.decode_f32_bytes(got), x)


def test_chunk_width_invariance():
    # Output must not depend on how many blocks form a device dispatch.
    buf, _ = make_f32_stream(6000)
    a = run_pipeline(buf, "f32", "f32", -12345.6, chunk_blocks=1)
    b = run_pipeline(buf, "f32", "f32", -12345.6, chunk_blocks=7)
    assert a == b


def test_pallas_mixer_f32_paths_match_xla():
    """impl='pallas' f32 in/out (planar staging) ≈ the XLA interleaved path."""
    buf, _ = make_f32_stream(3000)  # 2 full 1024-sample blocks + tail

    def run(intype, outtype, impl, interpret=False):
        pipe = Pipeline(FS, intype, outtype, ConstScheduler(-9876.5),
                        chunk_blocks=2, impl=impl,
                        pallas_interpret=interpret)
        out = io.BytesIO()
        pipe.run(io.BytesIO(buf), out)
        return out.getvalue()

    for outtype in ("f32", "i16"):
        a = run("f32", outtype, "xla")
        b = run("f32", outtype, "pallas", interpret=True)
        assert len(a) == len(b)
        if outtype == "f32":
            np.testing.assert_allclose(
                np.frombuffer(a, "<f4"), np.frombuffer(b, "<f4"), atol=2e-6)
        else:
            aw = np.frombuffer(a, "<i2").astype(np.int32)
            bw = np.frombuffer(b, "<i2").astype(np.int32)
            assert np.abs(aw - bw).max() <= 1
            assert np.mean(aw == bw) > 0.99


def test_empty_stream():
    assert run_pipeline(b"", "i16", "i16", 1000.0) == b""


def test_single_partial_block():
    buf, _ = make_i16_stream(10)
    got = run_pipeline(buf, "i16", "i16", 1000.0)
    want = oracle_const(buf, "i16", "i16", 1000.0, FS)
    assert len(got) == len(want) == 40


def test_cli_const_subprocess():
    """Full process-boundary check: bytes | python -m doppler_tpu | bytes."""
    buf, _ = make_f32_stream(2500)
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, "-m", "doppler_tpu", "const",
         "-s", str(FS), "-i", "f32", "-o", "i16",
         "--shift", "-15000", "--platform", "cpu", "--chunk-blocks", "4"],
        input=buf, stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr.decode()
    want = run_pipeline(buf, "f32", "i16", -15000.0)
    assert proc.stdout == want
    # telemetry goes to stderr only
    assert b"constant shift mode" in proc.stderr


def test_cli_bad_location_errors():
    proc = subprocess.run(
        [sys.executable, "-m", "doppler_tpu", "track",
         "-s", "256000", "-i", "i16", "--tlefile", "/nonexistent",
         "--tlename", "X", "--location", "not-a-location",
         "--frequency", "437505000", "--platform", "cpu"],
        input=b"", stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        timeout=120,
    )
    assert proc.returncode == 1
    assert b"location" in proc.stderr.lower()


def test_pipeline_pallas_chain_matches_xla(tmp_path):
    """Pipeline with the fused Pallas chain (interpret) vs the XLA path,
    streaming across chunks and a partial tail."""
    from doppler_tpu.ops.resample import attach_resampler

    fs = 1024000
    n = 2048 * 33 + 500   # 33 full reference blocks + ragged tail
    raw = RNG.integers(-9000, 9000, size=2 * n, dtype=np.int16).astype("<i2").tobytes()

    def run(impl, interpret=False):
        pipe = Pipeline(fs, "i16", "i16", ConstScheduler(9000.0),
                        chunk_blocks=8, impl=impl, pallas_interpret=interpret)
        attach_resampler(pipe, 48000)
        out = io.BytesIO()
        pipe.run(io.BytesIO(raw), out)
        return out.getvalue()

    a = run("xla")
    b = run("pallas", interpret=True)
    assert len(a) == len(b)
    xa = np.frombuffer(a, dtype="<i2").astype(np.int32)
    xb = np.frombuffer(b, dtype="<i2").astype(np.int32)
    assert np.abs(xa - xb).max() <= 1


def test_cli_outtype_defaults_to_intype():
    """usage.rs:268-270: omitted -o means outtype = intype."""
    buf, x = make_i16_stream(1024)
    proc = subprocess.run(
        [sys.executable, "-m", "doppler_tpu", "const",
         "-s", str(FS), "-i", "i16", "--shift", "0",
         "--platform", "cpu", "--chunk-blocks", "2"],
        input=buf, stdout=subprocess.PIPE, stderr=subprocess.PIPE, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr.decode()
    assert len(proc.stdout) == len(buf)          # still i16 (4 B/sample)
    got = oracle.decode_i16_bytes(proc.stdout)
    want = oracle.decode_i16_bytes(oracle.encode_i16_bytes(x))
    np.testing.assert_array_equal(got, want)      # zero shift: roundtrip only


def test_pallas_chain_falls_back_when_history_exceeds_block():
    """Q=128 decimation auto-sizes T−1 beyond one 2048-sample block; the
    pipeline must degrade to the XLA path instead of crashing."""
    from doppler_tpu.ops.resample import attach_resampler

    fs = 1024000
    n = 2048 * 10 + 77
    raw = RNG.integers(-9000, 9000, size=2 * n, dtype=np.int16).astype("<i2").tobytes()

    def run(impl, interpret=False):
        pipe = Pipeline(fs, "i16", "i16", ConstScheduler(5000.0),
                        chunk_blocks=4, impl=impl, pallas_interpret=interpret)
        attach_resampler(pipe, 8000)      # P=1, Q=128 → T−1 > 2048
        out = io.BytesIO()
        pipe.run(io.BytesIO(raw), out)
        return out.getvalue()

    a = run("xla")
    b = run("pallas", interpret=True)     # must not raise
    assert a == b                          # same path taken → identical


def test_pallas_chain_checkpoint_resume_bitwise(tmp_path):
    """Resume on the fused pallas-chain path must reseed the FIR carry."""
    from doppler_tpu.ops.resample import attach_resampler
    from doppler_tpu.runtime import checkpoint

    fs = 1024000
    n = 2048 * 32
    raw = RNG.integers(-9000, 9000, size=2 * n, dtype=np.int16).astype("<i2").tobytes()

    def mk():
        pipe = Pipeline(fs, "i16", "i16", ConstScheduler(9000.0),
                        chunk_blocks=8, impl="pallas", pallas_interpret=True)
        attach_resampler(pipe, 48000)
        return pipe

    whole = io.BytesIO()
    mk().run(io.BytesIO(raw), whole)

    cut = 2048 * 16 * 4
    p1 = mk()
    first = io.BytesIO()
    p1.run(io.BytesIO(raw[:cut]), first)
    ck = str(tmp_path / "pc.npz")
    checkpoint.save(ck, p1)
    p2 = mk()
    checkpoint.restore(ck, p2)
    second = io.BytesIO()
    p2.run(io.BytesIO(raw[cut:]), second)
    assert first.getvalue() + second.getvalue() == whole.getvalue()


def test_pallas_chain_drain_after_partial_tail_matches_xla():
    """EOF-padded chunks must not poison the FIR history used by --drain."""
    from doppler_tpu.ops.resample import attach_resampler

    fs = 1024000
    n = 2048 * 5   # 5 blocks in an 8-block chunk → padded tail chunk
    raw = RNG.integers(-9000, 9000, size=2 * n, dtype=np.int16).astype("<i2").tobytes()

    def run(impl, interpret=False):
        pipe = Pipeline(fs, "i16", "i16", ConstScheduler(9000.0),
                        chunk_blocks=8, impl=impl, pallas_interpret=interpret,
                        drain_on_eof=True)
        attach_resampler(pipe, 48000)
        out = io.BytesIO()
        pipe.run(io.BytesIO(raw), out)
        return out.getvalue()

    a = run("xla")
    b = run("pallas", interpret=True)
    assert len(a) == len(b)
    xa = np.frombuffer(a, dtype="<i2").astype(np.int32)
    xb = np.frombuffer(b, dtype="<i2").astype(np.int32)
    assert np.abs(xa - xb).max() <= 1


def test_attach_resampler_keeps_float_rate():
    from doppler_tpu.ops.resample import attach_resampler

    pipe = Pipeline(1024000, "i16", "i16", ConstScheduler(0.0))
    attach_resampler(pipe, 11025.5)
    rs = pipe.resampler
    assert rs.out_rate == 11025.5
    assert abs(rs.P / rs.Q * 1024000 - 11025.5) < 1e-3


def test_cli_chunk_blocks_auto_and_impl_auto():
    """--chunk-blocks auto + default --impl auto resolve on CPU and produce
    the same bytes as explicit settings."""
    import subprocess
    import sys

    n = 8192 * 3
    raw = np.random.default_rng(11).integers(
        -20000, 20000, size=2 * n, dtype=np.int16
    )
    buf = raw.astype("<i2").tobytes()
    base = [sys.executable, "-m", "doppler_tpu.cli", "const", "-s", "256000",
            "-i", "i16", "--shift", "-15000", "--platform", "cpu"]
    a = subprocess.run(base + ["--chunk-blocks", "auto"], input=buf,
                       capture_output=True)
    assert a.returncode == 0, a.stderr.decode()[-2000:]
    b = subprocess.run(base + ["--chunk-blocks", "64", "--impl", "xla"],
                       input=buf, capture_output=True)
    assert a.stdout == b.stdout


def test_cli_chunk_blocks_rejects_garbage():
    import subprocess
    import sys

    p = subprocess.run(
        [sys.executable, "-m", "doppler_tpu.cli", "const", "-s", "256000",
         "-i", "i16", "--shift", "0", "--chunk-blocks", "-3",
         "--platform", "cpu"],
        input=b"", capture_output=True,
    )
    assert p.returncode == 1
    assert b"chunk-blocks" in p.stderr


def test_pipeline_f32_stays_fused_on_pallas():
    """VERDICT r2 item 5a: f32 wire formats run the fused chain (not a
    silent 4-8x-slower XLA fallback).  Verified structurally (the chain
    carry exists after a full chunk) and numerically vs the XLA path."""
    from doppler_tpu.ops.resample import attach_resampler

    fs = 1024000
    n = 2048 * 17 + 300
    raw = (0.4 * RNG.standard_normal(2 * n)).astype("<f4").tobytes()

    def run(impl, interpret=False):
        pipe = Pipeline(fs, "f32", "f32", ConstScheduler(9000.0),
                        chunk_blocks=8, impl=impl, pallas_interpret=interpret)
        attach_resampler(pipe, 48000)
        out = io.BytesIO()
        pipe.run(io.BytesIO(raw), out)
        return out.getvalue(), pipe

    a, _ = run("xla")
    b, pb = run("pallas", interpret=True)
    # the ragged-tail fallback resets _chain_carry; _chain_taps persists
    # and is only built when the chain path actually dispatched
    assert pb._chain_taps is not None, "f32 pipeline did not use the chain"
    assert len(a) == len(b)
    xa = np.frombuffer(a, dtype="<f4")
    xb = np.frombuffer(b, dtype="<f4")
    err = np.abs(xa - xb)
    assert err.max() <= 4e-6 * max(1.0, np.abs(xa).max())

    # f32 -> i16 combo as well (encode + NaN rule active)
    def run_i16(impl, interpret=False):
        pipe = Pipeline(fs, "f32", "i16", ConstScheduler(9000.0),
                        chunk_blocks=8, impl=impl, pallas_interpret=interpret)
        attach_resampler(pipe, 48000)
        out = io.BytesIO()
        pipe.run(io.BytesIO(raw), out)
        return out.getvalue()

    c = run_i16("xla")
    d = run_i16("pallas", interpret=True)
    xc = np.frombuffer(c, dtype="<i2").astype(np.int32)
    xd = np.frombuffer(d, dtype="<i2").astype(np.int32)
    assert np.abs(xc - xd).max() <= 1
