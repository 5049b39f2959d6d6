"""Framing tests: reference EOF/tail semantics, fragmented pipes, chunking."""

import io

from doppler_tpu.runtime import stream


class Dribble(io.RawIOBase):
    """A stream that returns at most n bytes per read (pipe fragmentation)."""

    def __init__(self, data: bytes, max_read: int):
        self._buf = io.BytesIO(data)
        self._max = max_read

    def read(self, n=-1):
        if n is None or n < 0:
            n = self._max
        return self._buf.read(min(n, self._max))


def test_exact_multiple_blocks():
    r = stream.BlockReader(io.BytesIO(b"x" * 16384), 8192)
    b1, eof1 = r.read_block()
    assert len(b1) == 8192 and not eof1
    b2, eof2 = r.read_block()
    assert len(b2) == 8192 and not eof2
    b3, eof3 = r.read_block()
    assert b3 == b"" and eof3


def test_partial_tail_is_returned_with_eof():
    r = stream.BlockReader(io.BytesIO(b"x" * 9000), 8192)
    b1, eof1 = r.read_block()
    assert len(b1) == 8192 and not eof1
    b2, eof2 = r.read_block()
    assert len(b2) == 808 and eof2


def test_fragmented_pipe_does_not_fake_eof():
    # The OS may deliver fewer bytes per read(); only true EOF is a short block.
    r = stream.BlockReader(Dribble(b"y" * 8192, max_read=1000), 8192)
    b1, eof1 = r.read_block()
    assert len(b1) == 8192 and not eof1


def test_read_chunk_stops_at_eof_and_keeps_sizes():
    data = b"z" * (8192 * 3 + 100)
    r = stream.BlockReader(io.BytesIO(data), 8192)
    chunk = r.read_chunk(8)
    assert chunk.block_sizes == [8192, 8192, 8192, 100]
    assert chunk.eof
    assert len(chunk.data) == len(data)


def test_read_chunk_exact_boundary_then_empty():
    r = stream.BlockReader(io.BytesIO(b"z" * 8192 * 2), 8192)
    c1 = r.read_chunk(2)
    assert c1.block_sizes == [8192, 8192] and not c1.eof
    c2 = r.read_chunk(2)
    assert c2.block_sizes == [] and c2.eof and c2.data == b""


def test_bytes_per_sample():
    assert stream.bytes_per_sample("i16") == 4
    assert stream.bytes_per_sample("f32") == 8


def test_chunk_prefetcher_matches_direct_reads():
    data = bytes(range(256)) * 100              # 25600 bytes
    direct = stream.BlockReader(io.BytesIO(data), 1024)
    want = []
    while True:
        c = direct.read_chunk(4)
        want.append(c)
        if c.eof:
            break

    pre = stream.ChunkPrefetcher(
        stream.BlockReader(Dribble(data, 700), 1024), 4, depth=3
    )
    got = []
    while True:
        c = pre.read_chunk(4)
        got.append(c)
        if c.eof:
            break
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.data == w.data
        assert g.block_sizes == w.block_sizes
        assert g.eof == w.eof


def test_chunk_prefetcher_rejects_mismatched_width():
    import pytest

    pre = stream.ChunkPrefetcher(stream.BlockReader(io.BytesIO(b""), 8), 2)
    with pytest.raises(ValueError, match="staged 2-block"):
        pre.read_chunk(3)


def test_chunk_prefetcher_propagates_reader_errors():
    import pytest

    class Boom(io.RawIOBase):
        def read(self, n=-1):
            raise OSError("pipe burst")

    pre = stream.ChunkPrefetcher(stream.BlockReader(Boom(), 8), 2)
    with pytest.raises(OSError, match="pipe burst"):
        pre.read_chunk(2)


def test_pipeline_prefetch_output_identical():
    import numpy as np

    from doppler_tpu.runtime.pipeline import ConstScheduler, Pipeline

    rng = np.random.default_rng(7)
    raw = rng.integers(-30000, 30000, size=4096, dtype=np.int16).astype("<i2").tobytes()

    def run(prefetch):
        pipe = Pipeline(256000, "i16", "i16", ConstScheduler(-15000.0),
                        chunk_blocks=2, prefetch_chunks=prefetch)
        out = io.BytesIO()
        pipe.run(io.BytesIO(raw), out)
        return out.getvalue()

    assert run(0) == run(3)
