"""The end-to-end streaming pipeline: bytes in → device chunk kernel → bytes out.

Host/device split (SURVEY §7 design stance): the host does O(blocks) work —
framing, schedule evaluation, staging, telemetry — while the device runs one
jit-compiled fused kernel per *chunk* (= ``chunk_blocks`` reference blocks)
covering decode → NCO mix → (optional resample) → encode.

Chunks have a fixed device shape ``(B, L)`` (B = chunk_blocks, L = samples
per reference block), so there is exactly one compilation per direction; the
stream tail is zero-padded to the chunk shape and the valid sample count is
sliced off on the host (padding is harmless: the mixer is elementwise and the
pad never reaches the output bytes).

Doppler schedules are evaluated per reference-sized block (8192 bytes,
main.rs:49) regardless of chunk size, so track-mode output is invariant to
the chunk width — the staircase semantics live entirely in the scheduler.
"""

from __future__ import annotations

import functools
from typing import Protocol, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from doppler_tpu.ops import codec, nco
from doppler_tpu.ops.phase_plan import NCOState, plan_blocks
from doppler_tpu.runtime import native
from doppler_tpu.runtime import stream as streaming
from doppler_tpu.runtime.telemetry import Counters, get_logger

__all__ = ["Scheduler", "ConstScheduler", "Pipeline"]

log = get_logger("pipeline")


class Scheduler(Protocol):
    """Produces the per-block frequency shift (Hz) for successive blocks.

    ``shifts(block_counts)`` is called once per chunk with the sample count of
    each block about to be processed, in order, and must return one shift per
    block.  Implementations may be stateful (the reference's track loop is —
    its Doppler staircase depends on cumulative sample counts, main.rs:156-183);
    the pipeline guarantees blocks are presented exactly once, in stream order.
    """

    def shifts(self, block_counts: Sequence[int]) -> Sequence[float]: ...


class ConstScheduler:
    """const mode: one fixed shift for the whole stream (main.rs:101-119)."""

    def __init__(self, shift_hz: float):
        self.shift_hz = float(shift_hz)

    def shifts(self, block_counts: Sequence[int]) -> Sequence[float]:
        return [self.shift_hz] * len(block_counts)


@functools.partial(jax.jit, static_argnames=("intype", "outtype"))
def _chunk_kernel(data, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t,
                  *, intype: str, outtype: str):
    """Fused per-chunk device function over a (B, L) block grid."""
    if intype == "i16":
        i, q = codec.i16_words_to_iq(data)
    else:
        i, q = data[..., 0], data[..., 1]
    i, q = nco.mix_blocks(i, q, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t)
    if outtype == "i16":
        return codec.iq_to_i16_words(i, q)
    return jnp.stack([i, q], axis=-1)


@functools.partial(jax.jit, static_argnames=("outtype",))
def _encode_kernel(i, q, *, outtype: str):
    if outtype == "i16":
        return codec.iq_to_i16_words(i, q)
    return jnp.stack([i, q], axis=-1)


class Pipeline:
    """Streaming Doppler corrector.

    Parameters mirror the reference CLI surface (SURVEY §5 config): sample
    rate, input/output IQ dtypes, and a :class:`Scheduler` supplying per-block
    shifts.  ``block_bytes`` defaults to the reference's 8192 so track-mode
    schedules match the reference bit-for-bit; ``chunk_blocks`` controls how
    many such blocks form one device dispatch.
    """

    def __init__(
        self,
        samplerate: int,
        intype: str,
        outtype: str,
        scheduler: Scheduler,
        *,
        block_bytes: int = streaming.REFERENCE_BLOCK_BYTES,
        chunk_blocks: int = 256,
        quantize_ratio_f32: bool = True,
        reset_quirk: bool = True,
        flush_every_chunk: bool = True,
        impl: str = "xla",
        pallas_interpret: bool = False,
        drain_on_eof: bool = False,
        prefetch_chunks: int = 0,
        mesh=None,
        precision: str = "exact",
    ):
        if samplerate <= 0:
            raise ValueError("samplerate must be positive")
        self.samplerate = int(samplerate)
        self.intype = intype
        self.outtype = outtype
        self.scheduler = scheduler
        self.block_bytes = int(block_bytes)
        self.chunk_blocks = int(chunk_blocks)
        self.quantize_ratio_f32 = quantize_ratio_f32
        self.reset_quirk = reset_quirk
        self.flush_every_chunk = flush_every_chunk
        if impl not in ("xla", "pallas"):
            raise ValueError(f"impl must be 'xla' or 'pallas', got {impl!r}")
        self.impl = impl
        self.pallas_interpret = pallas_interpret  # CPU testing of pallas paths
        if precision not in ("exact", "fast"):
            raise ValueError(
                f"precision must be 'exact' or 'fast', got {precision!r}")
        # 'fast' = the 3-pass bf16-split MXU scheme (dot_precision=
        # 'split3', ops/pallas/chain.py): measured +6% on the v5e at ~90 dB
        # vs the exact kernel (≤1 LSB) — far inside the reference's own f32
        # phase-noise bound, but NOT the ≤1-LSB-with-<1%-diffs oracle
        # contract, hence opt-in.  Applies to the unsharded Pallas chain
        # AND cascade kernels; mesh/channels paths keep the exact
        # formulation.
        self.precision = precision
        self._chain_dot = "split3" if precision == "fast" else "highest"
        self.drain_on_eof = drain_on_eof  # flush the FIR tail with zeros at EOF
        self._drained = False  # did THIS run reach EOF and flush the tail?
        self.prefetch_chunks = int(prefetch_chunks)  # staged-read queue depth
        self.nco_state = NCOState()   # the stream's entire resumable DSP state

        self._bps_in = streaming.bytes_per_sample(intype)
        self._bps_out = streaming.bytes_per_sample(outtype)
        if self.block_bytes % self._bps_in != 0:
            raise ValueError(
                f"block_bytes={block_bytes} not a multiple of the "
                f"{intype} sample size {self._bps_in}"
            )
        self.block_samples = self.block_bytes // self._bps_in
        self._sample_offset = 0  # absolute index of next input sample
        self.resampler = None

        # --mesh: shard the chunk over a (channel=1, time=T) device mesh.
        # The device program changes (shard_map + ppermute halos) but the
        # emitted bytes must not: sharded output is byte-identical to the
        # single-device run (tests/test_sharded_pipeline.py pins this).
        self.mesh = mesh
        self._sharded_mix_step = None
        self._sharded_rs_step = None
        self._sharded_chain_step = None
        self._sharded_cascade_step = None
        if mesh is not None:
            if mesh.shape.get("channel", 1) != 1:
                raise ValueError(
                    "single-stream pipeline needs mesh channel=1 "
                    "(use channels mode for channel parallelism)"
                )
            n_time = mesh.shape["time"]
            if self.chunk_blocks % n_time:
                raise ValueError(
                    f"chunk_blocks={self.chunk_blocks} must be divisible by "
                    f"mesh time={n_time}"
                )

    def set_resampler(self, resampler) -> None:
        """Insert a post-mix resampler stage (see ops.resample)."""
        self.resampler = resampler
        self._cascade_w = "unset"          # re-derive cascade geometry
        self._cascade_k = None             # fused-stage count (split point)
        self._cascade_taps = None
        self._cascade_carries = None
        self._cascade_mesh_ok_c = None
        self._sharded_cascade_step = None
        if self.mesh is None:
            return
        if getattr(resampler, "bank", None) is None:
            if not self._cascade_mesh_ok():
                log.warning(
                    "mesh mode: this cascade cannot run the sharded fused "
                    "step (geometry/impl) — resampling runs on the default "
                    "device"
                )
            return
        n_loc = (
            self.chunk_blocks * self.block_samples // self.mesh.shape["time"]
        )
        if resampler.T - 1 > n_loc:
            raise ValueError(
                f"resampler history ({resampler.T - 1} samples) exceeds one "
                f"time shard ({n_loc} samples); use fewer/larger chunks"
            )
        if n_loc * resampler.P >= (1 << 30):
            raise ValueError("time shard too large for 32-bit phase math")

    # -- fused-chain plumbing ------------------------------------------------

    def _chain_eligible(self, total: int) -> bool:
        """May this chunk run the fused Pallas chain kernel?"""
        rs = self.resampler
        if rs is None or self.impl != "pallas":
            return False
        from doppler_tpu.ops.pallas.chain import carry_rows

        L = self.block_samples
        return (
            getattr(rs, "bank", None) is not None  # single-stage only
            and L % 128 == 0
            and 128 % rs.Q == 0
            # FIR history must fit in one block's carry rows
            and carry_rows(rs.T) <= L // 128
            # padded tail chunks would poison the carry with zeros;
            # only the EOF chunk is partial, so this costs nothing
            and total == self.chunk_blocks * L
        )

    def _cascade_eligible(self, total: int) -> bool:
        """May this chunk run the fused Pallas cascade kernel?

        Requires a :class:`~doppler_tpu.ops.multistage.MultiStageResampler`
        and a valid step geometry — checked once and cached.  Two shapes
        (``self._cascade_k`` = number of fused stages):

        - **fully fused** (every stage tiles the 128-lane row,
          ``128 % Q == 0``): one kernel runs mix + all stages + encode.
        - **split** (the final stage's reduced Q doesn't tile — odd Q can
          never divide 128; e.g. 100 Msps → 48 ksps ends in Q=3125): the
          fused kernel runs the heavy ÷2^k front (``final_dense`` dense
          stream rows, f32 planes out) and the final
          :class:`~doppler_tpu.ops.resample.RationalResampler` consumes
          the planes via its XLA ``process`` at 1/2^k of the input rate,
          where even XLA is cheap (VERDICT r3 next #1; reference contract:
          liquid-dsp msresamp arbitrary rates, dsp.rs:25).
        """
        rs = self.resampler
        if (rs is None or self.impl != "pallas"
                or getattr(rs, "stages", None) is None):
            return False
        L = self.block_samples
        if getattr(self, "_cascade_w", "unset") == "unset":
            from doppler_tpu.ops.pallas.chain import (
                front_taps,
                pick_cascade_blocks_per_step,
                split_point,
                taps_shapes,
            )

            self._cascade_w = None
            self._cascade_k = len(rs.stages)
            if L % 128 == 0:
                k = self._cascade_k = split_point(rs.stages)
                if k > 0:
                    dense = k < len(rs.stages)
                    try:
                        shapes = taps_shapes(
                            rs.stages, front_taps(rs.stages, k))
                        self._cascade_w = pick_cascade_blocks_per_step(
                            self.chunk_blocks, L, shapes,
                            final_dense=dense)
                    except ValueError:
                        self._cascade_w = None
        return (
            self._cascade_w is not None
            and total == self.chunk_blocks * L
        )

    def _cascade_mesh_ok(self) -> bool:
        """May ``--mesh`` chunks run the sharded fused cascade step?

        Per-shard geometry must validate at B/n_time blocks, and one block
        must cover every fused stage's carry cone past the zero-history
        corrupt head (the halo-replay bound shared with
        :meth:`_seek_cascade`).  Round 4: odd-Q final stages run their
        fused ÷2^k front sharded too (split — final_dense planes out, the
        XLA tail consumes the gathered planes at 1/2^k rate).
        """
        rs = self.resampler
        if (self.mesh is None or rs is None or self.impl != "pallas"
                or getattr(rs, "stages", None) is None):
            return False
        if getattr(self, "_cascade_mesh_ok_c", None) is None:
            from doppler_tpu.ops.pallas.chain import (
                cascade_replay_need,
                front_taps,
                pick_cascade_blocks_per_step,
                split_point,
                taps_shapes,
                widen_replay_span,
            )

            ok = False
            L = self.block_samples
            n_time = self.mesh.shape["time"]
            k = split_point(rs.stages)
            if (L % 128 == 0 and self.chunk_blocks % n_time == 0
                    and k > 0):
                dense = k < len(rs.stages)
                try:
                    shapes = taps_shapes(rs.stages, front_taps(rs.stages, k))
                    need = cascade_replay_need(
                        rs.stages[:k], self.samplerate)
                    b_loc = self.chunk_blocks // n_time
                    # replay span: the cone in whole blocks, widened until
                    # the step geometry validates (extra real blocks stay
                    # bitwise; the step does the same search)
                    r_h = widen_replay_span(need, L, b_loc, shapes,
                                            final_dense=dense)
                    ok = (
                        pick_cascade_blocks_per_step(
                            b_loc, L, shapes, final_dense=dense)
                        is not None
                        and r_h <= b_loc
                    )
                    if ok:
                        self._cascade_k = k
                except ValueError:
                    ok = False
            self._cascade_mesh_ok_c = ok
        return self._cascade_mesh_ok_c

    def _ensure_cascade_state(self) -> None:
        """Seed fused-stage chain carries/taps (idempotent; reseeds after a
        fallback chunk from each stage's mirrored FIR history).  Covers the
        first ``_cascade_k`` stages — all of them when fully fused, the
        ÷2^k front when split (the XLA tail keeps its own state)."""
        from doppler_tpu.ops.pallas.chain import (
            carry_rows,
            front_taps,
            split_point,
        )

        rs = self.resampler
        k = self._cascade_k
        if k is None:
            # mesh path: _cascade_mesh_ok (not _cascade_eligible) gated the
            # dispatch; derive k with the shared rule instead of assuming
            # fully fused (ADVICE r4: the mesh gate admits split cascades
            # too, and the gates and carry seeding MUST agree on k)
            k = self._cascade_k = split_point(rs.stages)
        dense = k < len(rs.stages)
        if getattr(self, "_cascade_taps", None) is None:
            self._cascade_taps = tuple(
                jnp.asarray(tp) for tp in front_taps(rs.stages, k))
            self._cascade_stages = tuple(
                (st.P, st.Q, st.T) for st in rs.stages[:k])
        if getattr(self, "_cascade_carries", None) is None:
            carries = []
            for st in rs.stages[:k]:
                hbr = carry_rows(st.T)
                flat = np.zeros((2, hbr * 128), dtype=np.float32)
                h = st.T - 1
                if h > 0:
                    flat[0, hbr * 128 - h:] = np.asarray(st._hist_i)
                    flat[1, hbr * 128 - h:] = np.asarray(st._hist_q)
                carries.append(jnp.asarray(flat.reshape(2, hbr, 128)))
            self._cascade_carries = tuple(carries)

    def _advance_cascade_state(self, total: int, carries) -> int:
        """Mirror fused-stage resampler bookkeeping out of the device carries
        (device-lazy) and advance the stream counters.  Returns the sample
        count entering stage ``_cascade_k`` — the final output count when
        fully fused, the fused front's output count when split."""
        rs = self.resampler
        n_in = total
        for st, carry in zip(rs.stages[:self._cascade_k], carries):
            n_out = st.out_count_for(n_in)
            st.m_next += n_out
            st.in_consumed += n_in
            flat = carry.reshape(2, -1)
            h = st.T - 1
            st._hist_i = flat[0, flat.shape[1] - h:]
            st._hist_q = flat[1, flat.shape[1] - h:]
            n_in = n_out
        self._sample_offset += total
        return n_in

    def _ensure_chain_state(self) -> None:
        """Seed the chain carry/taps (idempotent; reseeds after fallback)."""
        from doppler_tpu.ops.pallas.chain import carry_rows, make_chain_taps

        rs = self.resampler
        if getattr(self, "_chain_carry", None) is None:
            # seed the carry from the resampler's FIR history so a
            # checkpoint-restored pipeline resumes bitwise
            hbr = carry_rows(rs.T)
            flat = np.zeros((2, hbr * 128), dtype=np.float32)
            h = rs.T - 1
            if h > 0:
                flat[0, hbr * 128 - h:] = np.asarray(rs._hist_i)
                flat[1, hbr * 128 - h:] = np.asarray(rs._hist_q)
            self._chain_carry = jnp.asarray(flat.reshape(2, hbr, 128))
        if getattr(self, "_chain_taps", None) is None:
            self._chain_taps = jnp.asarray(make_chain_taps(rs.bank, rs.P, rs.Q))

    def _advance_chain_state(self, total: int, carry) -> int:
        """Post-dispatch host bookkeeping shared by the unsharded and
        sharded chain paths: advance the resampler's stream counters and
        mirror the FIR history out of the device carry (device-lazy — no
        sync until a checkpoint materializes it).  Returns n_out."""
        rs = self.resampler
        n_out = rs.out_count_for(total)
        rs.m_next += n_out
        rs.in_consumed += total
        flat = carry.reshape(2, -1)
        rs._hist_i = flat[0, flat.shape[1] - (rs.T - 1):]
        rs._hist_q = flat[1, flat.shape[1] - (rs.T - 1):]
        self._sample_offset += total
        return n_out

    # -- multi-host seek -----------------------------------------------------

    def seek_history_blocks(self) -> int:
        """Raw capture blocks :meth:`seek_to_block` needs as ``history``
        (read them from just before the seek point).  1 for single-stage
        resamplers; for cascades, enough blocks to cover the replay's
        corrupt head + carry cone (heavy rates — e.g. config 5's
        100 Msps → 48 ksps — need several reference blocks)."""
        rs = self.resampler
        if rs is None or rs.T <= 1:
            return 0
        if getattr(rs, "bank", None) is not None:
            return 1
        L = self.block_samples
        if self._cascade_eligible(self.chunk_blocks * L):
            from doppler_tpu.ops.pallas.chain import carry_rows as _cr

            kf = self._cascade_k
            cone = max(
                (_cr(st.T) * 128 if i < kf else st.T - 1)
                * (self.samplerate // st.in_rate)
                for i, st in enumerate(rs.stages)
            )
            return -(-(2 * (rs.T - 1) + cone) // L)
        return -(-(2 * (rs.T - 1)) // L)

    def seek_to_block(self, n_blocks: int, history: bytes | None = None) -> None:
        """Fast-forward a FRESH pipeline to block ``n_blocks`` without
        processing the prefix — the multi-host "distribute = seek" primitive
        (parallel/distributed.py; SURVEY §5 checkpoint/resume).

        Replays the scheduler and the exact NCO-counter emulation over the
        skipped prefix (O(blocks) host work, zero device work, zero
        communication), seeds the resampler's stream counters from
        absolute-index arithmetic, and reconstructs its FIR history by
        mixing ``history`` — the raw bytes of the
        :meth:`seek_history_blocks` blocks ending at ``n_blocks``, read
        straight from the shared capture — through the same per-block
        kernels the stream path uses.  A host seeded this way emits
        exactly the bytes the single-process run emits from that offset
        (tests/test_distributed.py pins this bitwise).
        """
        if n_blocks < 0:
            raise ValueError("n_blocks must be >= 0")
        if self._sample_offset:
            raise ValueError("seek_to_block needs a fresh pipeline")
        L = self.block_samples
        k_h = 0 if history is None else len(history) // self.block_bytes
        # rolling per-block plan tail for the history replay (each history
        # block needs its OWN plan constants)
        tail_fields = None
        done = 0
        while done < n_blocks:
            n = min(self.chunk_blocks, n_blocks - done)
            counts = [L] * n
            shifts = list(self.scheduler.shifts(counts))
            plan = plan_blocks(
                shifts, counts, self.samplerate, self.nco_state, L,
                quantize_f32=self.quantize_ratio_f32,
                reset_quirk=self.reset_quirk,
            )
            if k_h:
                fields = np.stack([
                    np.asarray(getattr(plan, f)) for f in
                    ("d_hi", "d_lo", "c1_hi", "c1_lo", "c2_hi", "c2_lo", "t")
                ])
                tail_fields = (
                    fields if tail_fields is None
                    else np.concatenate([tail_fields, fields], axis=1)
                )[:, -k_h:]
            done += n
        self._sample_offset = n_blocks * L
        rs = self.resampler
        if rs is None:
            return
        if getattr(rs, "bank", None) is None:
            self._seek_cascade(n_blocks, history, tail_fields)
            return
        s_lo = n_blocks * L
        rs.in_consumed = s_lo
        rs.m_next = -(-s_lo * rs.P // rs.Q)
        if rs.T <= 1 or n_blocks == 0:
            return
        if history is None or len(history) < self.block_bytes:
            raise ValueError(
                "seek with a resampler needs the raw bytes of the "
                "preceding full block as history"
            )
        # the single-stage path needs exactly one block — keep the last
        history = history[-self.block_bytes:]
        pa = [tail_fields[fi, -1:] for fi in range(7)]
        h = rs.T - 1
        if self._chain_eligible(self.chunk_blocks * L):
            # replay through a 1-block call of the chain kernel — identical
            # kernel code to the stream path, so the carry is bitwise the
            # virtual previous host's (same trick as the sharded halo replay)
            from doppler_tpu.ops.pallas.chain import (
                carry_rows,
                mix_resample_chain_pallas_stream,
            )

            self._ensure_chain_state()
            if self.intype == "i16":
                flat = np.zeros(L, dtype="<i4")
                flat[:] = codec.bytes_to_i16_words(history)
                staged = flat.reshape(1, L)
            else:
                pairs = codec.bytes_to_f32_pairs(history)
                flat = np.zeros((2, L), dtype="<f4")
                native.f32_pairs_to_planar_into(pairs, flat[0], flat[1])
                staged = flat.reshape(2, 1, L)
            zero_c = jnp.zeros((2, carry_rows(rs.T), 128), jnp.float32)
            _, carry = mix_resample_chain_pallas_stream(
                jnp.asarray(staged),
                *(jnp.asarray(a) for a in pa),
                self._chain_taps, zero_c, P=rs.P, Q=rs.Q, T=rs.T,
                interpret=self.pallas_interpret,
                intype=self.intype, outtype=self.outtype,
            )
            self._chain_carry = carry
            cf = carry.reshape(2, -1)
            rs._hist_i = cf[0, cf.shape[1] - h:]
            rs._hist_q = cf[1, cf.shape[1] - h:]
            return
        # XLA / Pallas-mixer paths: mix the single history block with the
        # same kernel the stream uses (bitwise chunk-width-stable, pinned
        # by the chunked-vs-streaming equality tests)
        use_pallas_mix = self.impl == "pallas" and L % 128 == 0
        if self.intype == "i16":
            flat = np.zeros(L, dtype="<i4")
            flat[:] = codec.bytes_to_i16_words(history)
            staged = flat.reshape(1, L)
        elif use_pallas_mix:
            pairs = codec.bytes_to_f32_pairs(history)
            flat = np.zeros((2, L), dtype="<f4")
            native.f32_pairs_to_planar_into(pairs, flat[0], flat[1])
            staged = flat.reshape(2, 1, L)
        else:
            staged = codec.bytes_to_f32_pairs(history).reshape(1, L, 2)
        if use_pallas_mix:
            from doppler_tpu.ops.pallas.mixer import mix_blocks_pallas_fmt

            out = mix_blocks_pallas_fmt(
                jnp.asarray(staged), *(jnp.asarray(a) for a in pa),
                intype=self.intype, outtype="f32",
                interpret=self.pallas_interpret,
            )
            planes = out.reshape(2, -1)
            mi, mq = planes[0], planes[1]
        else:
            out = _chunk_kernel(
                jnp.asarray(staged), *(jnp.asarray(a) for a in pa),
                intype=self.intype, outtype="f32",
            )
            flat_out = out.reshape(-1, 2)
            mi, mq = flat_out[:, 0], flat_out[:, 1]
        rs._hist_i = mi[L - h:]
        rs._hist_q = mq[L - h:]

    def _seek_cascade(self, n_blocks: int, history: bytes | None,
                      tail_fields) -> None:
        """Cascade arm of :meth:`seek_to_block`: reconstruct every stage's
        FIR history from the raw history blocks (``tail_fields`` carries
        their per-block plan constants, (7, k_h)).

        The replay starts each stage with zero history, so its first
        ``rs.T − 1`` input-referred samples are corrupted — but each stage's
        carry depends only on the block's tail (carry cone =
        ``carry_rows·128`` samples at the stage rate, input-referred ≤
        ``HBR_s·128·ratio_s + rs.T − 1``), so one block suffices whenever
        the cone and the corrupt head don't overlap (checked).  The replay
        runs the same program the stream will run — the fused cascade kernel
        when eligible (carries bitwise by W-invariance), else the XLA
        cascade's own ``process`` (bitwise by its chunk-width stability) —
        so a seeked host emits exactly the single-process bytes
        (tests/test_distributed.py).
        """
        rs = self.resampler
        L = self.block_samples
        s_lo = n_blocks * L
        n_in = s_lo
        counters = []
        for st in rs.stages:
            n_out = -(-n_in * st.P // st.Q)
            counters.append((n_in, n_out))
            n_in = n_out
        if rs.T <= 1 or n_blocks == 0:
            for st, (c_in, c_out) in zip(rs.stages, counters):
                st.in_consumed = c_in
                st.m_next = c_out
            return
        if (history is None or len(history) < self.block_bytes
                or len(history) % self.block_bytes):
            raise ValueError(
                "seek with a resampler needs whole raw capture blocks as "
                "history (see seek_history_blocks)"
            )
        from doppler_tpu.ops.pallas.chain import carry_rows as _cr

        k_h = min(len(history) // self.block_bytes, tail_fields.shape[1])
        history = history[-k_h * self.block_bytes:]
        tail = tail_fields[:, -k_h:]
        total_1 = self.chunk_blocks * L
        if self._cascade_eligible(total_1):
            # FUSED replay bound (ADVICE r3: per the path actually taken):
            # the zero-history corrupt head plus every stage's carry cone
            # must fit inside the replayed real blocks.  Fused stages need
            # whole 128-row carries; XLA-tail stages (split cascade) only
            # their T−1 input-referred samples.
            kf = self._cascade_k
            cone = max(
                (_cr(st.T) * 128 if i < kf else st.T - 1)
                * (self.samplerate // st.in_rate)
                for i, st in enumerate(rs.stages)
            )
            if k_h * L < 2 * (rs.T - 1) + cone:
                raise ValueError(
                    f"history ({k_h} blocks = {k_h * L} samples) too short "
                    f"to reconstruct the cascade's state (needs ≥ "
                    f"{2 * (rs.T - 1) + cone}; see seek_history_blocks)"
                )
            from doppler_tpu.ops.pallas.chain import (
                mix_cascade_pallas_stream,
            )

            self._ensure_cascade_state()
            # Replay through the chunk's own validated step geometry
            # (blocks_per_step = _cascade_w), zero-prepadding to whole
            # steps with the real blocks LAST (ADVICE r3 medium: small-B
            # geometry need not validate).  Zero prefix blocks mix to
            # exact zeros, so each stage's carry — the last HBR rows of
            # its input, inside the real span by the cone bound above —
            # is bitwise what the stream held entering block ``n_blocks``.
            W_r = self._cascade_w
            B_r = W_r * (-(-k_h // W_r))
            if self.intype == "i16":
                flat = np.zeros((B_r, L), dtype="<i4")
                words = codec.bytes_to_i16_words(history)
                flat[B_r - k_h:] = words.reshape(k_h, L)
                staged = flat
            else:
                pairs = codec.bytes_to_f32_pairs(history)
                flat = np.zeros((2, B_r, L), dtype="<f4")
                tgt = flat[:, B_r - k_h:].reshape(2, k_h * L)
                native.f32_pairs_to_planar_into(pairs, tgt[0], tgt[1])
                flat[:, B_r - k_h:] = tgt.reshape(2, k_h, L)
                staged = flat
            plans_r = np.zeros((7, B_r), dtype=np.uint32)
            plans_r[:, B_r - k_h:] = tail
            zeros = tuple(
                jnp.zeros_like(c) for c in self._cascade_carries
            )
            k = len(self._cascade_stages)
            split = k < len(rs.stages)
            out, carries = mix_cascade_pallas_stream(
                jnp.asarray(staged),
                *(jnp.asarray(plans_r[fi]) for fi in range(7)),
                self._cascade_taps, zeros, stages=self._cascade_stages,
                blocks_per_step=W_r, interpret=self.pallas_interpret,
                intype=self.intype,
                outtype="f32" if split else self.outtype,
                final_dense=split,
            )
            self._cascade_carries = carries
            for st, carry, (c_in, c_out) in zip(rs.stages, carries, counters):
                flat_c = carry.reshape(2, -1)
                h = st.T - 1
                st._hist_i = flat_c[0, flat_c.shape[1] - h:]
                st._hist_q = flat_c[1, flat_c.shape[1] - h:]
                st.in_consumed = c_in
                st.m_next = c_out
            if split:
                # XLA-tail stages: run the real blocks' front planes through
                # the same ``process`` the stream's tail runs — it leaves
                # each tail stage holding exactly the stream's FIR history
                # (chunk-width stability), then pin the absolute counters
                planes = out.reshape(2, B_r, -1)[:, B_r - k_h:]
                yi = planes[0].reshape(-1)
                yq = planes[1].reshape(-1)
                n_val = yi.shape[-1]
                for st, (c_in, c_out) in zip(rs.stages[k:], counters[k:]):
                    cap = int(yi.shape[-1])
                    yi, yq, n_val = st.process(yi, yq, n_val,
                                               M=st.max_out_for(cap))
                    st.in_consumed = c_in
                    st.m_next = c_out
            return
        # XLA replay bound: each stage only needs its T−1 input-referred
        # history past the corrupt head — no 128-row carry padding
        if k_h * L < 2 * (rs.T - 1):
            raise ValueError(
                f"history ({k_h} blocks = {k_h * L} samples) too short to "
                f"reconstruct the cascade's state (needs ≥ "
                f"{2 * (rs.T - 1)}; see seek_history_blocks)"
            )
        # XLA cascade: mix the history blocks with the stream's mixer, then
        # run them through the (fresh) cascade — its chunk-width-stable
        # ``process`` leaves each stage holding exactly the stream's history
        use_pallas_mix = self.impl == "pallas" and L % 128 == 0
        if self.intype == "i16":
            staged = np.asarray(
                codec.bytes_to_i16_words(history)).reshape(k_h, L)
        elif use_pallas_mix:
            pairs = codec.bytes_to_f32_pairs(history)
            flat = np.zeros((2, k_h * L), dtype="<f4")
            native.f32_pairs_to_planar_into(pairs, flat[0], flat[1])
            staged = flat.reshape(2, k_h, L)
        else:
            staged = codec.bytes_to_f32_pairs(history).reshape(k_h, L, 2)
        pa = [tail[fi] for fi in range(7)]
        if use_pallas_mix:
            from doppler_tpu.ops.pallas.mixer import mix_blocks_pallas_fmt

            out = mix_blocks_pallas_fmt(
                jnp.asarray(staged), *(jnp.asarray(a) for a in pa),
                intype=self.intype, outtype="f32",
                interpret=self.pallas_interpret,
            )
            planes = out.reshape(2, -1)
            mi, mq = planes[0], planes[1]
        else:
            out = _chunk_kernel(
                jnp.asarray(staged), *(jnp.asarray(a) for a in pa),
                intype=self.intype, outtype="f32",
            )
            flat_out = out.reshape(-1, 2)
            mi, mq = flat_out[:, 0], flat_out[:, 1]
        rs.process(mi, mq, k_h * L)
        for st, (c_in, c_out) in zip(rs.stages, counters):
            st.in_consumed = c_in
            st.m_next = c_out

    # -- staging ------------------------------------------------------------

    def _stage_in(self, data: bytes, total_samples: int, planar: bool = False):
        """Raw chunk bytes → fixed-shape device-ready array.

        i16 → packed int32 words ``(B, L)``; f32 → interleaved ``(B, L, 2)``
        for the XLA path, or planar ``(2, B, L)`` (``planar=True``) for the
        Pallas kernel, which wants I/Q on separate dense lanes.
        """
        B, L = self.chunk_blocks, self.block_samples
        if self.intype == "i16":
            flat = np.zeros(B * L, dtype="<i4")
            words = codec.bytes_to_i16_words(data)
            flat[: words.size] = words
            return flat.reshape(B, L)
        pairs = codec.bytes_to_f32_pairs(data)
        if planar:
            flat = np.zeros((2, B * L), dtype="<f4")
            native.f32_pairs_to_planar_into(pairs, flat[0], flat[1])
            return flat.reshape(2, B, L)
        flat = np.zeros((B * L, 2), dtype="<f4")
        flat[: pairs.shape[0]] = pairs
        return flat.reshape(B, L, 2)

    def _stage_out(self, out, total_samples: int, planar: bool = False) -> bytes:
        if self.outtype == "i16":
            flat = np.asarray(out).reshape(-1)
            return codec.i16_words_to_bytes(flat[:total_samples])
        if planar:
            planes = np.asarray(out).reshape(2, -1)
            pairs = native.planar_to_f32_pairs(
                planes[0, :total_samples], planes[1, :total_samples]
            )
            return codec.f32_pairs_to_bytes(pairs)
        flat = np.asarray(out).reshape(-1, 2)
        return codec.f32_pairs_to_bytes(flat[:total_samples])

    # -- main loop ----------------------------------------------------------

    def process_chunk(self, chunk: streaming.Chunk) -> bytes:
        """Process one chunk of blocks synchronously; returns output bytes."""
        return self._finalize(self._dispatch(chunk))

    def _finalize(self, pending) -> bytes:
        """Materialize a dispatched chunk's bytes (blocks on the device)."""
        if pending is None:
            return b""
        if isinstance(pending[0], str) and pending[0] == "sharded_rs":
            # (tag, (1, n_time, M_max[, 2]) device array, per-shard counts)
            _, out, out_counts = pending
            arr = np.asarray(out)
            if self.outtype == "i16":
                parts = [arr[0, k, :c] for k, c in enumerate(out_counts)]
                return codec.i16_words_to_bytes(np.concatenate(parts))
            parts = [arr[0, k, :c, :] for k, c in enumerate(out_counts)]
            return codec.f32_pairs_to_bytes(np.concatenate(parts))
        out, n_valid, planar = pending
        return self._stage_out(out, n_valid, planar=planar)

    def _dispatch(self, chunk: streaming.Chunk):
        """Plan + launch one chunk on the device WITHOUT waiting for it.

        Returns an opaque pending handle for :meth:`_finalize`.  All host
        state (scheduler, NCO counter, resampler bookkeeping) advances here,
        so the next chunk can be dispatched while this one computes —
        one-chunk-deep software pipelining of host staging vs device work.
        """
        counts = [size // self._bps_in for size in chunk.block_sizes]
        total = sum(counts)
        if total == 0:
            # still advance the scheduler for empty tail blocks
            if counts:
                self.scheduler.shifts(counts)
            return None
        shifts = list(self.scheduler.shifts(counts))
        assert len(shifts) == len(counts)

        B = self.chunk_blocks
        plan = plan_blocks(
            shifts, counts, self.samplerate, self.nco_state, self.block_samples,
            quantize_f32=self.quantize_ratio_f32, reset_quirk=self.reset_quirk,
        )
        pad = B - len(counts)
        arrs = [plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
                plan.c2_hi, plan.c2_lo, plan.t]
        if pad:
            arrs = [np.pad(a, (0, pad)) for a in arrs]

        if self.mesh is not None:
            return self._dispatch_sharded(chunk, arrs, total)
        return self._dispatch_local(chunk, arrs, total)

    def _dispatch_local(self, chunk: streaming.Chunk, arrs, total: int):
        """Single-device chunk dispatch — also the mesh pipeline's fallback
        for partial EOF chunks and cascades, so fallback chunks run the
        EXACT program (incl. the Pallas-vs-XLA mixer choice) the unsharded
        pipeline runs, keeping mesh output byte-identical."""
        B = self.chunk_blocks
        mix_outtype = self.outtype if self.resampler is None else "f32"
        L = self.block_samples
        rs = self.resampler
        use_pallas_mix = self.impl == "pallas" and L % 128 == 0
        staged = self._stage_in(
            chunk.data, total,
            planar=use_pallas_mix and self.intype == "f32",
        )
        chain_ok = self._chain_eligible(total)
        if chain_ok:
            from doppler_tpu.ops.pallas.chain import (
                mix_resample_chain_pallas_stream,
            )

            self._ensure_chain_state()
            taps = self._chain_taps
            out, self._chain_carry = mix_resample_chain_pallas_stream(
                jnp.asarray(staged), *(jnp.asarray(a) for a in arrs),
                taps, self._chain_carry, P=rs.P, Q=rs.Q, T=rs.T,
                interpret=self.pallas_interpret,
                intype=self.intype, outtype=self.outtype,
                dot_precision=self._chain_dot,
            )
            n_out = self._advance_chain_state(total, self._chain_carry)
            return (out, n_out, self.outtype == "f32")

        if self._cascade_eligible(total):
            from doppler_tpu.ops.pallas.chain import mix_cascade_pallas_stream

            self._ensure_cascade_state()
            k = len(self._cascade_stages)
            split = k < len(rs.stages)
            out, self._cascade_carries = mix_cascade_pallas_stream(
                jnp.asarray(staged), *(jnp.asarray(a) for a in arrs),
                self._cascade_taps, self._cascade_carries,
                stages=self._cascade_stages,
                blocks_per_step=self._cascade_w,
                interpret=self.pallas_interpret,
                intype=self.intype,
                outtype="f32" if split else self.outtype,
                final_dense=split,
                # cascade measured exact == split3 (10.90 vs 10.93 GS/s
                # best-of-10 interleaved, tools/probe_cascade_precision.py:
                # the per-stage operand split repeats while the pass
                # savings concentrate in stage 1) — so 'fast' keeps the
                # exact formulation here and pays nothing
                dot_precision="highest",
            )
            n_mid = self._advance_cascade_state(total, self._cascade_carries)
            if not split:
                return (out, n_mid, self.outtype == "f32")
            # split cascade: the fused front's dense f32 planes feed the
            # final rational stage's XLA ``process`` at 1/2^k of the input
            # rate — its own streaming state composes checkpoint/seek
            planes = out.reshape(2, -1)
            yi, yq, n_out = planes[0], planes[1], n_mid
            for st in rs.stages[k:]:
                cap = int(yi.shape[-1])
                yi, yq, n_out = st.process(yi, yq, n_out,
                                           M=st.max_out_for(cap))
            enc = _encode_kernel(yi, yq, outtype=self.outtype)
            return (enc, n_out, False)

        mix_planar = False
        if use_pallas_mix:
            from doppler_tpu.ops.pallas.mixer import mix_blocks_pallas_fmt

            out = mix_blocks_pallas_fmt(
                jnp.asarray(staged), *(jnp.asarray(a) for a in arrs),
                intype=self.intype, outtype=mix_outtype,
                interpret=self.pallas_interpret,
            )
            mix_planar = mix_outtype == "f32"
        else:
            out = _chunk_kernel(
                jnp.asarray(staged),
                *(jnp.asarray(a) for a in arrs),
                intype=self.intype,
                outtype=mix_outtype,
            )
        self._sample_offset += total
        if self.resampler is None:
            return (out, total, mix_planar)

        if mix_planar:
            planes = out.reshape(2, -1)
            mi, mq = planes[0], planes[1]
        else:
            flat = out.reshape(-1, 2)
            mi, mq = flat[:, 0], flat[:, 1]
        yi, yq, n_out = self.resampler.process(
            mi, mq, total,
            M=self.resampler.max_out_for(B * self.block_samples),
        )
        # any future pallas-chain/cascade chunk must reseed from rs history
        self._chain_carry = None
        self._cascade_carries = None
        enc = _encode_kernel(yi, yq, outtype=self.outtype)
        return (enc, n_out, False)

    def _dispatch_sharded(self, chunk: streaming.Chunk, arrs, total: int):
        """--mesh chunk dispatch: shard_map steps over the (1, time) mesh.

        Full chunks with a single-stage resampler run the fused sharded
        stream step (mix + ppermute halo + window_dot per shard); mix-only
        streams run the sharded mix step for every chunk.  The partial EOF
        chunk — and multi-stage cascades — take the single-device path,
        seeded with the mesh-maintained history, so the emitted bytes stay
        identical to an unsharded run.
        """
        from jax.sharding import NamedSharding, PartitionSpec as Spec

        from doppler_tpu.parallel.sharded import (
            make_wideband_mix_step,
            make_wideband_stream_step,
            stream_step_alignment,
        )

        B, L = self.chunk_blocks, self.block_samples
        rs = self.resampler
        n_time = self.mesh.shape["time"]
        chain_ok = self._chain_eligible(total)
        cascade_ok = (self._cascade_mesh_ok()
                      and total == self.chunk_blocks * self.block_samples)
        planar_in = (chain_ok or cascade_ok) and self.intype == "f32"
        staged = self._stage_in(chunk.data, total, planar=planar_in)
        if planar_in:
            data_spec = Spec(None, "time", None)   # (2, B, L) planes
        elif self.intype == "i16":
            data_spec = Spec("time", None)
        else:
            data_spec = Spec("time", None, None)
        data = jax.device_put(
            jnp.asarray(staged), NamedSharding(self.mesh, data_spec)
        )
        plan_sh = NamedSharding(self.mesh, Spec("channel", "time"))
        plans = [jax.device_put(jnp.asarray(a)[None], plan_sh) for a in arrs]

        if rs is None:
            if self._sharded_mix_step is None:
                self._sharded_mix_step = make_wideband_mix_step(
                    self.mesh, intype=self.intype, outtype=self.outtype, C=1
                )
            out = self._sharded_mix_step(data, *plans)
            self._sample_offset += total
            return (out, total, False)

        if chain_ok:
            # --impl pallas: per-shard device program IS the fused chain
            # kernel (ppermute halo-block replay carries the FIR state) —
            # the sharded run keeps the unsharded per-chip rate AND its
            # bytes (tests/test_sharded_pipeline.py::test_mesh_pallas_*)
            from doppler_tpu.parallel.sharded import make_chain_stream_step

            if self._sharded_chain_step is None:
                self._sharded_chain_step = make_chain_stream_step(
                    self.mesh, resampler=rs, interpret=self.pallas_interpret,
                    intype=self.intype, outtype=self.outtype,
                )
            self._ensure_chain_state()
            repl = NamedSharding(self.mesh, Spec())
            carry = jax.device_put(jnp.asarray(self._chain_carry), repl)
            taps = jax.device_put(jnp.asarray(self._chain_taps), repl)
            out, carries = self._sharded_chain_step(data, *plans, carry, taps)
            self._chain_carry = carries[-1]
            n_out = self._advance_chain_state(total, self._chain_carry)
            return (out, n_out, self.outtype == "f32")

        if cascade_ok:
            # sharded fused cascade: per-stage halo-block replay (round 3;
            # round 4 adds the SPLIT form — sharded ÷2^k front, XLA tail)
            from doppler_tpu.parallel.sharded import make_cascade_stream_step

            self._ensure_cascade_state()
            k = len(self._cascade_stages)
            split = k < len(rs.stages)
            if self._sharded_cascade_step is None:
                self._sharded_cascade_step = make_cascade_stream_step(
                    self.mesh, resampler=rs, taps=self._cascade_taps,
                    stages=self._cascade_stages,
                    interpret=self.pallas_interpret,
                    intype=self.intype,
                    outtype="f32" if split else self.outtype,
                    final_dense=split,
                )
            repl = NamedSharding(self.mesh, Spec())
            carries = [jax.device_put(jnp.asarray(c), repl)
                       for c in self._cascade_carries]
            out, *carries_nt = self._sharded_cascade_step(
                data, *plans, *carries)
            self._cascade_carries = tuple(c[-1] for c in carries_nt)
            n_mid = self._advance_cascade_state(total, self._cascade_carries)
            if not split:
                return (out, n_mid, self.outtype == "f32")
            planes = out.reshape(2, -1)
            yi, yq, n_out = planes[0], planes[1], n_mid
            for st in rs.stages[k:]:
                cap = int(yi.shape[-1])
                yi, yq, n_out = st.process(yi, yq, n_out,
                                           M=st.max_out_for(cap))
            enc = _encode_kernel(yi, yq, outtype=self.outtype)
            return (enc, n_out, False)

        if getattr(rs, "bank", None) is not None and total == B * L:
            if self._sharded_rs_step is None:
                self._sharded_rs_step = make_wideband_stream_step(
                    self.mesh, intype=self.intype, outtype=self.outtype,
                    C=1, resampler=rs,
                )
            rem, off, out_counts = stream_step_alignment(
                rs, rs.in_consumed, B * L // n_time, n_time
            )
            hist_sh = NamedSharding(self.mesh, Spec("channel", None))
            hist_i = jax.device_put(
                jnp.asarray(rs._hist_i).reshape(1, -1), hist_sh
            )
            hist_q = jax.device_put(
                jnp.asarray(rs._hist_q).reshape(1, -1), hist_sh
            )
            out, tail_i, tail_q = self._sharded_rs_step(
                data, *plans, hist_i, hist_q,
                jnp.asarray(rem), jnp.asarray(off),
            )
            rs.m_next += sum(out_counts)
            rs.in_consumed += total
            rs._hist_i = tail_i[0, -1]
            rs._hist_q = tail_q[0, -1]
            self._sample_offset += total
            return ("sharded_rs", out, out_counts)

        # partial EOF chunk (or cascade): run the unsharded dispatch — the
        # exact program (incl. mixer-kernel choice) the meshless pipeline
        # runs, seeded with the mesh-maintained history
        self._chain_carry = None   # next chain chunk reseeds from rs history
        return self._dispatch_local(chunk, arrs, total)

    def run(self, fin, fout, should_stop=None) -> Counters:
        """Pump ``fin`` → ``fout`` until EOF (short read), reference framing.

        ``should_stop``: optional callable polled between chunks — a graceful
        stop leaves the pipeline state consistent with the bytes written, so
        a checkpoint taken afterwards resumes exactly (no torn chunks).
        """
        reader = streaming.BlockReader(fin, self.block_bytes)
        if self.prefetch_chunks > 0:
            reader = streaming.ChunkPrefetcher(
                reader, self.chunk_blocks, depth=self.prefetch_chunks
            )
        counters = Counters()

        def emit(pending, bytes_in, blocks):
            out_bytes = self._finalize(pending)
            if out_bytes:
                fout.write(out_bytes)
                if self.flush_every_chunk:
                    fout.flush()
            counters.add(
                samples=len(out_bytes) // self._bps_out,
                bytes_in=bytes_in,
                bytes_out=len(out_bytes),
                blocks=blocks,
            )

        # one-chunk-deep pipelining: dispatch chunk k+1 while k materializes
        pending = None
        pending_meta = (0, 0)
        hit_eof = False
        while True:
            if should_stop is not None and should_stop():
                break
            chunk = reader.read_chunk(self.chunk_blocks)
            new_pending = self._dispatch(chunk)
            if pending is not None or pending_meta[1]:
                emit(pending, *pending_meta)
            pending = new_pending
            pending_meta = (len(chunk.data), chunk.n_blocks)
            if chunk.eof:
                hit_eof = True
                break
        emit(pending, *pending_meta)
        # drain ONLY on a true EOF exit: a should_stop (signal) break is a
        # mid-stream pause — flushing the FIR tail there would corrupt the
        # output and poison the checkpoint (round-5 review find)
        if hit_eof and self.resampler is not None and self.drain_on_eof:
            out_bytes = self._drain()
            self._drained = True   # checkpointed: a resumed run must not
            if out_bytes:          # append the FIR tail a second time
                fout.write(out_bytes)
                counters.add(
                    samples=len(out_bytes) // self._bps_out,
                    bytes_in=0, bytes_out=len(out_bytes), blocks=0,
                )
        fout.flush()
        return counters

    def _drain(self) -> bytes:
        """Flush the resampler's FIR tail by feeding T−1 zero samples —
        emits the outputs whose windows straddle the end of the stream
        (the reference ecosystem's liquid-dsp flush semantics)."""
        rs = self.resampler
        pad = rs.T - 1
        if pad <= 0:
            return b""
        zeros = np.zeros(pad, dtype=np.float32)
        yi, yq, n_out = rs.process(zeros, zeros, pad, M=rs.max_out_for(pad))
        if n_out == 0:
            return b""
        enc = _encode_kernel(yi, yq, outtype=self.outtype)
        return self._stage_out(enc, n_out)
