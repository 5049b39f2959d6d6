#!/usr/bin/env python
"""Single-chip benchmark: fused decode → NCO mix → polyphase resample → encode.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N/fs}

``vs_baseline`` is the realtime margin at the MODE'S OWN input rate (the
reference's implied requirement is 1× realtime at its capture rate —
1.024 Msps for the config-3 shapes, 100 Msps for the config-5 split
modes; review r5: a flat /1.024e6 overstated the split modes ~98×).
It remains the speedup over the reference binary's implied realtime
requirement — sustaining the documented 1.024 Msps rtl_fm pipeline on one CPU
core (BASELINE.md; reference README.md:53).  The workload mirrors BASELINE
config 3: i16 IQ at 1.024 Msps, per-block Doppler schedule, 3/64 polyphase
decimation to 48 ksps, i16 output.  Runs on the default backend (the real TPU
chip under the driver; pass --platform cpu to force CPU).
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["default", "cpu"], default="default")
    ap.add_argument(
        "--mode",
        choices=["chain", "chain-pallas", "chain-mesh", "cascade-pallas",
                 "split-pallas", "split-xla", "channels-split",
                 "mix", "mix-pallas", "channels", "channels-pallas"],
        default="chain-pallas",
        help="default chain-pallas: the BASELINE primary metric (NCO mix + "
             "polyphase resample per chip, config-3 shape) on the fused "
             "Mosaic kernel — compiles in well under the bench timeout even "
             "cold (the persistent cache makes repeats instant); mix-pallas "
             "is the mixer-only secondary; XLA-graph modes (chain/mix/"
             "channels) can take 5-10 min to compile the first time",
    )
    ap.add_argument("--channels", type=int, default=16,
                    help="channel count for --mode channels (config 4)")
    ap.add_argument("--mesh-time", type=int, default=0,
                    help="time-shard width for --mode chain-mesh "
                         "(0 = all visible devices)")
    ap.add_argument("--mesh-scan", action="store_true",
                    help="chain-mesh: measure every power-of-two width up "
                         "to --mesh-time and report per-chip efficiency "
                         "vs time=1 (the BASELINE scaling-efficiency row)")
    ap.add_argument("--samples", type=int, default=1 << 25)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--precision", choices=["exact", "fast"], default="exact",
                    help="chain-pallas / channels-pallas: 'fast' = the "
                         "3-pass bf16-split MXU scheme (~90 dB vs exact; "
                         "+6%% chain, +8%% channel-batched, measured)")
    ap.add_argument(
        "--dispatches", type=int, default=64,
        help="kernel dispatches per timed iteration (steady-state streaming "
             "measurement: the host-sync round trip is paid once per "
             "iteration, matching the production pipeline's async dispatch; "
             "1 recovers the single-dispatch latency measurement)",
    )
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the timed loop")
    args = ap.parse_args()

    if args.platform == "cpu" and "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        # fake devices so --mode chain-mesh can scan widths on CPU
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    # persistent compile cache: first-touch XLA/Mosaic compiles through this
    # image's remote-compile path take minutes; warm runs then start instantly
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from doppler_tpu.ops import codec, nco
    from doppler_tpu.ops.phase_plan import NCOState, plan_blocks
    from doppler_tpu.ops.resample import (
        RationalResampler,
        make_taps_matrix,
        resample_conv_block,
    )

    dev = jax.devices()[0]
    print(f"bench device: {dev}", file=sys.stderr)

    fs = 1024000
    if args.mode.startswith("split") or args.mode == "channels-split":
        # BASELINE config 5's literal rate: 100 Msps → 48 ksps factors as
        # ÷16 → ÷16 → 384/3125 — the split-cascade showcase (fused ÷256
        # front, XLA rational tail at 390.625 ksps)
        fs = 100_000_000
    L = 8192
    per_stream = args.samples
    if args.mode.startswith("channels"):
        per_stream = max(L, args.samples // args.channels)
    B = max(1, per_stream // L)
    N = B * L
    total_samples = N * (
        args.channels if args.mode.startswith("channels") else 1
    )
    split_mode = args.mode.startswith("split") or args.mode == "channels-split"
    # the split modes use MultiStageResampler geometry exclusively — the
    # single-stage design at 100 Msps is a ~100k-tap Kaiser build they never
    # touch (review r5: dead startup work)
    rs = None if split_mode else RationalResampler(fs, 48000)
    assert split_mode or N % rs.Q == 0

    rng = np.random.default_rng(0xBE)
    words = rng.integers(-(1 << 31), (1 << 31), size=(B, L), dtype=np.int64).astype(
        np.int32
    )
    shifts = [9000.0 - 0.01 * k for k in range(B)]
    plan = plan_blocks(shifts, [L] * B, fs, NCOState(), L)
    plan_arrs = [
        jax.device_put(jnp.asarray(a))
        for a in (plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
                  plan.c2_hi, plan.c2_lo, plan.t)
    ]
    data = jax.device_put(jnp.asarray(words))
    if args.mode in ("chain", "channels"):
        # the XLA banded-matmul modes are the only taps_mat consumers
        taps_mat = jax.device_put(
            jnp.asarray(make_taps_matrix(rs.bank, rs.P, rs.Q))
        )
        H = rs.T - 1

    if args.mode == "mix":

        @jax.jit
        def step(data, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t):
            i, q = codec.i16_words_to_iq(data)
            i, q = nco.mix_blocks(i, q, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t)
            return codec.iq_to_i16_words(i, q)

        metric = "nco_mix_i16_samples_per_s_chip"
    elif args.mode == "mix-pallas":
        from doppler_tpu.ops.pallas.mixer import mix_blocks_pallas as step

        metric = "nco_mix_pallas_i16_samples_per_s_chip"
    elif args.mode == "chain-pallas":
        from doppler_tpu.ops.pallas.chain import (
            carry_rows,
            make_chain_taps,
            mix_resample_chain_pallas_stream,
        )

        chain_taps = jax.device_put(
            jnp.asarray(make_chain_taps(rs.bank, rs.P, rs.Q))
        )
        carry0 = jax.device_put(
            jnp.zeros((2, carry_rows(rs.T), 128), jnp.float32))
        dot_prec = "split3" if args.precision == "fast" else "highest"
        interp_cp = args.platform == "cpu"

        def step(data, *plan):
            out, _ = mix_resample_chain_pallas_stream(
                data, *plan, chain_taps, carry0, P=rs.P, Q=rs.Q, T=rs.T,
                dot_precision=dot_prec, interpret=interp_cp,
            )
            return out

        metric = ("mix_resample_chain_pallas_i16_samples_per_s_chip"
                  if args.precision == "exact" else
                  "mix_resample_chain_fast_i16_samples_per_s_chip")
    elif args.mode == "cascade-pallas":
        # fully fused multi-stage cascade (halfbands + final rational) —
        # the arbitrary-heavy-decimation answer: intermediates never leave
        # VMEM, traffic = 4 + 4·P/Q B/sample like the single-stage chain
        from doppler_tpu.ops.multistage import MultiStageResampler
        from doppler_tpu.ops.pallas.chain import (
            carry_rows,
            make_chain_taps,
            mix_cascade_pallas_stream,
        )

        ms = MultiStageResampler(fs, 48000)
        nst = len(ms.stages)
        stages_cfg = tuple((st.P, st.Q, st.T) for st in ms.stages)
        casc_taps = tuple(
            jax.device_put(jnp.asarray(make_chain_taps(
                st.bank, st.P, st.Q,
                pp=(st.P if i < nst - 1 else None))))
            for i, st in enumerate(ms.stages)
        )
        casc_carries = tuple(
            jax.device_put(jnp.zeros((2, carry_rows(st.T), 128), jnp.float32))
            for st in ms.stages
        )
        print("cascade stages: "
              + " -> ".join(f"{st.P}/{st.Q}(T={st.T})" for st in ms.stages),
              file=sys.stderr)

        interp_cc = args.platform == "cpu"

        def step(data, *plan):
            out, _ = mix_cascade_pallas_stream(
                data, *plan, casc_taps, casc_carries, stages=stages_cfg,
                interpret=interp_cc)
            return out

        metric = "mix_cascade_pallas_i16_samples_per_s_chip"
    elif args.mode in ("split-pallas", "split-xla"):
        # SPLIT cascade on an odd-Q rate (6.25 Msps → 48 ksps = ÷16 then
        # 384/3125): fused Pallas ÷16 front emitting f32 planes + the final
        # rational stage via the XLA banded-matmul conv at 1/16 rate —
        # vs the all-XLA cascade twin (split-xla), the round-3 fallback
        # this path replaces (VERDICT r3 next #1 done-criterion: ≥4×).
        from doppler_tpu.ops.multistage import MultiStageResampler
        from doppler_tpu.ops.pallas.chain import (
            carry_rows,
            make_chain_taps,
            mix_cascade_pallas_stream,
        )
        from doppler_tpu.ops.resample import (
            conv_stream_geometry,
            resample_conv_stream,
        )

        ms = MultiStageResampler(fs, 48000)
        k = len(ms.stages) - 1               # fused front = integer stages
        front = ms.stages[:k]
        fin = ms.stages[-1]
        assert fin.Q % 2 == 1, "split bench wants an odd-Q final stage"
        print("split stages: "
              + " -> ".join(f"{st.P}/{st.Q}(T={st.T})" for st in ms.stages)
              + f"  (front {k} fused, tail XLA)", file=sys.stderr)
        stages_cfg = tuple((st.P, st.Q, st.T) for st in front)
        front_taps = tuple(
            jax.device_put(jnp.asarray(
                make_chain_taps(st.bank, st.P, st.Q, pp=st.P)))
            for st in front
        )
        zc = tuple(
            jnp.zeros((2, carry_rows(st.T), 128), jnp.float32)
            for st in front
        )
        ratio = 1
        for st in front:
            ratio *= st.Q
        n_mid = N // ratio
        h_f = fin.T - 1
        m_fin = n_mid * fin.P // fin.Q
        start0, p0, Kc, PADZ, TAIL = conv_stream_geometry(
            0, 0, m_fin, n_mid, P=fin.P, Q=fin.Q, T=fin.T)
        fin_taps = jax.device_put(jnp.asarray(
            make_taps_matrix(fin.bank, fin.P, fin.Q)))

        def _tail(planes):
            flat = planes.reshape(2, -1)
            zeros = jnp.zeros((2, h_f), jnp.float32)
            x = jnp.concatenate([zeros, flat], axis=-1)
            yi, yq = resample_conv_stream(
                x[0], x[1], fin_taps, jnp.int32(start0), jnp.int32(p0),
                P=fin.P, Q=fin.Q, T=fin.T, K=Kc, M=m_fin,
                PADZ=PADZ, TAIL=TAIL,
            )
            return codec.iq_to_i16_words(yi, yq)

        if args.mode == "split-pallas":
            interp_split = args.platform == "cpu"

            @jax.jit
            def step(data, *plan):
                planes, _ = mix_cascade_pallas_stream(
                    data, *plan, front_taps, zc, stages=stages_cfg,
                    intype="i16", outtype="f32", final_dense=True,
                    interpret=interp_split)
                return _tail(planes)

            metric = "mix_split_cascade_pallas_i16_samples_per_s_chip"
        else:
            # all-XLA cascade twin: mix + per-stage banded conv at each rate
            front_mats = [
                jax.device_put(jnp.asarray(
                    make_taps_matrix(st.bank, st.P, st.Q)))
                for st in front
            ]
            geos = []
            n_s = N
            for st in front:
                m_s = n_s * st.P // st.Q
                geos.append(conv_stream_geometry(
                    0, 0, m_s, n_s, P=st.P, Q=st.Q, T=st.T) + (m_s,))
                n_s = m_s

            @jax.jit
            def step(data, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t):
                i, q = codec.i16_words_to_iq(data)
                i, q = nco.mix_blocks(i, q, d_hi, d_lo, c1_hi, c1_lo,
                                      c2_hi, c2_lo, t)
                yi = i.reshape(-1)
                yq = q.reshape(-1)
                for st, mat, (s0, pp0, Kx, PZ, TL, m_s) in zip(
                        front, front_mats, geos):
                    zeros = jnp.zeros((2, st.T - 1), jnp.float32)
                    x = jnp.concatenate(
                        [zeros, jnp.stack([yi, yq])], axis=-1)
                    yi, yq = resample_conv_stream(
                        x[0], x[1], mat, jnp.int32(s0), jnp.int32(pp0),
                        P=st.P, Q=st.Q, T=st.T, K=Kx, M=m_s,
                        PADZ=PZ, TAIL=TL,
                    )
                return _tail(jnp.stack([yi, yq]))

            metric = "mix_split_cascade_xla_i16_samples_per_s_chip"
    elif args.mode == "channels-split":
        # BASELINE config 5 PROPER: C channels × the 100 Msps split cascade,
        # channel-batched — ONE fused front launch for all channels + the
        # batched XLA tail.  The metric (ch-samples/s/chip) sizes the
        # config-5 realtime requirement: C_rt = rate / 100e6 channels/chip.
        from doppler_tpu.ops.multistage import MultiStageResampler
        from doppler_tpu.ops.pallas.chain import (
            carry_rows,
            make_chain_taps,
            mix_cascade_pallas_channels,
        )
        from doppler_tpu.ops.resample import (
            conv_stream_geometry,
            resample_conv_stream,
        )

        C = args.channels
        ms = MultiStageResampler(fs, 48000)
        k = len(ms.stages) - 1
        front = ms.stages[:k]
        fin = ms.stages[-1]
        stages_cfg = tuple((st.P, st.Q, st.T) for st in front)
        front_taps = tuple(
            jax.device_put(jnp.asarray(
                make_chain_taps(st.bank, st.P, st.Q, pp=st.P)))
            for st in front
        )
        ch_carries = tuple(
            jax.device_put(jnp.zeros((C, 2, carry_rows(st.T), 128),
                                     jnp.float32))
            for st in front
        )
        fieldsC = np.zeros((7, C, B), dtype=np.uint32)
        for c in range(C):
            pc = plan_blocks(
                [1e6 * (c - C / 2) - 0.01 * kk for kk in range(B)],
                [L] * B, fs, NCOState(), L,
            )
            for fi, nm in enumerate(("d_hi", "d_lo", "c1_hi", "c1_lo",
                                     "c2_hi", "c2_lo", "t")):
                fieldsC[fi, c] = getattr(pc, nm)
        fieldsC = jax.device_put(jnp.asarray(fieldsC))
        ratio = 1
        for st in front:
            ratio *= st.Q
        n_mid = N // ratio
        h_f = fin.T - 1
        m_fin = n_mid * fin.P // fin.Q
        s0, p0c, Kc, PADZ, TAIL = conv_stream_geometry(
            0, 0, m_fin, n_mid, P=fin.P, Q=fin.Q, T=fin.T)
        fin_taps = jax.device_put(jnp.asarray(
            make_taps_matrix(fin.bank, fin.P, fin.Q)))
        print(f"channels-split: C={C} × "
              + " -> ".join(f"{st.P}/{st.Q}" for st in ms.stages),
              file=sys.stderr)

        interp_cs = args.platform == "cpu"

        @jax.jit
        def step(data, *_):
            planes, _ = mix_cascade_pallas_channels(
                data, fieldsC, front_taps, ch_carries, stages=stages_cfg,
                intype="i16", outtype="f32", final_dense=True,
                interpret=interp_cs)
            flat = planes.reshape(2, C, -1)
            zeros = jnp.zeros((2, C, h_f), jnp.float32)
            x = jnp.concatenate([zeros, flat], axis=-1)
            yi, yq = resample_conv_stream(
                x[0], x[1], fin_taps, jnp.int32(s0), jnp.int32(p0c),
                P=fin.P, Q=fin.Q, T=fin.T, K=Kc, M=m_fin,
                PADZ=PADZ, TAIL=TAIL,
            )
            return codec.iq_to_i16_words(yi, yq)

        metric = f"channels{C}_split_cascade_i16_ch_samples_per_s_chip"
    elif args.mode == "chain-mesh":
        # Scaling harness (BASELINE "Scaling efficiency" row): the sharded
        # product step — fused Pallas chain per time shard, ppermute
        # halo-block replay — over a (channel=1, time=N) mesh.  On this
        # 1-chip rig N=1 (pins "no sharding cliff": per-chip rate within a
        # few % of the unsharded chain); on a pod slice, --mesh-scan maps
        # the whole 1→N efficiency curve.  CPU runs use the Pallas
        # interpreter — harness validation only, not a rate measurement.
        from jax.sharding import NamedSharding, PartitionSpec as Spec

        from doppler_tpu.ops.pallas.chain import carry_rows, make_chain_taps
        from doppler_tpu.parallel import make_mesh
        from doppler_tpu.parallel.sharded import make_chain_stream_step

        n_dev = len(jax.devices())
        n_time = args.mesh_time or n_dev
        if B % n_time:
            raise SystemExit(f"blocks {B} not divisible by time={n_time}")
        interp = args.platform == "cpu"
        taps_host = jnp.asarray(make_chain_taps(rs.bank, rs.P, rs.Q))
        carry_host = jnp.zeros((2, carry_rows(rs.T), 128), jnp.float32)
        K = max(1, args.dispatches)

        def measure_width(nt):
            mesh = make_mesh(time=nt, channel=1)
            step = make_chain_stream_step(mesh, resampler=rs,
                                          interpret=interp)
            repl = NamedSharding(mesh, Spec())
            d = jax.device_put(jnp.asarray(words),
                               NamedSharding(mesh, Spec("time", None)))
            plans = [
                jax.device_put(jnp.asarray(a)[None],
                               NamedSharding(mesh, Spec("channel", "time")))
                for a in (plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
                          plan.c2_hi, plan.c2_lo, plan.t)
            ]
            carry = jax.device_put(carry_host, repl)
            taps = jax.device_put(taps_host, repl)
            out, _ = step(d, *plans, carry, taps)
            jax.block_until_ready(out)
            from doppler_tpu.runtime.timing import timed_dispatches

            times = [
                timed_dispatches(
                    lambda: step(d, *plans, carry, taps)[0], K)
                for _ in range(args.iters)
            ]
            return min(times)

        widths = [n_time]
        if args.mesh_scan:
            # only widths that divide the block count are measurable
            # (review r5: an unchecked intermediate width crashed mid-scan
            # after minutes of warm-up)
            widths = [w for w in (1, 2, 4, 8, 16, 32, 64)
                      if w <= n_time and B % w == 0]
            if widths and widths[-1] != n_time:
                widths.append(n_time)
        import contextlib

        trace_ctx = (jax.profiler.trace(args.profile) if args.profile
                     else contextlib.nullcontext())
        rates = {}
        with trace_ctx:
            for w in widths:
                best = measure_width(w)
                rates[w] = N * K / best
                print(
                    f"bench chain-mesh time={w}: {K} x {N} samples in "
                    f"{best*1e3:.2f} ms best "
                    f"({rates[w]/1e9:.3f} GS/s aggregate, "
                    f"{rates[w]/w/1e9:.3f} GS/s/chip)",
                    file=sys.stderr,
                )
        if len(rates) > 1:
            base = rates[widths[0]] / widths[0]
            for w in widths[1:]:
                eff = (rates[w] / w) / base
                print(f"  scaling efficiency time={w} vs time={widths[0]}: "
                      f"{100 * eff:.1f}%", file=sys.stderr)
        rate = rates[n_time]
        extra = {"mesh_time": n_time}
        if len(rates) > 1:
            extra["efficiency_vs_time1"] = (
                (rates[n_time] / n_time) / (rates[widths[0]] / widths[0])
            )
        print(json.dumps({
            "metric": "chain_mesh_i16_samples_per_s_aggregate",
            "value": rate,
            "unit": "samples/s",
            "vs_baseline": rate / fs,
            **extra,
        }))
        return 0
    elif args.mode == "channels-pallas":
        # config 4 on the channel-batched fused Pallas chain (the runtime's
        # impl='pallas' channels path): ONE kernel launch for all channels
        from doppler_tpu.ops.pallas.chain import (
            carry_rows,
            make_chain_taps,
            mix_resample_chain_pallas_channels,
        )

        C = args.channels
        fields = np.zeros((7, C, B), dtype=np.uint32)
        for c in range(C):
            pc = plan_blocks(
                [9000.0 + 120.0 * c - 0.01 * k for k in range(B)],
                [L] * B, fs, NCOState(), L,
            )
            for fi, name in enumerate(("d_hi", "d_lo", "c1_hi", "c1_lo",
                                       "c2_hi", "c2_lo", "t")):
                fields[fi, c] = getattr(pc, name)
        fields = jax.device_put(jnp.asarray(fields))
        chain_taps = jax.device_put(
            jnp.asarray(make_chain_taps(rs.bank, rs.P, rs.Q))
        )
        carries = jax.device_put(
            jnp.zeros((C, 2, carry_rows(rs.T), 128), jnp.float32)
        )

        dot_prec = "split3" if args.precision == "fast" else "highest"

        interp_ch = args.platform == "cpu"

        def step(data, *_):
            out, _ = mix_resample_chain_pallas_channels(
                data, fields, chain_taps, carries, P=rs.P, Q=rs.Q, T=rs.T,
                dot_precision=dot_prec, interpret=interp_ch,
            )
            return out

        metric = (f"channels{C}_pallas_chain_i16_samples_per_s_chip"
                  if args.precision == "exact" else
                  f"channels{C}_pallas_chain_fast_i16_samples_per_s_chip")
    elif args.mode == "channels":
        # BASELINE config 4: N TLE-tracked channels from one wideband capture,
        # batched (C, B, L) mix + shared resample. Metric counts input samples
        # × channels (each channel performs the full per-sample chain).
        C = args.channels
        plans_c = []
        for c in range(C):
            pc = plan_blocks(
                [9000.0 + 120.0 * c - 0.01 * k for k in range(B)],
                [L] * B, fs, NCOState(), L,
            )
            plans_c.append(pc)
        stack = lambda f: jax.device_put(  # noqa: E731
            jnp.asarray(np.stack([getattr(p, f) for p in plans_c]))
        )
        plan_arrs = [stack(f) for f in ("d_hi", "d_lo", "c1_hi", "c1_lo",
                                        "c2_hi", "c2_lo", "t")]

        # lax.map over channels: each per-channel pass stays inside XLA's
        # fusion budget (a batched einsum at C=16 materializes the windows
        # tensor and falls off the roofline)
        @jax.jit
        def step(data, *plan):
            def one_channel(plan_c):
                i, q = codec.i16_words_to_iq(data)
                i, q = nco.mix_blocks(i, q, *plan_c)
                i = jnp.concatenate([jnp.zeros(H, jnp.float32), i.reshape(-1)])
                q = jnp.concatenate([jnp.zeros(H, jnp.float32), q.reshape(-1)])
                yi, yq = resample_conv_block(
                    i, q, taps_mat, P=rs.P, Q=rs.Q, T=rs.T
                )
                return codec.iq_to_i16_words(yi, yq)

            return jax.lax.map(one_channel, tuple(plan))

        metric = f"channels{C}_mix_resample_i16_samples_per_s_chip"
    else:

        @jax.jit
        def step(data, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t):
            i, q = codec.i16_words_to_iq(data)
            i, q = nco.mix_blocks(i, q, d_hi, d_lo, c1_hi, c1_lo, c2_hi, c2_lo, t)
            i = jnp.concatenate([jnp.zeros(H, jnp.float32), i.reshape(-1)])
            q = jnp.concatenate([jnp.zeros(H, jnp.float32), q.reshape(-1)])
            yi, yq = resample_conv_block(i, q, taps_mat, P=rs.P, Q=rs.Q, T=rs.T)
            return codec.iq_to_i16_words(yi, yq)

        metric = "mix_resample_chain_i16_samples_per_s_chip"

    # warmup (compile + first execution)
    out = step(data, *plan_arrs)
    jax.block_until_ready(out)

    if args.profile:
        import contextlib

        trace_ctx = jax.profiler.trace(args.profile)
    else:
        import contextlib

        trace_ctx = contextlib.nullcontext()

    # Timing methodology: steady-state streaming.  Each timed iteration
    # dispatches K independent kernel executions back-to-back and then pays
    # ONE scalar-readback sync — a tiny device-side reduction over all K
    # outputs whose host materialization cannot complete before every
    # dispatch has.  Rationale: block_until_ready through this environment's
    # remote relay can return BEFORE the device finishes (yielding numbers
    # far above the HBM roofline), so a readback is required for honesty —
    # but its ~25-30 ms relay round trip (absent on directly-attached TPUs)
    # is pure measurement overhead, not kernel time.  Amortizing it over K
    # real dispatches matches the production pipeline, which dispatches
    # chunks asynchronously and syncs only at output drain.  Per-dispatch
    # readback scalars (8-element slice sums) let the runtime free each
    # output buffer as soon as its scalar executes, so HBM peak stays ~2
    # buffers regardless of K.  --dispatches 1 recovers the conservative
    # single-shot latency number.
    K = max(1, args.dispatches)

    from doppler_tpu.runtime.timing import timed_dispatches

    def _one():
        out = step(data, *plan_arrs)
        return out if not isinstance(out, tuple) else out[0]

    def timed_iter():
        return timed_dispatches(_one, K)

    with trace_ctx:
        times = [timed_iter() for _ in range(args.iters)]
    best = min(times)
    rate = total_samples * K / best
    print(
        f"bench {metric}: {K} x {total_samples} samples in {best*1e3:.2f} ms "
        f"best/iter ({best*1e3/K:.2f} ms/dispatch; median {np.median(times)*1e3:.2f} ms) "
        f"over {args.iters} iters (one host-sync round trip per iter)",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": metric,
        "value": rate,
        "unit": "samples/s",
        "vs_baseline": rate / fs,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
