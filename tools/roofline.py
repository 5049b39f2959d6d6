#!/usr/bin/env python
"""Measure the achievable HBM/elementwise ceiling on THIS chip vs the mixer.

Answers the north-star question "is the mixer HBM-bandwidth-bound?" with
measurements instead of datasheet rooflines: the tunneled v5e chip's
*achievable* streaming bandwidth is what the mixer competes against, and the
datasheet 819 GB/s may not be reachable by any kernel on this rig.

Variants (all move the same 8 bytes/sample of HBM traffic, i16→i16 layout):

  xla-xor   jit(x ^ 1)              — XLA elementwise floor (pure BW probe)
  copy      Pallas out[...]=in[...] — Pallas DMA floor, no VPU work
  codec     Pallas decode+encode    — adds the i16↔f32 casts (the claimed
                                      "structural floor" of the round-2 docs)
  mixer     full fused NCO mixer    — the product kernel
  mixer-q15 integer-domain mixer    — i16 decode without casts, Q15 tone,
                                      int32 MAC, integer saturate (SNR-grade,
                                      not byte-exact; see ops/pallas/mixer.py)

Chain-shaped variants (VERDICT r3 #2: attribute the fused chain's gap to
the DMA envelope — all move the chain's ≈4.5 B/sample traffic, identical
grid/BlockSpec geometry to the product chain kernel):

  chain-copy  read (W,S,128) words, write the chain's (1,G,128) out block,
              zero compute — the DMA floor at chain traffic shape
  chain-mix   + decode, exact Q0.64 phase, quarter-wave tone, mix, encode
              (full VPU work, no matmuls) — chain-mix − chain-copy = VPU cost
  chain       the real fused chain kernel — chain − chain-mix = MXU cost
  chain-pp4   chain with pp=4 taps (CC=8, D=16: 19/16 MXU passes/LHS-row
              vs the default pp=8's 11/8) — the lane-packing experiment

Methodology matches bench.py: K dispatches per timed iteration, one
readback that depends on all of them, best-of-iters.  Run on the real TPU:

    timeout 580 python tools/roofline.py --samples 33554432 --dispatches 64
"""

import argparse
import functools
import os
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=1 << 25)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--dispatches", type=int, default=64)
    ap.add_argument("--platform", choices=["default", "cpu"], default="default")
    ap.add_argument("--variants", default="xla-xor,copy,codec,mixer,mixer-q15")
    args = ap.parse_args()
    # exact-name matching (a substring test made e.g.
    # --variants chain-copy also run the mixer-shape "copy")
    variants = set(args.variants.split(","))

    import jax

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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from doppler_tpu.ops.pallas.mixer import (
        mix_blocks_pallas,
        mix_blocks_pallas_q15,
        _pick_blocks_per_step,
    )
    from doppler_tpu.ops.phase_plan import NCOState, plan_blocks

    interp = args.platform == "cpu"
    dev = jax.devices()[0]
    print(f"roofline device: {dev}", file=sys.stderr)

    fs = 1024000
    L = 8192
    B = max(1, args.samples // L)
    N = B * L
    S = L // 128
    rng = np.random.default_rng(0xBE)
    words = rng.integers(
        -(1 << 31), (1 << 31), size=(B, L), dtype=np.int64
    ).astype(np.int32)
    shifts = [9000.0 - 0.01 * k for k in range(B)]
    plan = plan_blocks(shifts, [L] * B, fs, NCOState(), L)
    plan_arrs = [
        jax.device_put(jnp.asarray(a))
        for a in (plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
                  plan.c2_hi, plan.c2_lo, plan.t)
    ]
    data = jax.device_put(jnp.asarray(words))
    W = _pick_blocks_per_step(B, L)

    def pallas_elementwise(body, W=W, flat=False):
        """(B,S,128) int32 → int32 pipeline with W blocks per grid step.

        ``flat=True`` collapses the W block rows into one (W·S, 128) tile per
        grid step (single whole-buffer load/store instead of W sub-slices).
        """

        if flat:
            def kernel(in_ref, out_ref):
                out_ref[...] = body(in_ref[...])

            ispec = pl.BlockSpec((W * S, 128), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM)
            oshape = (B * S, 128)
        else:
            def kernel(in_ref, out_ref):
                for wi in range(W):
                    out_ref[wi] = body(in_ref[wi])

            ispec = pl.BlockSpec((W, S, 128), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
            oshape = (B, S, 128)

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                grid=(B // W,),
                in_specs=[ispec],
                out_specs=ispec,
                out_shape=jax.ShapeDtypeStruct(oshape, jnp.int32),
                interpret=interp,
            )(x.reshape(oshape)).reshape(B, L)

        return run

    def codec_body(w):
        # decode (dsp.rs:85-99) + encode (main.rs:76-84), identity mix
        scale = jnp.float32(1.0 / 32768.0)
        fi = (jnp.left_shift(w, 16) >> 16).astype(jnp.float32) * scale
        fq = (w >> 16).astype(jnp.float32) * scale

        def enc(v):
            v = jnp.trunc(v * jnp.float32(32767.0))
            v = jnp.clip(v, jnp.float32(-32768.0), jnp.float32(32767.0))
            return v.astype(jnp.int32)

        return (enc(fi) & jnp.int32(0xFFFF)) | jnp.left_shift(enc(fq), 16)

    steps = {}
    if "xla-xor" in variants:
        steps["xla-xor"] = (jax.jit(lambda x, *p: x ^ 1), 8)
    if "copy" in variants:
        steps["copy"] = (
            (lambda run: (lambda x, *p: run(x)))(
                pallas_elementwise(lambda w: w)), 8)
    for wv in (8, 16, 32, 64, 128):
        if f"copy-w{wv}" in variants and B % wv == 0:
            steps[f"copy-w{wv}"] = (
                (lambda run: (lambda x, *p: run(x)))(
                    pallas_elementwise(lambda w: w, W=wv)), 8)
        if f"copyflat-w{wv}" in variants and B % wv == 0:
            steps[f"copyflat-w{wv}"] = (
                (lambda run: (lambda x, *p: run(x)))(
                    pallas_elementwise(lambda w: w, W=wv, flat=True)), 8)
    for wv in (32, 64):
        if f"mixer-w{wv}" in variants and B % wv == 0:
            steps[f"mixer-w{wv}"] = (
                functools.partial(mix_blocks_pallas, interpret=interp,
                                  blocks_per_step=wv), 8)
    if "codec" in variants:
        steps["codec"] = (
            (lambda run: (lambda x, *p: run(x)))(
                pallas_elementwise(codec_body)), 8)
    if "mixer" in variants:
        steps["mixer"] = (
            functools.partial(mix_blocks_pallas, interpret=interp), 8)
    if "mixer-q15" in variants:
        steps["mixer-q15"] = (
            functools.partial(mix_blocks_pallas_q15, interpret=interp), 8)

    # ---- chain-shaped variants --------------------------------------------
    if any(v.startswith("chain") for v in variants):
        from doppler_tpu.ops.pallas.chain import (
            _pick_chain_blocks_per_step,
            _pick_group_cols,
            make_chain_taps,
            mix_resample_chain_pallas,
        )
        from doppler_tpu.ops.pallas.mixer import _sincos_q24, phase_q24
        from doppler_tpu.ops.resample import RationalResampler
        from doppler_tpu.ops.sincos import mix_tone

        rs = RationalResampler(fs, 48000)
        taps8 = jnp.asarray(make_chain_taps(rs.bank, rs.P, rs.Q))
        n_sub, _, PP = taps8.shape
        CC = n_sub * PP
        Wc = _pick_chain_blocks_per_step(B, L, rs.T, CC)
        A = Wc * S
        G = A // _pick_group_cols(A, CC)
        bps_chain = 4.0 + 4.0 * (G * 128) / (A * 128)

        def make_chain_shape_kernel(do_mix):
            def kernel(d_hi_r, d_lo_r, c1_hi_r, c1_lo_r, c2_hi_r, c2_lo_r,
                       t_r, words_ref, out_ref):
                b = pl.program_id(0)
                if not do_mix:
                    rows = words_ref[...].reshape(A, 128)
                    out_ref[0] = rows[:G]
                    return
                j = (
                    jax.lax.broadcasted_iota(jnp.uint32, (S, 128), 0)
                    * jnp.uint32(128)
                    + jax.lax.broadcasted_iota(jnp.uint32, (S, 128), 1)
                )
                scale = jnp.float32(1.0 / 32768.0)
                mis, mqs = [], []
                for wi in range(Wc):
                    k = b * Wc + wi
                    w = words_ref[wi]
                    fi = (jnp.left_shift(w, 16) >> 16).astype(jnp.float32) * scale
                    fq = (w >> 16).astype(jnp.float32) * scale
                    q24 = phase_q24(j, d_hi_r[k], d_lo_r[k],
                                    c1_hi_r[k], c1_lo_r[k],
                                    c2_hi_r[k], c2_lo_r[k], t_r[k],
                                    small_j=(S * 128 <= 65536))
                    c, s_ = _sincos_q24(q24)
                    oi, oq = mix_tone(fi, fq, c, s_)
                    mis.append(oi)
                    mqs.append(oq)
                mi = jnp.concatenate(mis, axis=0)
                mq = jnp.concatenate(mqs, axis=0)

                def enc(v):
                    w_ = jnp.trunc(v * jnp.float32(32767.0))
                    w_ = jnp.clip(w_, jnp.float32(-32768.0),
                                  jnp.float32(32767.0))
                    return w_.astype(jnp.int32)

                out_ref[0] = (
                    (enc(mi[:G]) & jnp.int32(0xFFFF))
                    | jnp.left_shift(enc(mq[:G]), 16)
                )
            return kernel

        def chain_shape_run(do_mix):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=7,
                grid=(B // Wc,),
                in_specs=[pl.BlockSpec((Wc, S, 128), lambda b, *_: (b, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, G, 128), lambda b, *_: (b, 0, 0),
                                       memory_space=pltpu.VMEM),
            )

            @jax.jit
            def run(x, *plans):
                return pl.pallas_call(
                    make_chain_shape_kernel(do_mix),
                    grid_spec=grid_spec,
                    out_shape=jax.ShapeDtypeStruct((B // Wc, G, 128),
                                                   jnp.int32),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary",),
                    ),
                    interpret=interp,
                )(*(jnp.asarray(p, jnp.uint32) for p in plans),
                  x.reshape(B, S, 128))
            return run

        if "chain-copy" in variants:
            run = chain_shape_run(False)
            steps["chain-copy"] = (
                (lambda r: (lambda x, *p: r(x, *p)))(run), bps_chain)
        if "chain-mix" in variants:
            run = chain_shape_run(True)
            steps["chain-mix"] = (
                (lambda r: (lambda x, *p: r(x, *p)))(run), bps_chain)
        if "chain" in variants:
            steps["chain"] = (
                (lambda tp: (lambda x, *p: mix_resample_chain_pallas(
                    x, *p, tp, P=rs.P, Q=rs.Q, T=rs.T,
                    interpret=interp)))(taps8), bps_chain)
        if "chain-pp4" in variants:
            taps4 = jnp.asarray(make_chain_taps(rs.bank, rs.P, rs.Q, pp=4))
            steps["chain-pp4"] = (
                (lambda tp: (lambda x, *p: mix_resample_chain_pallas(
                    x, *p, tp, P=rs.P, Q=rs.Q, T=rs.T,
                    interpret=interp)))(taps4), bps_chain)

    K = max(1, args.dispatches)
    results = {}
    for name, (step, bytes_per_sample) in steps.items():
        out = step(data, *plan_arrs)
        jax.block_until_ready(out)
        from doppler_tpu.runtime.timing import timed_dispatches

        times = [timed_dispatches(lambda: step(data, *plan_arrs), K)
                 for _ in range(args.iters)]
        best = min(times)
        rate = N * K / best
        bw = rate * bytes_per_sample
        results[name] = (rate, bw, best / K * 1e3)
        print(
            f"{name:10s} {best*1e3:8.2f} ms/{K} disp  "
            f"{best/K*1e3:6.3f} ms/disp  {rate/1e9:7.2f} GS/s  "
            f"{bw/1e9:7.1f} GB/s",
            file=sys.stderr,
        )

    import json
    print(json.dumps({
        k: {"gsps": v[0] / 1e9, "gbps": v[1] / 1e9, "ms_per_dispatch": v[2]}
        for k, v in results.items()
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
