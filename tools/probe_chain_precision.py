#!/usr/bin/env python
"""Round-5 probe: what does the chain's MXU precision actually cost?

Interleaved A/B (one process, best-of-N rounds — rig noise is ±25%
run-to-run) of the REAL fused chain kernel at the config-3 bench shape:

  hi    dot precision HIGHEST (6 bf16 passes / f32 matmul) — the product
  def   dot precision DEFAULT (1 bf16 pass) — numerically wrong, exists
        ONLY to bound the achievable gain of ANY pass-reduction scheme
        (bf16-pair taps etc., VERDICT r4 next #1a): if def ≈ hi, the MXU
        passes are hidden behind VPU/DMA and no split scheme can help.

Optionally (env PROBE_TONE=1) also A/Bs the tone quadrant formulation
(select-chain vs XOR sign-fold, bitwise-identical outputs) on the
chain-mix shape.  NOTE: the fold IS the production sincos_q24_neg since
round 5, so the select-chain baseline lives inline here.

Usage (real TPU):  timeout 580 python tools/probe_chain_precision.py
"""

import argparse
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
    args = ap.parse_args()

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

    from doppler_tpu.ops.pallas.chain import (
        make_chain_taps,
        mix_resample_chain_pallas_stream,
        carry_rows,
    )
    from doppler_tpu.ops.phase_plan import NCOState, plan_blocks
    from doppler_tpu.ops.resample import RationalResampler

    interp = args.platform == "cpu"
    fs = 1_024_000
    L = 8192
    B = max(1, args.samples // L)
    N = B * L
    rs = RationalResampler(fs, 48000)
    assert N % rs.Q == 0

    rng = np.random.default_rng(0xBE)
    words = rng.integers(-(1 << 31), (1 << 31), size=(B, L),
                         dtype=np.int64).astype(np.int32)
    plan = plan_blocks([9000.0 - 0.01 * k for k in range(B)], [L] * B, fs,
                       NCOState(), L)
    plan_arrs = [
        jax.device_put(jnp.asarray(a))
        for a in (plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
                  plan.c2_hi, plan.c2_lo, plan.t)
    ]
    data = jax.device_put(jnp.asarray(words))
    chain_taps = jax.device_put(jnp.asarray(make_chain_taps(rs.bank, rs.P,
                                                            rs.Q)))
    carry0 = jax.device_put(jnp.zeros((2, carry_rows(rs.T), 128), jnp.float32))

    def make_step(prec, phase="outer"):
        def step(x, *p):
            out, _ = mix_resample_chain_pallas_stream(
                x, *p, chain_taps, carry0, P=rs.P, Q=rs.Q, T=rs.T,
                interpret=interp, dot_precision=prec, phase_impl=phase)
            return out
        return step

    variants = {"hi-flat": make_step("highest", "flat"),
                "hi-outer": make_step("highest", "outer"),
                "def": make_step("default"),
                "split3-flat": make_step("split3", "flat"),
                "split3-outer": make_step("split3", "outer")}

    if os.environ.get("PROBE_TONE"):  # tone formulation A/B (measured r5)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from doppler_tpu.ops.pallas.chain import (
            _pick_chain_blocks_per_step,
            _pick_group_cols,
        )
        from doppler_tpu.ops.pallas.mixer import phase_q24
        from doppler_tpu.ops.sincos import mix_tone
        from doppler_tpu.ops.sincos import sincos_q24_neg as sincos_fold

        def sincos_select(q24):  # the pre-round-5 select-chain baseline
            quad = q24 >> 22
            frac = (q24 & jnp.int32(0x3FFFFF)).astype(jnp.float32)
            x = frac * jnp.float32((np.pi / 2) * 2.0 ** -22)
            x2 = x * x
            s_p = x * (
                jnp.float32(0.9999999660) + x2 * (
                    jnp.float32(-0.1666665247) + x2 * (
                        jnp.float32(0.0083330520) + x2 * (
                            jnp.float32(-0.0001980742)
                            + x2 * jnp.float32(2.6019031e-06)))))
            c_p = jnp.float32(1.0) + x2 * (
                jnp.float32(-0.4999999963) + x2 * (
                    jnp.float32(0.0416666418) + x2 * (
                        jnp.float32(-0.0013888397) + x2 * (
                            jnp.float32(0.0000247609)
                            + x2 * jnp.float32(-2.605e-07)))))
            k0 = quad == 0
            k1 = quad == 1
            k2 = quad == 2
            cos_u = jnp.where(k0, c_p,
                              jnp.where(k1, -s_p, jnp.where(k2, -c_p, s_p)))
            sin_u = jnp.where(k0, s_p,
                              jnp.where(k1, c_p, jnp.where(k2, -s_p, -c_p)))
            return cos_u, -sin_u

        S = L // 128
        taps8 = chain_taps
        n_sub, _, PP = taps8.shape
        CC = n_sub * PP
        Wc = _pick_chain_blocks_per_step(B, L, rs.T, CC)
        A = Wc * S
        G = A // _pick_group_cols(A, CC)

        def make_mix_kernel(tone_fn):
            def kernel(d_hi_r, d_lo_r, c1_hi_r, c1_lo_r, c2_hi_r, c2_lo_r,
                       t_r, words_ref, out_ref):
                b = pl.program_id(0)
                j = (jax.lax.broadcasted_iota(jnp.uint32, (S, 128), 0)
                     * jnp.uint32(128)
                     + jax.lax.broadcasted_iota(jnp.uint32, (S, 128), 1))
                scale = jnp.float32(1.0 / 32768.0)
                mis, mqs = [], []
                for wi in range(Wc):
                    k = b * Wc + wi
                    w = words_ref[wi]
                    fi = (jnp.left_shift(w, 16) >> 16).astype(
                        jnp.float32) * scale
                    fq = (w >> 16).astype(jnp.float32) * scale
                    q24 = phase_q24(j, d_hi_r[k], d_lo_r[k],
                                    c1_hi_r[k], c1_lo_r[k],
                                    c2_hi_r[k], c2_lo_r[k], t_r[k],
                                    small_j=(S * 128 <= 65536))
                    c, s_ = tone_fn(q24)
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

                out_ref[0] = ((enc(mi[:G]) & jnp.int32(0xFFFF))
                              | jnp.left_shift(enc(mq[:G]), 16))
            return kernel

        def mix_shape_run(tone_fn):
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
                    make_mix_kernel(tone_fn),
                    grid_spec=grid_spec,
                    out_shape=jax.ShapeDtypeStruct((B // Wc, G, 128),
                                                   jnp.int32),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary",)),
                    interpret=interp,
                )(*(jnp.asarray(p, jnp.uint32) for p in plans),
                  x.reshape(B, S, 128))
            return run

        variants["mix-select"] = mix_shape_run(sincos_select)
        variants["mix-fold"] = mix_shape_run(sincos_fold)

    # warm up / compile everything first
    for name, step in variants.items():
        t0 = time.perf_counter()
        jax.block_until_ready(step(data, *plan_arrs))
        print(f"warm {name}: {time.perf_counter()-t0:.1f} s", file=sys.stderr)

    K = max(1, args.dispatches)

    from doppler_tpu.runtime.timing import timed_dispatches

    def timed(step):
        return timed_dispatches(lambda: step(data, *plan_arrs), K)

    best = {k: float("inf") for k in variants}
    for it in range(args.iters):
        for name, step in variants.items():
            dt = timed(step)
            best[name] = min(best[name], dt)
            print(f"iter {it} {name}: {dt*1e3:8.2f} ms/{K} disp "
                  f"({N*K/dt/1e9:6.2f} GS/s)", file=sys.stderr)

    import json
    print(json.dumps({k: {"gsps": N * K / v / 1e9, "ms": v * 1e3}
                      for k, v in best.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
