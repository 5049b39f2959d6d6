#!/usr/bin/env python
"""Round-5 probe: cascade exact (HIGHEST) vs fast (split3), interleaved.

Config-3 shape (1.024 Msps → 48 ksps greedy cascade), same methodology as
probe_chain_precision.py.  Usage:
    timeout 580 python tools/probe_cascade_precision.py
"""

import argparse
import os
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=1 << 25)
    ap.add_argument("--iters", type=int, default=10)
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

    from doppler_tpu.ops.multistage import MultiStageResampler
    from doppler_tpu.ops.pallas.chain import (
        carry_rows,
        make_chain_taps,
        mix_cascade_pallas_stream,
    )
    from doppler_tpu.ops.phase_plan import NCOState, plan_blocks

    interp = args.platform == "cpu"
    fs, L = 1_024_000, 8192
    B = max(1, args.samples // L)
    N = B * L
    ms = MultiStageResampler(fs, 48000)
    nst = len(ms.stages)
    stages_cfg = tuple((st.P, st.Q, st.T) for st in ms.stages)
    taps = tuple(
        jax.device_put(jnp.asarray(make_chain_taps(
            st.bank, st.P, st.Q, pp=(st.P if i < nst - 1 else None))))
        for i, st in enumerate(ms.stages))
    carries = tuple(
        jax.device_put(jnp.zeros((2, carry_rows(st.T), 128), jnp.float32))
        for st in ms.stages)
    print("stages: " + " -> ".join(f"{st.P}/{st.Q}(T={st.T})"
                                   for st in ms.stages), file=sys.stderr)

    rng = np.random.default_rng(0xBE)
    words = rng.integers(-(1 << 31), (1 << 31), size=(B, L),
                         dtype=np.int64).astype(np.int32)
    plan = plan_blocks([9000.0 - 0.01 * k for k in range(B)], [L] * B, fs,
                       NCOState(), L)
    plan_arrs = [jax.device_put(jnp.asarray(a))
                 for a in (plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
                           plan.c2_hi, plan.c2_lo, plan.t)]
    data = jax.device_put(jnp.asarray(words))

    def make_step(prec):
        def step(x, *p):
            out, _ = mix_cascade_pallas_stream(
                x, *p, taps, carries, stages=stages_cfg,
                interpret=interp, dot_precision=prec)
            return out
        return step

    variants = {"exact": make_step("highest"), "fast": make_step("split3")}
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
