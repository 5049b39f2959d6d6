#!/usr/bin/env python
"""Round-5 probe (VERDICT r4 next #3): what share of the split-cascade
chunk wall does the unsharded XLA tail actually cost at config-5 scale?

Interleaved A/B on the real chip at the literal 100 Msps → 48 ksps rate
(÷16·÷16 fused front, 384/3125 XLA tail at 390.625 ksps):

  full    fused front + XLA rational tail (the product split path)
  front   fused front only (planes out, tail elided)

tail share = 1 − t_front / t_full.  If the share is >5% the ROADMAP #3
item (shard the tail under --mesh) is worth building; if <5% the measured
bound closes it.

Usage (real TPU):  timeout 580 python tools/probe_split_tail.py
"""

import argparse
import os
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=1 << 25)
    ap.add_argument("--iters", type=int, default=8)
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

    from doppler_tpu.ops import codec
    from doppler_tpu.ops.multistage import MultiStageResampler
    from doppler_tpu.ops.pallas.chain import (
        carry_rows,
        make_chain_taps,
        mix_cascade_pallas_stream,
    )
    from doppler_tpu.ops.phase_plan import NCOState, plan_blocks
    from doppler_tpu.ops.resample import (
        conv_stream_geometry,
        make_taps_matrix,
        resample_conv_stream,
    )

    interp = args.platform == "cpu"
    fs = 100_000_000
    L = 8192
    B = max(1, args.samples // L)
    N = B * L

    ms = MultiStageResampler(fs, 48000)
    k = len(ms.stages) - 1
    front = ms.stages[:k]
    fin = ms.stages[-1]
    print("split stages: "
          + " -> ".join(f"{st.P}/{st.Q}(T={st.T})" for st in ms.stages)
          + f"  (front {k} fused, tail XLA)", file=sys.stderr)
    stages_cfg = tuple((st.P, st.Q, st.T) for st in front)
    ftaps = tuple(
        jax.device_put(jnp.asarray(make_chain_taps(st.bank, st.P, st.Q,
                                                   pp=st.P)))
        for st in front
    )
    zc = tuple(jnp.zeros((2, carry_rows(st.T), 128), jnp.float32)
               for st in front)
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

    rng = np.random.default_rng(0xBE)
    words = rng.integers(-(1 << 31), (1 << 31), size=(B, L),
                         dtype=np.int64).astype(np.int32)
    plan = plan_blocks([9000.0 - 0.01 * kk for kk in range(B)], [L] * B, fs,
                       NCOState(), L)
    plan_arrs = [jax.device_put(jnp.asarray(a))
                 for a in (plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
                           plan.c2_hi, plan.c2_lo, plan.t)]
    data = jax.device_put(jnp.asarray(words))

    def _tail(planes):
        flat = planes.reshape(2, -1)
        zeros = jnp.zeros((2, h_f), jnp.float32)
        x = jnp.concatenate([zeros, flat], axis=-1)
        yi, yq = resample_conv_stream(
            x[0], x[1], fin_taps, jnp.int32(start0), jnp.int32(p0),
            P=fin.P, Q=fin.Q, T=fin.T, K=Kc, M=m_fin, PADZ=PADZ, TAIL=TAIL)
        return codec.iq_to_i16_words(yi, yq)

    @jax.jit
    def step_full(data, *plan):
        planes, _ = mix_cascade_pallas_stream(
            data, *plan, ftaps, zc, stages=stages_cfg,
            intype="i16", outtype="f32", final_dense=True, interpret=interp)
        return _tail(planes)

    @jax.jit
    def step_front(data, *plan):
        planes, _ = mix_cascade_pallas_stream(
            data, *plan, ftaps, zc, stages=stages_cfg,
            intype="i16", outtype="f32", final_dense=True, interpret=interp)
        return planes

    variants = {"full": step_full, "front": step_front}
    for name, step in variants.items():
        t0 = time.perf_counter()
        jax.block_until_ready(step(data, *plan_arrs))
        print(f"warm {name}: {time.perf_counter()-t0:.1f} s", file=sys.stderr)

    K = max(1, args.dispatches)

    from doppler_tpu.runtime.timing import timed_dispatches

    def timed(step):
        return timed_dispatches(lambda: step(data, *plan_arrs), K)

    best = {kk: float("inf") for kk in variants}
    for it in range(args.iters):
        for name, step in variants.items():
            dt = timed(step)
            best[name] = min(best[name], dt)
            print(f"iter {it} {name}: {dt*1e3:8.2f} ms/{K} disp "
                  f"({N*K/dt/1e9:6.2f} GS/s)", file=sys.stderr)

    share = 1.0 - best["front"] / best["full"]
    import json
    print(json.dumps({
        "full_gsps": N * K / best["full"] / 1e9,
        "front_gsps": N * K / best["front"] / 1e9,
        "tail_share": share,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
