"""TPU probe: window_dot (gather+tree) vs resample_conv_block (banded MXU).

Quantifies VERDICT r1 missing-item 2 — how far the product XLA resample
path (window formulation) sits from the banded-matmul fast path on real
hardware, at the config-3 shape (1.024 Msps → 48 ksps, P=3 Q=64 T=370).

Honest timing per CLAUDE.md: dependency-chained steps, one readback.
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    sys.path.insert(0, "/root/repo")
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from doppler_tpu.ops.multistage import make_resampler
    from doppler_tpu.ops.resample import (
        make_taps_matrix,
        resample_conv_block,
        window_dot,
    )

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)

    rs = make_resampler(1_024_000, 48_000.0, stages="single")
    P, Q, T = rs.P, rs.Q, rs.T
    N = 1 << 24                       # 16.7M samples per step
    M = N * P // Q
    H = T - 1
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.standard_normal(H + N).astype(np.float32))
    xq = jnp.asarray(rng.standard_normal(H + N).astype(np.float32))
    bank_rev = jnp.asarray(np.asarray(rs.bank[:, ::-1]))
    taps_mat = jnp.asarray(make_taps_matrix(rs.bank, P, Q))

    wd = jax.jit(lambda a, b: window_dot(
        a, b, bank_rev, jnp.int32(0), jnp.int32(0), P=P, Q=Q, T=T, M=M))
    cb = jax.jit(lambda a, b: resample_conv_block(
        a, b, taps_mat, P=P, Q=Q, T=T))

    def chain_time(fn, reps=8):
        yi, yq = fn(xi, xq)
        jax.block_until_ready((yi, yq))          # compile + warm
        a, b = xi, xq
        t0 = time.perf_counter()
        for _ in range(reps):
            yi, yq = fn(a, b)
            # dependency-chain: feed a slice of the output back in
            a = a.at[:M].set(yi)
            b = b.at[:M].set(yq)
        float(a[0])                              # one scalar readback
        return (time.perf_counter() - t0) / reps

    for name, fn in [("conv_block", cb), ("window_dot", wd)]:
        t0 = time.perf_counter()
        try:
            dt = chain_time(fn)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {e!r}")
            continue
        print(f"{name}: {dt*1e3:.2f} ms / {N/1e6:.1f}M samples "
              f"= {N/dt/1e9:.2f} GS/s  (first call incl compile "
              f"{time.perf_counter()-t0:.0f}s total)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
