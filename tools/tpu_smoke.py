"""Hardware smoke tests for the Pallas kernels' real Mosaic lowerings.

CPU tests run the Pallas interpreter (``interpret=True``), which is known to
accept programs the real Mosaic compiler rejects (CLAUDE.md pitfalls).  This
script compiles and runs every wire-format combination of the fused mixer —
and a couple of fused-chain shapes — on the attached TPU, comparing against
the XLA reference graphs.  Run it whenever a kernel's BlockSpecs or stores
change; record the outcome in docs/architecture.md.

Usage: timeout 600 python tools/tpu_smoke.py
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    sys.path.insert(0, "/root/repo")
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from doppler_tpu.ops import codec, nco
    from doppler_tpu.ops.phase_plan import NCOState, plan_blocks
    from doppler_tpu.ops.pallas.mixer import mix_blocks_pallas_fmt

    dev = jax.devices()[0]
    print(f"smoke device: {dev.device_kind}", flush=True)
    if dev.platform == "cpu":
        print("WARNING: no TPU attached — this run does NOT validate Mosaic")

    rng = np.random.default_rng(7)
    B, L = 32, 2048
    fs = 256_000

    # a track-like plan: varying shifts, including a segment switch
    shifts = list(np.linspace(-15000.0, 9000.0, B))
    state = NCOState()
    plan = plan_blocks(shifts, [L] * B, fs, state, L)
    plan_arrs = [plan.d_hi, plan.d_lo, plan.c1_hi, plan.c1_lo,
                 plan.c2_hi, plan.c2_lo, plan.t]
    plan_j = [jnp.asarray(a) for a in plan_arrs]

    words = rng.integers(-(2 ** 31), 2 ** 31, size=(B, L), dtype=np.int64)
    words = words.astype(np.int32)
    f32p = (rng.standard_normal((2, B, L)) * 0.7).astype(np.float32)
    # sprinkle NaNs on the f32 input to exercise the encode guard
    f32p[0, 0, :16] = np.nan
    f32p[1, 1, 100:116] = np.nan

    # XLA reference outputs
    def xla_ref(intype, outtype):
        if intype == "i16":
            i, q = codec.i16_words_to_iq(jnp.asarray(words))
        else:
            i, q = jnp.asarray(f32p[0]), jnp.asarray(f32p[1])
        i, q = nco.mix_blocks(i, q, *plan_j)
        if outtype == "i16":
            return np.asarray(codec.iq_to_i16_words(i, q))
        return np.stack([np.asarray(i), np.asarray(q)])

    failures = 0
    for intype, outtype in [("i16", "i16"), ("f32", "f32"),
                            ("f32", "i16"), ("i16", "f32")]:
        data = jnp.asarray(words if intype == "i16" else f32p)
        try:
            got = np.asarray(mix_blocks_pallas_fmt(
                data, *plan_j, intype=intype, outtype=outtype))
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            print(f"mixer {intype}->{outtype}: COMPILE/RUN FAIL: {e!r}")
            failures += 1
            continue
        want = xla_ref(intype, outtype)
        if outtype == "i16":
            gi = (got.astype(np.int32) << 16) >> 16
            gq = got.astype(np.int32) >> 16
            wi = (want.astype(np.int32) << 16) >> 16
            wq = want.astype(np.int32) >> 16
            err = max(np.abs(gi - wi).max(), np.abs(gq - wq).max())
            ok = err <= 1  # quarter-wave sincos is within 1 LSB of XLA's
            print(f"mixer {intype}->{outtype}: max |LSB err| = {err} "
                  f"{'OK' if ok else 'FAIL'}")
        else:
            err = float(np.nanmax(np.abs(got - want)))
            nan_match = bool(
                (np.isnan(got) == np.isnan(want)).all())
            ok = err < 2e-6 and nan_match
            print(f"mixer {intype}->{outtype}: max |err| = {err:.3g} "
                  f"nan_match={nan_match} {'OK' if ok else 'FAIL'}")
        if not ok:
            failures += 1

    # fused chain at the config-3 shape (P=375, Q=8000 → use CLI-realistic
    # small ratio): 1.024M→48k is P=3, Q=64
    from doppler_tpu.ops.filters import design_polyphase_bank
    from doppler_tpu.ops.pallas.chain import (
        carry_rows, make_chain_taps, mix_resample_chain_pallas_stream)

    P, Q = 3, 64
    bank = design_polyphase_bank(P, Q)
    T = bank.shape[1]
    taps = jnp.asarray(make_chain_taps(bank, P, Q))
    hbr = carry_rows(T)
    carry = jnp.zeros((2, hbr, 128), jnp.float32)
    try:
        out, carry2 = mix_resample_chain_pallas_stream(
            jnp.asarray(words), *plan_j, taps, carry, P=P, Q=Q, T=T)
        out.block_until_ready()
        print(f"chain i16 P={P} Q={Q} T={T}: ran OK, out shape {out.shape}")
    except Exception as e:  # noqa: BLE001
        print(f"chain i16 P={P} Q={Q}: COMPILE/RUN FAIL: {e!r}")
        failures += 1

    print(f"smoke: {'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
