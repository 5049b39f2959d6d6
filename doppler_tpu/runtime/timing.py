"""Steady-state dispatch timing — THE one honest measurement scaffold.

Methodology (load-bearing on this rig, see CLAUDE.md): each timed
iteration issues K back-to-back dispatches and then pays ONE scalar
readback that depends on all of them — ``block_until_ready`` through the
axon relay can return BEFORE the device finishes, so a value-dependent
host materialization is required for honesty, while amortizing its
~25-30 ms relay round trip over K real dispatches matches the production
pipeline's async dispatch.  Per-dispatch 8-element slice sums let the
runtime free each output as soon as its scalar executes (HBM peak stays
~2 buffers regardless of K).

Previously copy-pasted across bench.py and every tools/ probe (review
r5): a future change to the methodology now lands in one place.
"""

from __future__ import annotations

import time

import jax.numpy as jnp

__all__ = ["timed_dispatches"]


def timed_dispatches(step, K: int) -> float:
    """Wall seconds for K dispatches of ``step()`` + one chained readback.

    ``step`` is a zero-arg callable returning a device array (callers bind
    their inputs and unwrap tuples in the closure).
    """
    t0 = time.perf_counter()
    accs = []
    for _ in range(K):
        o = step()
        accs.append(jnp.sum(o.reshape(-1)[:8].astype(jnp.float32)))
    acc = accs[0]
    for a in accs[1:]:
        acc = acc + a
    float(acc)
    return time.perf_counter() - t0
