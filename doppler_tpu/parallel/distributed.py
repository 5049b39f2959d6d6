"""Multi-host initialization and stream partitioning.

The reference is strictly single-process (SURVEY §2); pod-scale operation is
designed from the north star instead:

- every host calls :func:`init` (a thin ``jax.distributed.initialize``
  wrapper) and builds the same global ``(channel, time)`` mesh
  (``parallel.mesh.make_mesh`` over ``jax.devices()``);
- each host feeds only its own slice of the capture — channel-major first
  (channels are independent; no cross-host traffic at all), then time-major
  within a host's chips (halos ride ICI, never DCN);
- :func:`host_slice` computes which (channel, time-block) range this host
  owns for a given chunk so per-host readers can seek independently —
  byte offsets are pure functions of the block index (SURVEY §5
  "checkpoint/resume": resume = seek, here across space instead of time).

Single-chip environments skip ``init`` entirely; everything else in the
framework works unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax

__all__ = ["init", "host_slice", "HostShard"]


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None) -> None:
    """Join the multi-host JAX runtime (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


@dataclass
class HostShard:
    """This host's slice of a (C channels × B blocks) chunk."""

    channel_lo: int
    channel_hi: int
    block_lo: int
    block_hi: int

    def byte_range(self, block_bytes: int) -> tuple[int, int]:
        return self.block_lo * block_bytes, self.block_hi * block_bytes


def host_slice(
    n_channels: int,
    n_blocks: int,
    *,
    process_index: int | None = None,
    process_count: int | None = None,
    channel_parallel_hosts: int | None = None,
) -> HostShard:
    """Partition (channels × blocks) across hosts, channel-major.

    With H hosts and ``channel_parallel_hosts = Hc`` (default: as many as
    divide the channel count), hosts form an (Hc × Ht) grid: channels split
    over Hc (zero communication), time blocks over Ht = H/Hc (halo over
    ICI/DCN boundary only at host edges).
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    hc = channel_parallel_hosts
    if hc is None:
        hc = 1
        for cand in range(min(pc, n_channels), 0, -1):
            if pc % cand == 0 and n_channels % cand == 0:
                hc = cand
                break
    if pc % hc:
        raise ValueError(f"channel_parallel_hosts={hc} must divide host count {pc}")
    ht = pc // hc
    ci, ti = pi % hc, pi // hc
    cs = n_channels // hc
    bs = n_blocks // ht
    return HostShard(
        channel_lo=ci * cs,
        channel_hi=(ci + 1) * cs if ci < hc - 1 else n_channels,
        block_lo=ti * bs,
        block_hi=(ti + 1) * bs if ti < ht - 1 else n_blocks,
    )
