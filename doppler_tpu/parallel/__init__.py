"""Meshes, shardings, and halo-exchange collectives for time × channel SPMD."""

from doppler_tpu.parallel.mesh import iq_sharding, make_mesh, plan_sharding  # noqa: F401
from doppler_tpu.parallel.sharded import (  # noqa: F401
    make_sharded_step,
    make_wideband_mix_step,
    make_wideband_stream_step,
    shard_alignment,
    shard_conv_alignment,
    shard_valid_out_counts,
    stream_step_alignment,
)
