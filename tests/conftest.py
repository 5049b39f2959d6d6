"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Multi-chip behavior (time/channel sharding, halo exchange) is validated on
fake CPU devices per SURVEY §4(c); real-TPU runs happen in bench.py and the
driver's dryrun.

The image's sitecustomize registers the axon TPU backend and forces
``jax_platforms="axon,cpu"`` in every interpreter, so env vars alone don't
stick — override via jax.config before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
