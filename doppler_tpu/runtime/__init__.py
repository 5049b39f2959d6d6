"""Host runtime: stream framing, pipelines, telemetry, checkpointing."""

from doppler_tpu.runtime import stream, telemetry  # noqa: F401
