"""Device-side compute ops: codecs, fixed-point phase, NCO mixer, resampler."""

from doppler_tpu.ops import codec, fixedpoint, nco  # noqa: F401
