"""Pallas TPU kernels for the hot per-sample ops."""

from doppler_tpu.ops.pallas.mixer import mix_blocks_pallas  # noqa: F401
