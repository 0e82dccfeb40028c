"""Shared utilities: structured metrics logging, timing."""

from pde_superresolution_tpu.utils.metrics import MetricsLogger  # noqa: F401
