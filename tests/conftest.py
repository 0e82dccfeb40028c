"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests must not depend on TPU hardware; multi-device sharding tests use the
standard JAX trick of forcing N host-platform (CPU) devices.

Note: in this environment the ``axon`` TPU plugin overrides the
``JAX_PLATFORMS`` environment variable, so we must use
``jax.config.update("jax_platforms", ...)`` (which wins) instead. XLA_FLAGS
must still be set before the CPU backend is first initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
