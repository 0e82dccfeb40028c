"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests must not depend on TPU hardware; multi-device sharding tests use the
standard JAX trick of forcing N host-platform (CPU) devices.

Note: in this environment the ``axon`` TPU plugin overrides the
``JAX_PLATFORMS`` environment variable, so we must use
``jax.config.update("jax_platforms", ...)`` (which wins) instead. XLA_FLAGS
must still be set before the CPU backend is first initialized.

Set ``PDE_TPU_TESTS=1`` to keep the real TPU backend instead — this skips
the virtual-mesh tests and UN-skips the on-hardware equivalence tests
(tests/test_pallas_kernels.py::TestOnTPU), for the verify skill:

    PDE_TPU_TESTS=1 python -m pytest tests/test_pallas_kernels.py -q
"""

import os

if not os.environ.get("PDE_TPU_TESTS"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # Persistent XLA compilation cache: the suite's wall time is dominated
    # by repeated CPU compiles of the jitted train/integration steps (the
    # problem sizes are already tiny). Keyed by HLO + topology hash, so it
    # is always safe to delete. Seeding policy (committed seed -> runtime
    # cache, env var shared with the subprocess tests): _cache_seed.py.
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    from _cache_seed import seed_compile_cache

    cache_dir = seed_compile_cache(repo_root)

    import jax

    jax.config.update("jax_platforms", "cpu")
    # this JAX build does not read the env var itself — apply it here for
    # the in-process tests (the package __init__ applies it in subprocesses)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
