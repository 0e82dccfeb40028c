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
    # problem sizes are already tiny). The env var (not just jax.config)
    # makes the subprocess tests (test_scripts, test_graft_entry) share the
    # cache. Keyed by HLO + topology hash, so it is always safe to delete.
    # The runtime cache (.cache/, gitignored) is populated from the
    # COMMITTED seed (.cache_seed/jax) when empty, so a fresh clone's first
    # run is warm while test-time additions never dirty the work tree.
    repo_root = os.path.dirname(os.path.dirname(__file__))
    cache_dir = os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(repo_root, ".cache", "jax"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    seed_dir = os.path.join(repo_root, ".cache_seed", "jax")
    if os.path.isdir(seed_dir) and not os.listdir(cache_dir):
        import shutil

        for name in os.listdir(seed_dir):
            shutil.copy2(
                os.path.join(seed_dir, name), os.path.join(cache_dir, name)
            )

    import jax

    jax.config.update("jax_platforms", "cpu")
    # this JAX build does not read the env var itself — apply it here for
    # the in-process tests (the package __init__ applies it in subprocesses)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
