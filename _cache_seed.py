"""Populate the runtime XLA compile cache from the committed seed.

Policy (one shared implementation for tests/conftest.py and
__graft_entry__.py): the runtime cache lives at ``.cache/jax`` (gitignored)
and, when empty, is populated from the COMMITTED seed at ``.cache_seed/jax``
so fresh clones get warm compiles while test-time cache growth never
dirties the tree. Refresh the seed deliberately with
``cp .cache/jax/* .cache_seed/jax/`` when compiles change (CLAUDE.md).

Pure stdlib — safe to import before jax / before XLA_FLAGS is finalized.
"""

import os


def seed_compile_cache(repo_root: str) -> str:
    """Ensure the cache dir exists, seed it if empty, export the env var.

    Returns the cache dir path. ``JAX_COMPILATION_CACHE_DIR`` is set via
    ``setdefault`` so an explicit caller/env choice wins; the env var (not
    just jax.config) makes subprocess tests share the cache.
    """
    cache_dir = os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(repo_root, ".cache", "jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    seed_dir = os.path.join(repo_root, ".cache_seed", "jax")
    if os.path.isdir(seed_dir) and not os.listdir(cache_dir):
        import shutil

        for name in os.listdir(seed_dir):
            src = os.path.join(seed_dir, name)
            if os.path.isfile(src):
                shutil.copy2(src, os.path.join(cache_dir, name))
    return cache_dir
