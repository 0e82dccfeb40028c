"""Numerical debugging aids (SURVEY.md §5 "Race detection / sanitizers").

JAX's functional model makes data races impossible by construction; the
failure modes that matter here are numerical: NaN/Inf from CFL violations,
under-resolved shocks, or exploding unrolled gradients. Tools:

  * ``debug_nans()`` — context manager enabling jax's global NaN debugger
    (errors at the op that produced the first NaN, eager or jitted);
  * ``checked(fn)`` — checkify-wrap a jitted function so NaN/Inf and OOB
    index errors surface as proper errors with location info instead of
    silently propagating;
  * ``assert_all_finite(tree, name)`` — host-side pytree check for tests
    and loop-level guards.
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
import numpy as np
from jax.experimental import checkify


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Temporarily enable jax_debug_nans (slow; use while bisecting)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked(fn: Callable, errors=checkify.float_checks) -> Callable:
    """Wrap ``fn`` with checkify float/NaN checks; raises on error.

    Example::

        step = debugging.checked(jax.jit(train_step))
        state, parts = step(state, batch)   # raises if any op made a NaN
    """
    checked_fn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_all_finite(tree, name: str = "tree") -> None:
    """Host-side finiteness check over a pytree (tests, loop guards)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}{jax.tree_util.keystr(path)}: {bad}/{arr.size} "
                "non-finite values"
            )
