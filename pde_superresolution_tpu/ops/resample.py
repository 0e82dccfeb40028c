"""Coarse-graining ops: block-mean resampling and strided subsampling.

≈ pde_superresolution/duckarray.py §resample_mean, §subsample,
§RESAMPLE_FUNCS (unverified — see SURVEY.md provenance warning).

* ``resample_mean`` is the finite-volume coarse-graining: a coarse cell
  average is the mean of the ``factor`` fine cell averages it contains.
* ``subsample`` is the finite-difference coarse-graining: keep every
  ``factor``-th point value.
"""

from __future__ import annotations

import jax.numpy as jnp


def resample_mean(u: jnp.ndarray, factor: int, axis: int = -1) -> jnp.ndarray:
    """Block-mean along ``axis`` (finite-volume coarse-graining).

    Coarse point j averages fine points ``j*factor .. (j+1)*factor - 1``.
    """
    if factor == 1:
        return jnp.asarray(u)
    u = jnp.asarray(u)
    axis = axis % u.ndim
    n = u.shape[axis]
    if n % factor:
        raise ValueError(f"axis size {n} not divisible by factor {factor}")
    new_shape = u.shape[:axis] + (n // factor, factor) + u.shape[axis + 1 :]
    return jnp.mean(u.reshape(new_shape), axis=axis + 1)


def subsample(u: jnp.ndarray, factor: int, axis: int = -1) -> jnp.ndarray:
    """Strided subsampling along ``axis`` (finite-difference coarse-graining).

    Coarse point j is fine point ``j*factor`` — both grids share x=0, matching
    ``Grid.resample``.
    """
    if factor == 1:
        return jnp.asarray(u)
    u = jnp.asarray(u)
    axis = axis % u.ndim
    if u.shape[axis] % factor:
        raise ValueError(f"axis size {u.shape[axis]} not divisible by {factor}")
    index = [slice(None)] * u.ndim
    index[axis] = slice(None, None, factor)
    return u[tuple(index)]


RESAMPLE_FUNCS = {
    "mean": resample_mean,
    "subsample": subsample,
}
