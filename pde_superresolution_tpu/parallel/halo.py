"""Ring halo exchange and halo-padded stencil application.

The spatial-sharding primitive (SURVEY.md §5 "long-context" analogue): the
periodic 1-D grid is split into contiguous shards over the mesh "space"
axis; each RHS evaluation exchanges ``halo``-wide edges with ring neighbors
via ``lax.ppermute`` (O(halo) payloads over ICI — structurally ring
attention's neighbor exchange with tiny messages), after which all stencil
work is shard-local.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def halo_exchange(u: jnp.ndarray, halo: int, axis_name: str, axis_size: int) -> jnp.ndarray:
    """Pad the last axis of a shard with its ring neighbors' edges.

    Must be called inside shard_map over ``axis_name``. Returns
    ``[..., halo + local + halo]``. With a single shard this degenerates to
    periodic wrap padding (no communication).
    """
    if halo == 0:
        return u
    if u.shape[-1] < halo:
        raise ValueError(f"shard width {u.shape[-1]} < halo {halo}")
    left_edge = u[..., :halo]
    right_edge = u[..., -halo:]
    if axis_size == 1:
        return jnp.concatenate([right_edge, u, left_edge], axis=-1)
    # receive left neighbor's right edge (their data sits to our left)
    from_left = jax.lax.ppermute(
        right_edge,
        axis_name,
        [(i, (i + 1) % axis_size) for i in range(axis_size)],
    )
    # receive right neighbor's left edge
    from_right = jax.lax.ppermute(
        left_edge,
        axis_name,
        [(i, (i - 1) % axis_size) for i in range(axis_size)],
    )
    return jnp.concatenate([from_left, u, from_right], axis=-1)


def apply_stencil_local(
    u_padded: jnp.ndarray,
    coeffs: jnp.ndarray,
    offsets: Sequence[float],
    halo: int,
    shift: float = 0.0,
    out_start: int = 0,
    out_size: int | None = None,
) -> jnp.ndarray:
    """Shard-local stencil application on halo-padded data (no wraparound).

    Computes ``out[..., j] = sum_i coeffs[..., j, i] * u_padded[..., halo +
    out_start + j + tap_i]`` for ``j in [0, out_size)`` where ``tap_i =
    offsets[i] - shift`` — the non-periodic counterpart of
    ``stencils.apply_stencil`` (index convention identical; tested equal).

    Args:
      out_start: first output position relative to the shard's own origin
        (e.g. -1 to also produce the face left of the shard boundary for a
        conservative divergence).
      out_size: number of outputs (default: local size = padded - 2*halo).
    """
    offsets = np.asarray(offsets, dtype=np.float64)
    taps = offsets - shift
    int_taps = np.round(taps).astype(int)
    if not np.allclose(taps, int_taps, atol=1e-9):
        raise ValueError(f"offsets {offsets} with shift {shift} off-grid")
    local = u_padded.shape[-1] - 2 * halo
    if out_size is None:
        out_size = local
    lo = halo + out_start + int(int_taps.min())
    hi = halo + out_start + out_size - 1 + int(int_taps.max())
    if lo < 0 or hi >= u_padded.shape[-1]:
        raise ValueError(
            f"halo {halo} too small for taps {int_taps} with "
            f"out_start={out_start}, out_size={out_size}"
        )
    shifted = jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(
                u_padded, halo + out_start + int(t), out_size, axis=-1
            )
            for t in int_taps
        ],
        axis=-1,
    )
    return jnp.sum(coeffs * shifted, axis=-1)
