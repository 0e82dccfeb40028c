"""Periodic 1-D convolution tower: pure init/apply functions.

The feature extractor of the learned-discretization model (≈ model.py's conv
stack inside §predict_coefficients, unverified — see SURVEY.md). Defaults
follow the paper: 3 layers x 32 filters, kernel size 5, ReLU.

TPU notes: convolutions lower to XLA convs that tile onto the MXU; periodic
boundary handling is an explicit wrap-pad (cheap, fuses with the conv's own
padding logic). Heads that feed constraint layers are zero-initialized so a
freshly initialized model reproduces the classic baseline stencils exactly —
training starts from a *consistent, stable* scheme rather than noise.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ConvTowerConfig:
    num_layers: int = 3
    filters: int = 32
    kernel_size: int = 5


def _periodic_pad(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Wrap-pad the spatial (second-to-last) axis for a VALID conv."""
    left = (kernel_size - 1) // 2
    right = kernel_size // 2
    parts = []
    if left:
        parts.append(x[..., -left:, :])
    parts.append(x)
    if right:
        parts.append(x[..., :right, :])
    return jnp.concatenate(parts, axis=-2)


def conv_tower_init(
    key: jax.Array,
    config: ConvTowerConfig,
    head_dims: dict,
    in_channels: int = 1,
) -> dict:
    """Initialize tower + per-head params.

    Args:
      head_dims: mapping head_name -> output channels. Heads are 1x1 convs
        with ZERO init (see module docstring).

    Returns a params pytree:
      {"tower": [(w, b), ...], "heads": {name: (w, b)}}
    """
    params_tower = []
    cin = in_channels
    init = jax.nn.initializers.he_normal()
    for i in range(config.num_layers):
        key, sub = jax.random.split(key)
        w = init(sub, (config.kernel_size, cin, config.filters), jnp.float32)
        b = jnp.zeros((config.filters,), jnp.float32)
        params_tower.append((w, b))
        cin = config.filters
    heads = {}
    for name, dims in head_dims.items():
        w = jnp.zeros((1, cin, dims), jnp.float32)
        b = jnp.zeros((dims,), jnp.float32)
        heads[str(name)] = (w, b)
    return {"tower": params_tower, "heads": heads}


def receptive_radius(config: ConvTowerConfig) -> int:
    """Half-width of the tower's receptive field (odd kernels)."""
    return config.num_layers * ((config.kernel_size - 1) // 2)


def conv_tower_apply(
    params: dict,
    u: jnp.ndarray,
    periodic: bool = True,
    dtype: jnp.dtype | None = None,
) -> dict:
    """Run the tower on a field ``u [..., nx]`` -> {head: [..., out, dims]}.

    Arbitrary leading batch dims are flattened for the conv and restored.

    With ``periodic=False`` (the spatially-sharded path), no wrap padding is
    applied: each conv is VALID, so the output length shrinks by
    ``2 * receptive_radius`` — callers feed halo-padded shards
    (parallel/sharded.py).

    ``dtype`` (e.g. ``jnp.bfloat16``) sets the ACTIVATION compute dtype:
    the field and the (float32 master) params are cast on entry, and head
    outputs are cast back to float32 on exit — so downstream consumers
    (the HIGHEST-precision constraint projection) are unaffected. The
    matmuls already run bf16 on the TPU MXU by default; this additionally
    halves activation HBM traffic (ModelConfig.tower_dtype).
    """
    u = jnp.asarray(u)
    batch_shape = u.shape[:-1]
    nx = u.shape[-1]
    h = u.reshape((-1, nx, 1))
    cast = (lambda x: x.astype(dtype)) if dtype is not None else (lambda x: x)
    h = cast(h)
    for w, b in params["tower"]:
        if periodic:
            h = _periodic_pad(h, w.shape[0])
        h = jax.lax.conv_general_dilated(
            h, cast(w), (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC")
        )
        h = jax.nn.relu(h + cast(b))
    out = {}
    for name, (w, b) in params["heads"].items():
        z = jax.lax.conv_general_dilated(
            h, cast(w), (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC")
        ) + cast(b)
        if dtype is not None:
            # cast back to the PARAMS' dtype (not a hard-coded float32) so
            # downstream consumers see the master-weight precision
            # regardless of the activation dtype; with dtype=None the
            # output keeps the params' own dtype either way (a float64
            # tower must stay float64 — conv_tower_init emits float32, so
            # this is float32 for every library-built model)
            z = z.astype(w.dtype)
        out[name] = z.reshape(batch_shape + (z.shape[1], z.shape[-1]))
    return out
