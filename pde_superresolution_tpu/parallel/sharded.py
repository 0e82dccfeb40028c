"""shard_map'd RHS builders: spatially sharded baseline and learned schemes.

Splits the periodic grid across the mesh "space" axis (with the trajectory
batch optionally sharded over "data"), exchanges stencil/conv halos via
``lax.ppermute`` (halo.py) and keeps ALL other work shard-local. The
returned RHS closures compose with ``integrate.integrate``'s scan under jit,
and are differentiable (ppermute transposes to the reverse permutation), so
the same machinery can back spatially-sharded training.

The spectral (ETDRK4/FFT) path intentionally has no spatially-sharded
variant: distributed FFTs are all-to-all-bound and the exact solver's grids
fit on one chip; shard the trajectory batch instead.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from pde_superresolution_tpu import integrate
from pde_superresolution_tpu.equations import Equation, ForcingParams, forcing_term
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.models import conv_net
from pde_superresolution_tpu.models.stencil_net import StencilModel
from pde_superresolution_tpu.parallel import halo as halo_lib
from pde_superresolution_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS


def _specs(mesh, u_ndim: int, has_forcing: bool):
    """(in_spec for u, spec for x, spec for forcing leaves)."""
    data_in_mesh = DATA_AXIS in mesh.axis_names
    if u_ndim == 1:
        u_spec = P(SPACE_AXIS)
        f_spec = P()
    elif u_ndim == 2:
        u_spec = P(DATA_AXIS if data_in_mesh else None, SPACE_AXIS)
        f_spec = P(DATA_AXIS if data_in_mesh else None)
    else:
        raise ValueError(f"u must be [nx] or [batch, nx], got ndim={u_ndim}")
    # an absent forcing is an empty pytree: any spec prefix works; use P()
    return u_spec, P(SPACE_AXIS), (f_spec if has_forcing else P())


def _divergence(flux_ext: jnp.ndarray, dx: float) -> jnp.ndarray:
    """u_t from face fluxes F on positions [-1 .. local-1] (length local+1)."""
    return -(flux_ext[..., 1:] - flux_ext[..., :-1]) / dx


def sharded_baseline_rhs(
    equation: Equation,
    grid: Grid,
    mesh: jax.sharding.Mesh,
    accuracy_order: int = 2,
    forcing: Optional[ForcingParams] = None,
):
    """Spatially-sharded fixed-stencil RHS ≡ PolynomialDifferentiator.rhs_fn.

    Returns ``rhs(u, t)`` for ``u`` sharded (P("data", "space") or
    P("space")); output sharding matches input.
    """
    diff = integrate.PolynomialDifferentiator(equation, grid, accuracy_order)
    staggered = equation.conservative
    shift = -0.5 if staggered else 0.0
    all_taps = np.concatenate(
        [np.asarray(diff.offsets[d]) - shift for d in diff.offsets]
    )
    reach = int(max(abs(all_taps.min()), abs(all_taps.max())))
    halo = reach + (1 if staggered else 0)
    n_space = mesh.shape[SPACE_AXIS]
    x_global = jnp.asarray(grid.x, dtype=jnp.float32)

    def local_rhs(u, x_local, t, forcing_local):
        u_pad = halo_lib.halo_exchange(u, halo, SPACE_AXIS, n_space)
        if staggered:
            faces = {
                d: halo_lib.apply_stencil_local(
                    u_pad,
                    jnp.asarray(diff.coeffs[d], u.dtype),
                    diff.offsets[d],
                    halo,
                    shift,
                    out_start=-1,
                    out_size=u.shape[-1] + 1,
                )
                for d in diff.offsets
            }
            u_t = _divergence(equation.flux(faces), grid.dx)
        else:
            derivs = {
                d: halo_lib.apply_stencil_local(
                    u_pad,
                    jnp.asarray(diff.coeffs[d], u.dtype),
                    diff.offsets[d],
                    halo,
                )
                for d in diff.offsets
            }
            u_t = equation.equation_of_motion(u, derivs)
        if forcing_local is not None:
            width = grid.dx if equation.conservative else None
            u_t = u_t + forcing_term(
                forcing_local, x_local, t, equation.period, width
            )
        return u_t

    def rhs(u, t):
        u_spec, x_spec, f_spec = _specs(mesh, u.ndim, forcing is not None)
        fn = jax.shard_map(
            local_rhs,
            mesh=mesh,
            in_specs=(u_spec, x_spec, P(), f_spec),
            out_specs=u_spec,
        )
        return fn(u, x_global, jnp.asarray(t, jnp.float32), forcing)

    return rhs


def sharded_model_rhs(
    model: StencilModel,
    params,
    mesh: jax.sharding.Mesh,
    forcing: Optional[ForcingParams] = None,
):
    """Spatially-sharded learned-model RHS ≡ StencilModel.rhs_fn.

    Halo width covers the conv tower's receptive field plus the stencil
    reach; the conv runs VALID on the halo-padded shard (translation
    invariance makes this exactly equivalent to the periodic global conv).
    """
    equation = model.equation
    grid = model.grid
    staggered = equation.conservative
    shift = model._shift
    radius = conv_net.receptive_radius(model.config.tower())
    all_taps = np.concatenate(
        [
            np.asarray(layer.offsets) - shift
            for layer in model.constraint_layers.values()
        ]
    )
    reach = int(max(abs(all_taps.min()), abs(all_taps.max())))
    extra = 1 if staggered else 0  # face at j = -1 for the divergence
    halo = max(radius + extra, reach + extra)
    n_space = mesh.shape[SPACE_AXIS]
    x_global = jnp.asarray(grid.x, dtype=jnp.float32)

    def local_rhs(u, x_local, t, forcing_local):
        local = u.shape[-1]
        u_pad = halo_lib.halo_exchange(u, halo, SPACE_AXIS, n_space)
        # conv features for coefficient positions [-extra, local):
        lo = halo - radius - extra
        hi = halo + local + radius
        zs = conv_net.conv_tower_apply(
            params, u_pad[..., lo:hi], periodic=False,
            # same activation dtype as the unsharded path: without this a
            # tower_dtype=bfloat16 model would compute f32 here and the
            # sharded RHS would diverge from StencilModel.rhs_fn by ~bf16
            # epsilon instead of matching exactly
            dtype=(
                None
                if model.config.tower_dtype == "float32"
                else jnp.dtype(model.config.tower_dtype)
            ),
        )  # -> [..., local + extra, free_dims]
        if staggered:
            faces = {}
            for d, layer in model.constraint_layers.items():
                c = layer(zs[str(d)])
                faces[d] = halo_lib.apply_stencil_local(
                    u_pad, c, layer.offsets, halo, shift,
                    out_start=-extra, out_size=local + extra,
                )
            u_t = _divergence(equation.flux(faces), grid.dx)
        else:
            derivs = {}
            for d, layer in model.constraint_layers.items():
                c = layer(zs[str(d)])
                derivs[d] = halo_lib.apply_stencil_local(
                    u_pad, c, layer.offsets, halo
                )
            u_t = equation.equation_of_motion(u, derivs)
        if forcing_local is not None:
            width = grid.dx if equation.conservative else None
            u_t = u_t + forcing_term(
                forcing_local, x_local, t, equation.period, width
            )
        return u_t

    def rhs(u, t):
        u_spec, x_spec, f_spec = _specs(mesh, u.ndim, forcing is not None)
        fn = jax.shard_map(
            local_rhs,
            mesh=mesh,
            in_specs=(u_spec, x_spec, P(), f_spec),
            out_specs=u_spec,
        )
        return fn(u, x_global, jnp.asarray(t, jnp.float32), forcing)

    return rhs
