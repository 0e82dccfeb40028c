"""Pallas kernel vs pure-XLA reference equivalence (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pde_superresolution_tpu import equations, integrate, stencils
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.models import ModelConfig, StencilModel
from pde_superresolution_tpu.ops import pallas_kernels as pk


BATCH, NX = 16, 128


class TestFusedRHS:
    @pytest.mark.parametrize("name,cons", [
        ("ks", True), ("ks", False), ("kdv", True), ("burgers", True),
    ])
    def test_matches_model_rhs(self, name, cons):
        eq = equations.from_name(name, conservative=cons)
        grid = Grid(NX, eq.period)
        model = StencilModel(
            eq, grid, ModelConfig(num_layers=2, filters=8,
                                  stencil_size=6 if cons else 7)
        )
        params = jax.tree.map(
            lambda leaf: 0.05 * jax.random.normal(jax.random.PRNGKey(0), leaf.shape),
            model.init_params(jax.random.PRNGKey(0)),
        )
        u = eq.initial_conditions(jax.random.PRNGKey(1), grid, (BATCH,))
        coeffs = model.coefficients(params, u)
        want = np.asarray(
            eq.time_derivative(u, model.derivatives(params, u), grid)
        )

        offsets_map = {
            d: layer.offsets for d, layer in model.constraint_layers.items()
        }
        rhs = pk.make_fused_rhs(
            eq, grid, offsets_map, model._shift, forced=False, interpret=True
        )
        got = np.asarray(rhs(u, coeffs))
        # float32 with different accumulation order than the XLA twin:
        # bit-exactness is not expected, agreement to ~1e-4 is
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_forcing_field_added(self):
        eq = equations.from_name("burgers", conservative=True)
        grid = Grid(NX, eq.period)
        model = StencilModel(eq, grid, ModelConfig(num_layers=1, filters=4, stencil_size=4))
        params = model.init_params(jax.random.PRNGKey(0))
        u = eq.initial_conditions(jax.random.PRNGKey(1), grid, (BATCH,))
        coeffs = model.coefficients(params, u)
        f = jax.random.normal(jax.random.PRNGKey(2), u.shape)
        offsets_map = {d: l.offsets for d, l in model.constraint_layers.items()}
        rhs = pk.make_fused_rhs(eq, grid, offsets_map, model._shift,
                                forced=True, interpret=True)
        got = np.asarray(rhs(u, coeffs, f))
        want = np.asarray(
            eq.time_derivative(u, model.derivatives(params, u), grid)
        ) + np.asarray(f)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_unsupported_shape_raises(self):
        eq = equations.from_name("ks", conservative=True)
        grid = Grid(100, eq.period)
        rhs = pk.make_fused_rhs(eq, grid, {0: [-0.5, 0.5]}, -0.5, forced=False,
                                interpret=True)
        with pytest.raises(ValueError):
            rhs(jnp.zeros((16, 100)), {0: jnp.zeros((16, 100, 2))})


class TestFusedRK4:
    @pytest.mark.parametrize("name,cons", [("ks", True), ("kdv", False)])
    def test_matches_scan_integration(self, name, cons):
        eq = equations.from_name(name, conservative=cons)
        grid = Grid(NX, eq.period)
        u0 = 0.3 * eq.initial_conditions(jax.random.PRNGKey(0), grid, (BATCH,))
        dt = eq.stable_time_step(grid)
        steps = 10
        advance = pk.make_fused_rk4(eq, grid, dt, steps, interpret=True)
        got = np.asarray(advance(u0))
        rhs = integrate.PolynomialDifferentiator(eq, grid).rhs_fn()
        _, traj = integrate.integrate(rhs, u0, dt, steps)
        want = np.asarray(traj[-1])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)

    def test_forced_equation_rejected(self):
        eq = equations.from_name("burgers")
        with pytest.raises(ValueError):
            pk.make_fused_rk4(eq, Grid(NX, eq.period), 0.01, 5, interpret=True)
