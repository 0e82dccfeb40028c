"""Model tests (≈ reference model_test.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pde_superresolution_tpu import equations, integrate
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.models import ModelConfig, StencilModel


@pytest.fixture(params=["burgers", "kdv", "ks"])
def model_and_u(request):
    eq = equations.from_name(request.param, conservative=False)
    grid = Grid(64, eq.period)
    model = StencilModel(eq, grid, ModelConfig(num_layers=2, filters=8))
    params = model.init_params(jax.random.PRNGKey(0))
    u = eq.initial_conditions(jax.random.PRNGKey(1), grid, (3,))
    return model, params, u


class TestZeroInitIsBaseline:
    def test_fresh_model_equals_baseline(self, model_and_u):
        """Zero-initialized heads => coefficients == classic stencils."""
        model, params, u = model_and_u
        got = model.derivatives(params, u)
        want = model.baseline_derivatives(u)
        for d in got:
            np.testing.assert_allclose(
                np.asarray(got[d]), np.asarray(want[d]), rtol=1e-5, atol=1e-5
            )

    def test_fresh_conservative_model_equals_baseline(self):
        eq = equations.from_name("burgers", conservative=True)
        grid = Grid(64, eq.period)
        model = StencilModel(eq, grid, ModelConfig(num_layers=2, filters=8, stencil_size=6))
        params = model.init_params(jax.random.PRNGKey(0))
        u = eq.initial_conditions(jax.random.PRNGKey(1), grid)
        got = model.derivatives(params, u)
        want = model.baseline_derivatives(u)
        for d in got:
            np.testing.assert_allclose(
                np.asarray(got[d]), np.asarray(want[d]), rtol=1e-5, atol=1e-5
            )


class TestConstraints:
    def test_trained_like_coefficients_satisfy_constraints(self, model_and_u):
        """Even with random (non-zero) params, coefficients stay constrained."""
        model, params, u = model_and_u
        # randomize head weights so z != 0
        params = jax.tree.map(
            lambda leaf: jax.random.normal(jax.random.PRNGKey(2), leaf.shape) * 0.1,
            params,
        )
        coeffs = model.coefficients(params, u)
        from pde_superresolution_tpu import stencils

        for d, layer in model.constraint_layers.items():
            a, b = stencils.constraints(
                np.asarray(layer.offsets),
                stencils.Method.FINITE_DIFFERENCES,
                d,
                model.config.polynomial_accuracy_order,
            )
            # physical coefficients: scale grid-unit system by dx^-d
            c = np.asarray(coeffs[d], dtype=np.float64) * model.grid.dx**d
            resid = c @ a.T - b
            assert np.abs(resid).max() < 1e-4, (d, np.abs(resid).max())

    def test_unconstrained_mode(self):
        eq = equations.from_name("burgers")
        grid = Grid(32, eq.period)
        model = StencilModel(
            eq, grid, ModelConfig(num_layers=1, filters=4, constrained=False)
        )
        params = model.init_params(jax.random.PRNGKey(0))
        u = eq.initial_conditions(jax.random.PRNGKey(1), grid)
        # still reduces to baseline at zero init
        got = model.derivatives(params, u)
        want = model.baseline_derivatives(u)
        for d in got:
            np.testing.assert_allclose(
                np.asarray(got[d]), np.asarray(want[d]), rtol=1e-5, atol=1e-5
            )


class TestShapesAndIntegration:
    def test_shapes(self, model_and_u):
        model, params, u = model_and_u
        coeffs = model.coefficients(params, u)
        for d, layer in model.constraint_layers.items():
            assert coeffs[d].shape == u.shape + (layer.stencil_size,)
        ut = model.time_derivative(params, u)
        assert ut.shape == u.shape

    def test_model_rhs_integrates(self):
        """A fresh model plugged into integrate() reproduces the baseline
        trajectory exactly."""
        eq = equations.from_name("kdv")
        grid = Grid(64, eq.period)
        model = StencilModel(eq, grid, ModelConfig(num_layers=2, filters=8))
        params = model.init_params(jax.random.PRNGKey(0))
        u0 = 0.1 * eq.initial_conditions(jax.random.PRNGKey(1), grid)
        dt = eq.stable_time_step(grid)
        _, traj_model = integrate.integrate(model.rhs_fn(params), u0, dt, 20)
        base = integrate.PolynomialDifferentiator(
            eq, grid, stencil_size=model.constraint_layers[1].stencil_size
        )
        _, traj_base = integrate.integrate(base.rhs_fn(), u0, dt, 20)
        np.testing.assert_allclose(
            np.asarray(traj_model[-1]), np.asarray(traj_base[-1]), atol=1e-5
        )

    def test_jit_and_grad(self, model_and_u):
        model, params, u = model_and_u

        @jax.jit
        def loss(p):
            return jnp.mean(model.time_derivative(p, u) ** 2)

        g = jax.grad(loss)(params)
        flat = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(leaf)).all() for leaf in flat)
