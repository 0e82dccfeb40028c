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


class TestModelStableStep:
    """StencilModel.stable_time_step: the model-aware explicit-RK4 CFL.

    The equation-level bound assumes the NARROW classic stencils' spectral
    radii (16/dx^4-style); wider high-accuracy stencils have strictly larger
    radii, and at stencil_size >= 12 the equation dt is unstable outright in
    the highest-derivative-bound regime (measured: KS 8x FV NaNs within a
    few thousand steps). The model-aware bound computes the exact circulant
    symbol of the z=0 scheme and never loosens the equation bound."""

    EQ = equations.from_name("ks", conservative=True)

    def _model(self, stencil, coarse):
        return StencilModel(
            self.EQ, coarse, ModelConfig(stencil_size=stencil)
        )

    def test_narrow_stencils_keep_equation_bound(self):
        coarse = Grid(256, self.EQ.period).resample(4, conservative=True)
        eq_dt = self.EQ.stable_time_step(coarse, u_scale=3.0)
        for stencil in (6, 8):
            m = self._model(stencil, coarse)
            assert m.stable_time_step(u_scale=3.0) == eq_dt, stencil

    def test_bound_tightens_with_width(self):
        coarse = Grid(256, self.EQ.period).resample(4, conservative=True)
        bounds = [
            self._model(s, coarse).linear_stability_bound()
            for s in (6, 8, 10, 12)
        ]
        assert all(a > b for a, b in zip(bounds, bounds[1:])), bounds
        m12 = self._model(12, coarse)
        assert m12.stable_time_step(u_scale=3.0) < self.EQ.stable_time_step(
            coarse, u_scale=3.0
        )

    def test_wide_stencil_unstable_at_equation_dt_stable_at_model_dt(self):
        """The hazard is real: stencil-12 classic FV KS at the EQUATION dt
        blows up; at the MODEL dt it reaches the attractor. dx=0.5 (the
        flagship KS-8x spacing): the exact linear margin at the equation
        dt is 0.95x there — past the boundary (at dx=1 it is 1.08x, which
        is why this test pins the finer spacing)."""
        coarse = Grid(256, self.EQ.period).resample(2, conservative=True)
        assert coarse.dx == 0.5
        model = self._model(12, coarse)
        params = model.init_params(jax.random.PRNGKey(0))
        rhs = model.rhs_fn(params, use_pallas=False)
        u0 = 0.01 * self.EQ.initial_conditions(
            jax.random.PRNGKey(0), coarse, (2,)
        )
        eq_dt = self.EQ.stable_time_step(coarse, u_scale=3.0)
        _, traj = integrate.integrate(rhs, u0, eq_dt, 6000, save_every=6000)
        assert not np.isfinite(np.asarray(traj)).all()
        model_dt = model.stable_time_step(u_scale=3.0)
        steps = int(6000 * eq_dt / model_dt)
        _, traj = integrate.integrate(
            rhs, u0, model_dt, steps, save_every=steps
        )
        assert np.isfinite(np.asarray(traj)).all()
        assert float(jnp.abs(traj).max()) < 10.0  # on the attractor, not blown

    def test_advective_bound_regimes_unchanged(self):
        """Where the advective term binds (KdV 16x s10 - a committed
        recipe), the model bound equals the equation bound bit-for-bit."""
        eq = equations.from_name("kdv", conservative=True)
        coarse = Grid(512, eq.period).resample(16, conservative=True)
        m = StencilModel(eq, coarse, ModelConfig(stencil_size=10))
        assert m.stable_time_step(u_scale=3.0) == eq.stable_time_step(
            coarse, u_scale=3.0
        )


class TestTowerDtype:
    """ModelConfig.tower_dtype: bf16 conv-tower activations (master params
    and the constraint projection stay float32)."""

    def _models(self):
        eq = equations.from_name("ks", conservative=True)
        grid = Grid(256, eq.period).resample(4, conservative=True)
        m32 = StencilModel(eq, grid, ModelConfig(stencil_size=6))
        mbf = StencilModel(
            eq, grid, ModelConfig(stencil_size=6, tower_dtype="bfloat16")
        )
        params = m32.init_params(jax.random.PRNGKey(0))
        # zero-init heads make both towers EXACTLY the baseline; perturb to
        # exercise the tower numerically
        params = jax.tree.map(
            lambda p: p + 0.05 * jax.random.normal(
                jax.random.PRNGKey(1), p.shape, p.dtype
            ),
            params,
        )
        return m32, mbf, params

    def test_close_to_float32(self):
        m32, mbf, params = self._models()
        u = equations.from_name("ks").initial_conditions(
            jax.random.PRNGKey(2), m32.grid, (4,)
        )
        d32 = m32.derivatives(params, u)
        dbf = mbf.derivatives(params, u)
        for d in d32:
            a, b = np.asarray(d32[d]), np.asarray(dbf[d])
            scale = np.abs(a).max() + 1e-6
            assert np.abs(a - b).max() / scale < 0.05, d  # bf16 ~ 3 digits

    def test_grads_finite_and_params_stay_f32(self):
        _, mbf, params = self._models()
        u = equations.from_name("ks").initial_conditions(
            jax.random.PRNGKey(2), mbf.grid, (4,)
        )

        def loss(p):
            return jnp.mean(mbf.time_derivative(p, u) ** 2)

        g = jax.grad(loss)(params)
        for leaf in jax.tree.leaves(g):
            assert leaf.dtype == jnp.float32
            assert np.isfinite(np.asarray(leaf)).all()

    def test_hparams_and_json_round_trip(self):
        from pde_superresolution_tpu.training.config import (
            TrainingConfig,
            parse_hparams,
        )

        cfg = parse_hparams("tower_dtype=bfloat16,filters=16")
        assert cfg.model.tower_dtype == "bfloat16"
        assert TrainingConfig.from_json(cfg.to_json()) == cfg
        # old checkpoints without the field pick up the float32 default
        import json

        raw = json.loads(cfg.to_json())
        del raw["model"]["tower_dtype"]
        old = TrainingConfig.from_json(json.dumps(raw))
        assert old.model.tower_dtype == "float32"
