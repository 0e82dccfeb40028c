"""Integration tests (≈ reference integrate_test.py): convergence, exactness."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pde_superresolution_tpu import equations, integrate, ops
from pde_superresolution_tpu.grids import Grid


class TestRKSteppers:
    def test_rk4_order_on_scalar_ode(self):
        """RK4 global error scales like dt^4 on u' = u."""
        rhs = lambda u, t: u
        errs = []
        for n in [2, 4]:  # coarse steps: finer ones hit the float32 noise floor
            dt = 1.0 / n
            _, traj = integrate.integrate(rhs, jnp.ones(()), dt, n)
            errs.append(abs(float(traj[-1]) - np.e))
        order = np.log2(errs[0] / errs[1])
        assert order > 3.5, (errs, order)

    def test_rk3_runs(self):
        rhs = lambda u, t: -u
        _, traj = integrate.integrate(rhs, jnp.ones(()), 0.1, 10, method="rk3_ssp")
        assert abs(float(traj[-1]) - np.exp(-1)) < 1e-3

    def test_time_dependent_rhs(self):
        """u' = cos(t), u(0)=0 -> u(T)=sin(T): t must thread correctly."""
        rhs = lambda u, t: jnp.cos(t)
        times, traj = integrate.integrate(rhs, jnp.zeros(()), 0.05, 40)
        np.testing.assert_allclose(float(traj[-1]), np.sin(2.0), atol=1e-5)
        np.testing.assert_allclose(float(times[-1]), 2.0, atol=1e-5)

    def test_save_every(self):
        rhs = lambda u, t: u
        times, traj = integrate.integrate(rhs, jnp.ones(()), 0.01, 100, save_every=25)
        assert traj.shape == (5,)
        np.testing.assert_allclose(np.asarray(times), [0, 0.25, 0.5, 0.75, 1.0], atol=1e-6)

    def test_batched_integration(self):
        rhs = lambda u, t: -u
        u0 = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        _, traj = integrate.integrate(rhs, u0, 0.1, 10)
        assert traj.shape == (11, 2, 2)
        np.testing.assert_allclose(
            np.asarray(traj[-1]), np.asarray(u0) * np.exp(-1), rtol=1e-4
        )


class TestPolynomialDifferentiator:
    def test_convergence_to_spectral(self):
        """Baseline FD RHS converges to the spectral RHS as the grid refines."""
        errors = []
        for n in [32, 64, 128]:
            eq = equations.BurgersEquation()
            grid = Grid(n, eq.period)
            x = grid.x
            u = jnp.asarray(np.sin(x) + 0.5 * np.cos(2 * x), dtype=jnp.float32)
            fd = integrate.PolynomialDifferentiator(eq, grid).rhs_fn()(u, 0.0)
            sp = integrate.SpectralDifferentiator(eq, grid).rhs_fn()(u, 0.0)
            errors.append(float(jnp.abs(fd - sp).max()))
        assert errors[0] > errors[1] > errors[2]
        order = np.log2(errors[1] / errors[2])
        assert order > 1.5, (errors, order)

    def test_conservative_baseline_conserves_mass(self):
        eq = equations.from_name("burgers", conservative=True)
        grid = Grid(64, eq.period)
        u = jnp.asarray(np.sin(grid.x), dtype=jnp.float32)
        ut = integrate.PolynomialDifferentiator(eq, grid).rhs_fn()(u, 0.0)
        assert abs(float(ut.mean())) < 1e-6

    def test_stencil_sizes(self):
        assert integrate.baseline_stencil_size(1, 2, False) == 3
        assert integrate.baseline_stencil_size(2, 2, False) == 5
        assert integrate.baseline_stencil_size(0, 2, True) == 2
        assert integrate.baseline_stencil_size(4, 2, False) == 7


class TestETDRK4:
    def test_pure_linear_decay_exact(self):
        """With N=0 terms (u small), Burgers ETDRK4 ~ exact heat decay."""
        eq = equations.BurgersEquation(eta=0.1)
        grid = Grid(64, eq.period)
        amp = 1e-4  # nonlinearity negligible
        u0 = jnp.asarray(amp * np.sin(grid.x), dtype=jnp.float32)
        T, steps = 2.0, 20
        _, traj = integrate.integrate_spectral(eq, grid, u0, T / steps, steps)
        expected = amp * np.sin(grid.x) * np.exp(-0.1 * T)
        np.testing.assert_allclose(np.asarray(traj[-1]), expected, atol=amp * 1e-3)

    def test_etdrk4_matches_rk4_burgers(self):
        """Nonlinear forced Burgers: ETDRK4 and fine-step RK4+spectral agree.

        Uses eta=0.1 so shocks stay resolved at n=128 (physical eta=0.01
        needs n >= ~1024 for resolved spectral solves — covered elsewhere).
        """
        eq = equations.BurgersEquation(eta=0.1)
        grid = Grid(128, eq.period)
        key = jax.random.PRNGKey(0)
        u0 = 0.5 * eq.initial_conditions(key, grid)
        forcing = eq.sample_forcing(jax.random.PRNGKey(1))
        T = 0.5
        _, traj_etd = integrate.integrate_spectral(
            eq, grid, u0, T / 100, 100, forcing=forcing
        )
        rhs = integrate.SpectralDifferentiator(eq, grid).rhs_fn(forcing)
        _, traj_rk4 = integrate.integrate(rhs, u0, T / 2000, 2000)
        np.testing.assert_allclose(
            np.asarray(traj_etd[-1]), np.asarray(traj_rk4[-1]), atol=5e-3
        )

    def test_kdv_soliton_propagation(self):
        """Single-soliton of u_t = -6uu_x - u_xxx: u = (c/2) sech^2 - travels
        at speed c with unchanged shape (classic exact solution)."""
        eq = equations.KdVEquation()
        grid = Grid(256, eq.period)
        c = 4.0
        x = grid.x
        x0 = eq.period / 2
        sech = lambda y: 1 / np.cosh(y)
        u0_np = 0.5 * c * sech(np.sqrt(c) / 2 * (x - x0)) ** 2
        u0 = jnp.asarray(u0_np, dtype=jnp.float32)
        T = 1.0
        _, traj = integrate.integrate_spectral(eq, grid, u0, T / 1000, 1000)
        # expected: translated by c*T = 4.0
        shift = c * T
        expected = 0.5 * c * sech(np.sqrt(c) / 2 * ((x - x0 - shift + eq.period/2) % eq.period - eq.period/2)) ** 2
        np.testing.assert_allclose(np.asarray(traj[-1]), expected, atol=2e-2)

    def test_ks_stays_bounded_and_chaotic(self):
        """KS on L=64: solution hits the attractor (rms ~ O(1)), stays finite."""
        eq = equations.KSEquation()
        grid = Grid(128, eq.period)
        u0 = eq.initial_conditions(jax.random.PRNGKey(2), grid) * 0.1
        dt = 0.05
        _, traj = integrate.integrate_spectral(eq, grid, u0, dt, 2000, save_every=200)
        final = np.asarray(traj[-1])
        assert np.isfinite(final).all()
        rms = np.sqrt((final**2).mean())
        assert 0.5 < rms < 4.0, rms  # KS attractor rms is ~1.3

    def test_batched_spectral_integration(self):
        eq = equations.KSEquation()
        grid = Grid(64, eq.period)
        u0 = eq.initial_conditions(jax.random.PRNGKey(3), grid, (4,))
        _, traj = integrate.integrate_spectral(eq, grid, u0, 0.05, 20)
        assert traj.shape == (21, 4, 64)
        assert np.isfinite(np.asarray(traj)).all()


class TestEndToEndSlice:
    """BASELINE.json config #1: forced Burgers, fixed baseline stencils, RK4,
    validated against the coarse-grained spectral solve.

    Empirical stability map (documented behavior, matches shock physics at
    eta=0.01): the non-conservative centered-FD baseline is only stable up to
    ~2x coarsening (cell-Peclet limit); the conservative finite-volume
    baseline stays stable and accurate through 8x — which is why the paper
    leans on flux-form models for Burgers.
    """

    @pytest.fixture(scope="class")
    def burgers_setup(self):
        eq = equations.BurgersEquation()
        fine = Grid(1024, eq.period)
        u0 = eq.initial_conditions(jax.random.PRNGKey(42), fine)
        forcing = eq.sample_forcing(jax.random.PRNGKey(5))
        T = 1.0
        _, traj = integrate.integrate_spectral(
            eq, fine, u0, T / 1000, 1000, save_every=1000, forcing=forcing
        )
        return eq, fine, u0, forcing, T, traj[-1]

    def test_conservative_baseline_8x(self, burgers_setup):
        eq, fine, u0, forcing, T, u_exact = burgers_setup
        factor = 8
        coarse = fine.resample(factor)
        eq_cons = equations.BurgersEquation(conservative=True)
        rhs = integrate.PolynomialDifferentiator(eq_cons, coarse, accuracy_order=2).rhs_fn(forcing)
        u0c = ops.resample_mean(u0, factor)
        dt = eq.stable_time_step(coarse, u_scale=3.0)
        steps = int(np.ceil(T / dt))
        _, trc = integrate.integrate(rhs, u0c, T / steps, steps, save_every=steps)
        got = np.asarray(trc[-1])
        exact_coarse = np.asarray(ops.resample_mean(u_exact, factor))
        assert np.isfinite(got).all()
        mae = np.abs(got - exact_coarse).mean()
        assert mae < 0.15 * np.abs(exact_coarse).mean(), mae

    def test_nonconservative_baseline_2x(self, burgers_setup):
        eq, fine, u0, forcing, T, u_exact = burgers_setup
        factor = 2
        coarse = fine.resample(factor)
        rhs = integrate.PolynomialDifferentiator(eq, coarse, accuracy_order=4).rhs_fn(forcing)
        u0c = ops.subsample(u0, factor)
        dt = eq.stable_time_step(coarse, u_scale=3.0)
        steps = int(np.ceil(T / dt))
        _, trc = integrate.integrate(rhs, u0c, T / steps, steps, save_every=steps)
        got = np.asarray(trc[-1])
        exact_coarse = np.asarray(ops.subsample(u_exact, factor))
        assert np.isfinite(got).all()
        mae = np.abs(got - exact_coarse).mean()
        assert mae < 0.02 * np.abs(exact_coarse).mean(), mae


class TestResumableIntegration:
    def test_matches_plain_and_resumes(self, tmp_path):
        rhs = lambda u, t: -u + jnp.sin(t)
        u0 = jnp.ones((4, 8))
        dt, steps, save = 0.05, 40, 10
        path = str(tmp_path / "store.h5")
        times, traj = integrate.integrate_resumable(rhs, u0, dt, steps, save, path)
        _, want = integrate.integrate(rhs, u0, dt, steps, save_every=save)
        np.testing.assert_allclose(np.asarray(traj), np.asarray(want), rtol=1e-6)

        # simulate a crash after 2 chunks: rewind the cursor, re-run
        import h5py
        with h5py.File(path, "a") as f:
            f.attrs["next"] = 3
            f.attrs["carry_t"] = 2 * save * dt
            f["carry_u"][...] = np.asarray(traj[2])
            f["u"][3:] = 0.0
        _, traj2 = integrate.integrate_resumable(rhs, u0, dt, steps, save, path)
        np.testing.assert_allclose(np.asarray(traj2), np.asarray(want), rtol=1e-6)

    def test_shape_mismatch_rejected(self, tmp_path):
        rhs = lambda u, t: -u
        path = str(tmp_path / "s.h5")
        integrate.integrate_resumable(rhs, jnp.ones(8), 0.1, 4, 2, path)
        with pytest.raises(ValueError):
            integrate.integrate_resumable(rhs, jnp.ones(16), 0.1, 4, 2, path)
