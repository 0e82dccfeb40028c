"""WENO5 baseline tests (≈ reference weno_test.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from pde_superresolution_tpu import equations, integrate, weno
from pde_superresolution_tpu.grids import Grid


class TestReconstruction:
    def test_smooth_flux_difference_is_fifth_order(self):
        """FD-WENO property: (h_{j+1/2}-h_{j-1/2})/dx approximates f'(x_j) at
        5th order (the reconstructed h is the numerical flux, NOT the point
        value of f at the face — that differs at O(dx^2) by construction)."""
        errs = []
        for n in [32, 64]:
            x = np.arange(n) * 2 * np.pi / n
            f = jnp.asarray(np.sin(x))
            h = np.asarray(weno.reconstruct_left(f))
            deriv = (h - np.roll(h, 1)) * n / (2 * np.pi)
            errs.append(np.abs(deriv - np.cos(x)).max())
        order = np.log2(errs[0] / errs[1])
        assert order > 4.0, (errs, order)

    def test_left_right_mirror_symmetry(self):
        """right(f) on data == mirror of left(f) on reversed data."""
        rng = np.random.RandomState(0)
        f = jnp.asarray(rng.randn(32))
        left = np.asarray(weno.reconstruct_left(f))
        right_via_flip = np.roll(np.asarray(weno.reconstruct_left(f[::-1]))[::-1], -1)
        right = np.asarray(weno.reconstruct_right(f))
        np.testing.assert_allclose(right, right_via_flip, rtol=1e-5, atol=1e-6)
        assert not np.allclose(left, right)  # genuinely biased differently

    def test_no_overshoot_at_step(self):
        """ENO property: reconstruction at a step stays within data range."""
        f = jnp.asarray(np.where(np.arange(64) < 32, 1.0, 0.0))
        got = np.asarray(weno.reconstruct_left(f))
        assert got.min() > -0.01 and got.max() < 1.01


class TestWENOBurgers:
    def test_matches_spectral_on_smooth(self):
        eq = equations.BurgersEquation(eta=0.1)
        grid = Grid(128, eq.period)
        u = jnp.asarray(0.5 * np.sin(grid.x), dtype=jnp.float32)
        ut_weno = weno.WENODifferentiator(eq, grid).rhs_fn()(u, 0.0)
        ut_spec = integrate.SpectralDifferentiator(eq, grid).rhs_fn()(u, 0.0)
        np.testing.assert_allclose(
            np.asarray(ut_weno), np.asarray(ut_spec), atol=5e-3
        )

    def test_shock_stays_monotone(self):
        """Steepening sine with tiny viscosity: no blowup, TV bounded."""
        eq = equations.BurgersEquation(eta=1e-4)
        grid = Grid(64, eq.period)  # coarse: unresolved shock
        u0 = jnp.asarray(np.sin(grid.x), dtype=jnp.float32)
        rhs = weno.WENODifferentiator(eq, grid).rhs_fn()
        dt = 0.3 * grid.dx  # CFL for max|u|=1
        _, traj = integrate.integrate(rhs, u0, dt, 100, method="rk3_ssp")
        final = np.asarray(traj[-1])
        assert np.isfinite(final).all()
        tv0 = np.abs(np.diff(np.asarray(u0), append=u0[0])).sum()
        tv1 = np.abs(np.diff(final, append=final[0])).sum()
        assert tv1 < tv0 * 1.05, (tv0, tv1)  # total variation non-increasing

    def test_conserves_mass_without_forcing(self):
        eq = equations.BurgersEquation(eta=0.01)
        grid = Grid(64, eq.period)
        rng = np.random.RandomState(1)
        u = jnp.asarray(rng.randn(64), dtype=jnp.float32)
        ut = weno.WENODifferentiator(eq, grid).rhs_fn()(u, 0.0)
        # flux divergence conserves exactly; viscous stencil too
        assert abs(float(jnp.mean(ut))) < 1e-5

    def test_batched(self):
        eq = equations.BurgersEquation()
        grid = Grid(64, eq.period)
        u = eq.initial_conditions(jax.random.PRNGKey(0), grid, (5,))
        ut = weno.WENODifferentiator(eq, grid).rhs_fn()(u, 0.0)
        assert ut.shape == (5, 64)

    def test_rejects_non_burgers(self):
        eq = equations.KSEquation()
        try:
            weno.WENODifferentiator(eq, Grid(64, eq.period))
            assert False, "should have raised"
        except ValueError:
            pass
