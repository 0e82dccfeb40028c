"""Tests for PDE definitions (≈ reference equations_test.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pde_superresolution_tpu import equations, ops
from pde_superresolution_tpu.grids import Grid


def spectral_derivs(u, orders, period):
    return {k: ops.spectral_derivative(u, k, period) for k in orders}


def face_spectral(u, orders, grid):
    """Spectral reconstruction at right faces x_{j+1/2} (exact shift)."""
    n = grid.size
    kvals = ops.wavenumbers(n, grid.period)
    shift = np.exp(1j * kvals * grid.dx / 2)  # translate by +dx/2
    out = {}
    for d in orders:
        mult = (1j * kvals) ** d * shift
        out[d] = jnp.fft.irfft(jnp.fft.rfft(u) * mult, n=n).astype(u.dtype)
    return out


class TestRHSValues:
    """Direct RHS with spectral derivatives matches closed forms."""

    def test_burgers_rhs(self):
        eq = equations.BurgersEquation(eta=0.05)
        grid = Grid(128, eq.period)
        x = grid.x
        u = jnp.asarray(np.sin(x), dtype=jnp.float32)
        derivs = spectral_derivs(u, eq.derivative_orders, eq.period)
        ut = np.asarray(eq.time_derivative(u, derivs, grid))
        expected = -np.sin(x) * np.cos(x) - 0.05 * np.sin(x)
        np.testing.assert_allclose(ut, expected, atol=1e-4)

    def test_kdv_rhs(self):
        eq = equations.KdVEquation()
        grid = Grid(256, eq.period)
        k = 2 * np.pi * 2 / eq.period
        x = grid.x
        u = jnp.asarray(np.sin(k * x), dtype=jnp.float32)
        derivs = spectral_derivs(u, eq.derivative_orders, eq.period)
        ut = np.asarray(eq.time_derivative(u, derivs, grid))
        expected = -6 * np.sin(k * x) * k * np.cos(k * x) + k**3 * np.cos(k * x)
        np.testing.assert_allclose(ut, expected, atol=1e-3)

    def test_ks_rhs(self):
        eq = equations.KSEquation()
        grid = Grid(256, eq.period)
        k = 2 * np.pi * 3 / eq.period
        x = grid.x
        u = jnp.asarray(np.sin(k * x), dtype=jnp.float32)
        derivs = spectral_derivs(u, eq.derivative_orders, eq.period)
        ut = np.asarray(eq.time_derivative(u, derivs, grid))
        expected = (
            -np.sin(k * x) * k * np.cos(k * x)
            + k**2 * np.sin(k * x)
            - k**4 * np.sin(k * x)
        )
        np.testing.assert_allclose(ut, expected, atol=2e-3)


class TestConservativeConsistency:
    """Flux-divergence form ≡ direct form (with exact face reconstructions)."""

    @pytest.mark.parametrize("name", ["burgers", "kdv", "ks"])
    def test_flux_form_matches_direct(self, name):
        eq_direct = equations.from_name(name)
        eq_cons = equations.from_name(name, conservative=True)
        grid = Grid(256, eq_direct.period)
        k = 2 * np.pi * 2 / eq_direct.period
        x = grid.x
        u = jnp.asarray(np.sin(k * x) + 0.3 * np.cos(2 * k * x), dtype=jnp.float32)

        derivs = spectral_derivs(u, eq_direct.derivative_orders, eq_direct.period)
        ut_direct = np.asarray(eq_direct.time_derivative(u, derivs, grid))

        faces = face_spectral(u, eq_cons.derivative_orders, grid)
        ut_cons = np.asarray(eq_cons.time_derivative(u, faces, grid))
        # second-order error from the discrete divergence of exact fluxes
        np.testing.assert_allclose(ut_cons, ut_direct, atol=0.05, rtol=0.05)

    def test_conservation(self):
        """Flux form conserves the mean exactly (telescoping divergence)."""
        eq = equations.from_name("ks", conservative=True)
        grid = Grid(64, eq.period)
        rng = np.random.RandomState(0)
        u = jnp.asarray(rng.randn(64), dtype=jnp.float32)
        faces = {d: jnp.asarray(rng.randn(64), dtype=jnp.float32) for d in eq.derivative_orders}
        ut = np.asarray(eq.time_derivative(u, faces, grid))
        assert abs(ut.mean()) < 1e-5


class TestForcing:
    def test_deterministic_under_seed(self):
        eq = equations.BurgersEquation()
        p1 = eq.sample_forcing(jax.random.PRNGKey(7))
        p2 = eq.sample_forcing(jax.random.PRNGKey(7))
        for a, b in zip(p1, p2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_batch_shape(self):
        eq = equations.BurgersEquation()
        p = eq.sample_forcing(jax.random.PRNGKey(0), batch_shape=(4,))
        assert p.amplitude.shape == (4, eq.num_forcing_terms)
        grid = Grid(32, eq.period)
        f = equations.forcing_term(p, jnp.asarray(grid.x, jnp.float32), 0.5, eq.period)
        assert f.shape == (4, 32)

    def test_unforced_returns_none(self):
        assert equations.KSEquation().sample_forcing(jax.random.PRNGKey(0)) is None

    def test_forcing_is_periodic(self):
        eq = equations.BurgersEquation()
        p = eq.sample_forcing(jax.random.PRNGKey(1))
        x = jnp.asarray([0.0])
        xL = jnp.asarray([eq.period])
        f0 = np.asarray(equations.forcing_term(p, x, 1.3, eq.period))
        fL = np.asarray(equations.forcing_term(p, xL, 1.3, eq.period))
        np.testing.assert_allclose(f0, fL, atol=1e-4)

    def test_wavenumber_range(self):
        eq = equations.BurgersEquation()
        p = eq.sample_forcing(jax.random.PRNGKey(3), batch_shape=(100,))
        k = np.abs(np.asarray(p.k))
        assert k.min() >= eq.forcing_k_min and k.max() <= eq.forcing_k_max

    def test_configurable_band_scales_with_domain(self):
        # Domain generalization (the paper's locality claim): on an N-times
        # larger domain the same PHYSICAL wavelengths are integer
        # wavenumbers N*k, so the bands must be per-instance fields.
        eq = equations.from_name(
            "burgers", period=10 * 2 * np.pi,
            forcing_k_min=30, forcing_k_max=60, num_forcing_terms=40,
        )
        p = eq.sample_forcing(jax.random.PRNGKey(3), batch_shape=(50,))
        k = np.abs(np.asarray(p.k))
        assert p.k.shape == (50, 40)
        assert k.min() >= 30 and k.max() <= 60
        # physical wavenumber band 2*pi*k/L matches the default equation's
        base = equations.BurgersEquation()
        np.testing.assert_allclose(
            2 * np.pi * np.array([30, 60]) / eq.period,
            2 * np.pi * np.array([base.forcing_k_min, base.forcing_k_max])
            / base.period,
        )


class TestInitialConditions:
    def test_shape_and_determinism(self):
        eq = equations.KSEquation()
        grid = Grid(128, eq.period)
        u1 = eq.initial_conditions(jax.random.PRNGKey(0), grid, (3,))
        u2 = eq.initial_conditions(jax.random.PRNGKey(0), grid, (3,))
        assert u1.shape == (3, 128)
        np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))

    def test_band_limited(self):
        eq = equations.KSEquation()
        grid = Grid(256, eq.period)
        u = np.asarray(eq.initial_conditions(jax.random.PRNGKey(1), grid))
        spec = np.abs(np.fft.rfft(u))
        assert spec[eq.ic_k_max + 1 :].max() < 1e-3 * max(spec.max(), 1e-9)

    def test_configurable_ic_band(self):
        eq = equations.from_name("ks", period=640.0, ic_k_min=10, ic_k_max=30)
        grid = Grid(2560, eq.period)
        u = np.asarray(eq.initial_conditions(jax.random.PRNGKey(1), grid))
        spec = np.abs(np.fft.rfft(u))
        assert spec[31:].max() < 1e-3 * max(spec.max(), 1e-9)
        assert spec[:10].max() < 1e-3 * max(spec.max(), 1e-9)


class TestRegistry:
    def test_from_name(self):
        assert isinstance(equations.from_name("burgers"), equations.BurgersEquation)
        assert equations.from_name("conservative_kdv").conservative
        with pytest.raises(ValueError):
            equations.from_name("navier_stokes")

    def test_stable_time_steps_positive_and_scale_down(self):
        for name in ["burgers", "kdv", "ks"]:
            eq = equations.from_name(name)
            fine, coarse = Grid(512, eq.period), Grid(64, eq.period)
            assert 0 < eq.stable_time_step(fine) < eq.stable_time_step(coarse)


class TestCellAveragedForcing:
    def test_forcing_cell_average_matches_block_mean(self):
        """forcing_term(cell centers, cell_width) must equal the block mean
        of the finely-sampled forcing — the conservative label consistency
        fix (DECISIONS #3 geometry + sinc amplitude factor)."""
        eq = equations.BurgersEquation()
        fine = Grid(512, eq.period)
        factor = 8
        coarse = fine.resample(factor, conservative=True)
        p = eq.sample_forcing(jax.random.PRNGKey(0))
        t = 0.7
        f_fine = equations.forcing_term(
            p, jnp.asarray(fine.x, jnp.float32), t, eq.period
        )
        want = np.asarray(ops.resample_mean(f_fine, factor))
        got = np.asarray(
            equations.forcing_term(
                p, jnp.asarray(coarse.x, jnp.float32), t, eq.period,
                cell_width=coarse.dx,
            )
        )
        # block mean of 8 point samples vs exact integral: O((dx_f k)^2) err
        np.testing.assert_allclose(got, want, atol=2e-3)

    def test_point_forcing_is_biased_at_coarse_cells(self):
        """Sanity: WITHOUT the fix the error is ~25% of forcing amplitude."""
        eq = equations.BurgersEquation()
        fine = Grid(512, eq.period)
        factor = 8
        coarse_naive = fine.resample(factor)  # origin 0, point values
        p = eq.sample_forcing(jax.random.PRNGKey(0))
        f_fine = equations.forcing_term(
            p, jnp.asarray(fine.x, jnp.float32), 0.7, eq.period
        )
        want = np.asarray(ops.resample_mean(f_fine, factor))
        naive = np.asarray(
            equations.forcing_term(
                p, jnp.asarray(coarse_naive.x, jnp.float32), 0.7, eq.period
            )
        )
        err = np.abs(naive - want).max() / np.abs(want).max()
        assert err > 0.05, err  # the bias the fix removes is material


class TestGridOrigin:
    def test_conservative_resample_centers(self):
        fine = Grid(64, 8.0)
        coarse = fine.resample(8, conservative=True)
        # cell j = fine points 8j..8j+7; center = (8j + 3.5) * dx_f
        np.testing.assert_allclose(coarse.x, (np.arange(8) * 8 + 3.5) * fine.dx)
        # subsample convention unchanged
        np.testing.assert_allclose(fine.resample(8).x, np.arange(8) * 8 * fine.dx)

    def test_origin_composes(self):
        g = Grid(64, 8.0).resample(4, conservative=True).resample(
            4, conservative=True
        )
        # two-level block mean == one 16x block mean: centers must agree
        g2 = Grid(64, 8.0).resample(16, conservative=True)
        np.testing.assert_allclose(g.x, g2.x)
