"""Golden-numerics tests for stencil math (≈ reference polynomials_test.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from pde_superresolution_tpu import stencils
from pde_superresolution_tpu.stencils import Method


class TestClassicStencils:
    """coefficients() must reproduce textbook finite-difference tables."""

    @pytest.mark.parametrize(
        "offsets,order,expected",
        [
            ([-1, 0, 1], 1, [-0.5, 0, 0.5]),
            ([-1, 0, 1], 2, [1, -2, 1]),
            ([-2, -1, 0, 1, 2], 1, [1 / 12, -2 / 3, 0, 2 / 3, -1 / 12]),
            ([-2, -1, 0, 1, 2], 2, [-1 / 12, 4 / 3, -5 / 2, 4 / 3, -1 / 12]),
            ([-2, -1, 0, 1, 2], 3, [-0.5, 1, 0, -1, 0.5]),
            ([-2, -1, 0, 1, 2], 4, [1, -4, 6, -4, 1]),
            ([0, 1], 1, [-1, 1]),
            ([-1, 0], 1, [-1, 1]),
            ([0, 1, 2], 1, [-1.5, 2, -0.5]),  # one-sided 2nd order
            ([0], 0, [1]),
        ],
    )
    def test_finite_difference_tables(self, offsets, order, expected):
        got = stencils.coefficients(offsets, Method.FINITE_DIFFERENCES, order)
        np.testing.assert_allclose(got, expected, atol=1e-10)

    def test_dx_scaling(self):
        dx = 0.1
        got = stencils.coefficients([-1, 0, 1], Method.FINITE_DIFFERENCES, 2, dx=dx)
        np.testing.assert_allclose(got, np.array([1, -2, 1]) / dx**2, atol=1e-8)

    def test_finite_volume_interpolation_to_face(self):
        # Reconstruct the value at a face from 2 neighboring cell averages:
        # for linear u this is the arithmetic mean.
        offsets = [-0.5, 0.5]
        got = stencils.coefficients(offsets, Method.FINITE_VOLUMES, 0)
        np.testing.assert_allclose(got, [0.5, 0.5], atol=1e-10)

    def test_finite_volume_first_derivative_at_face(self):
        # d/dx at a face from 2 cell averages = (u_R - u_L)/dx, exact for
        # quadratics by symmetry.
        got = stencils.coefficients([-0.5, 0.5], Method.FINITE_VOLUMES, 1)
        np.testing.assert_allclose(got, [-1, 1], atol=1e-10)

    def test_finite_volume_4cell_face_value(self):
        # Classic 4-cell face reconstruction: [-1/12, 7/12, 7/12, -1/12].
        got = stencils.coefficients([-1.5, -0.5, 0.5, 1.5], Method.FINITE_VOLUMES, 0)
        np.testing.assert_allclose(got, [-1 / 12, 7 / 12, 7 / 12, -1 / 12], atol=1e-10)


class TestConstraints:
    def test_constraint_residual_for_classic_stencil(self):
        a, b = stencils.constraints([-1, 0, 1], Method.FINITE_DIFFERENCES, 2, 1)
        c = np.array([1.0, -2.0, 1.0])
        np.testing.assert_allclose(a @ c, b, atol=1e-12)

    def test_overdetermined_raises(self):
        with pytest.raises(ValueError):
            stencils.constraints([-1, 0, 1], Method.FINITE_DIFFERENCES, 2, 5)


class TestPolynomialBias:
    def test_bias_only_layer(self):
        """PolynomialBias (≈ reference polynomials.py §PolynomialBias,
        unverified): classic-stencil bias + raw network output, no
        constraint projection."""
        offsets = stencils.stencil_offsets(5)
        classic = stencils.coefficients(offsets, Method.FINITE_DIFFERENCES, 2)
        layer = stencils.PolynomialBias(
            offsets=tuple(offsets.tolist()), derivative_order=2, c0=classic
        )
        assert layer.free_dims == 5  # unconstrained: one dof per tap
        np.testing.assert_allclose(
            np.asarray(layer(jnp.zeros(5))), classic, atol=1e-7
        )
        z = jnp.asarray([1.0, 0.0, -1.0, 0.5, 0.0])
        np.testing.assert_allclose(
            np.asarray(layer(z)), classic + np.asarray(z), atol=1e-6
        )


class TestPolynomialAccuracy:
    @pytest.mark.parametrize("method", [Method.FINITE_DIFFERENCES, Method.FINITE_VOLUMES])
    @pytest.mark.parametrize("order,acc", [(1, 2), (2, 2), (3, 2), (1, 4)])
    def test_any_z_satisfies_constraints(self, method, order, acc):
        size = 7
        staggered = method is Method.FINITE_VOLUMES
        offsets = stencils.stencil_offsets(size, staggered=staggered)
        layer = stencils.PolynomialAccuracy.create(offsets, method, order, acc)
        a, b = stencils.constraints(offsets, method, order, acc)
        rng = np.random.RandomState(0)
        z = jnp.asarray(rng.randn(11, layer.free_dims), dtype=jnp.float32)
        c = np.asarray(layer(z), dtype=np.float64)
        np.testing.assert_allclose(c @ a.T, np.broadcast_to(b, (11, b.size)), atol=1e-5)

    def test_zero_z_with_bias_gives_baseline(self):
        offsets = stencils.stencil_offsets(5)
        baseline = stencils.coefficients(offsets, Method.FINITE_DIFFERENCES, 2)
        layer = stencils.PolynomialAccuracy.create(
            offsets, Method.FINITE_DIFFERENCES, 2, accuracy_order=2, bias=baseline
        )
        c = layer(jnp.zeros((layer.free_dims,)))
        np.testing.assert_allclose(np.asarray(c), baseline, atol=1e-6)

    def test_dx_scaling_of_layer(self):
        dx = 0.25
        offsets = stencils.stencil_offsets(5)
        layer = stencils.PolynomialAccuracy.create(
            offsets, Method.FINITE_DIFFERENCES, 1, accuracy_order=2, dx=dx
        )
        layer_unit = stencils.PolynomialAccuracy.create(
            offsets, Method.FINITE_DIFFERENCES, 1, accuracy_order=2, dx=1.0
        )
        np.testing.assert_allclose(layer.c0, layer_unit.c0 / dx, atol=1e-10)

    def test_accuracy_on_polynomials(self):
        """Constrained coefficients differentiate polynomials exactly."""
        dx = 0.1
        offsets = stencils.stencil_offsets(6)
        layer = stencils.PolynomialAccuracy.create(
            offsets, Method.FINITE_DIFFERENCES, 1, accuracy_order=3, dx=dx
        )
        rng = np.random.RandomState(1)
        z = jnp.asarray(rng.randn(layer.free_dims), dtype=jnp.float32)
        c = np.asarray(layer(z), dtype=np.float64)
        x0 = 0.7
        for poly_order in range(3):  # exact up to accuracy_order-1 + deriv
            u = lambda x: (x - 0.3) ** poly_order
            du = 0.0 if poly_order == 0 else poly_order * (x0 - 0.3) ** (poly_order - 1)
            approx = sum(
                ci * u(x0 + oi * dx) for ci, oi in zip(c, np.asarray(offsets))
            )
            np.testing.assert_allclose(approx, du, atol=1e-4)


class TestApplyStencil:
    def test_matches_convolution_on_shared_coefficients(self):
        rng = np.random.RandomState(0)
        u = rng.randn(3, 32).astype(np.float32)
        offsets = [-1, 0, 1]
        c = np.array([1.0, -2.0, 1.0], dtype=np.float32)
        out = stencils.apply_stencil(jnp.asarray(u), jnp.asarray(c), offsets)
        expected = np.roll(u, 1, -1) - 2 * u + np.roll(u, -1, -1)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_spatially_varying_coefficients(self):
        rng = np.random.RandomState(0)
        u = rng.randn(2, 16).astype(np.float32)
        c = rng.randn(2, 16, 3).astype(np.float32)
        out = np.asarray(stencils.apply_stencil(jnp.asarray(u), jnp.asarray(c), [-1, 0, 1]))
        for b in range(2):
            for j in range(16):
                expected = sum(
                    c[b, j, i] * u[b, (j + o) % 16]
                    for i, o in enumerate([-1, 0, 1])
                )
                np.testing.assert_allclose(out[b, j], expected, rtol=1e-4, atol=1e-5)

    def test_staggered_application(self):
        """F[j] at right face x_{j+1/2}: mean of cells j and j+1 for [-.5,.5]."""
        u = jnp.arange(8.0)
        c = jnp.array([0.5, 0.5])
        out = stencils.apply_stencil(u, c, [-0.5, 0.5], shift=-0.5)
        expected = 0.5 * (np.arange(8.0) + np.roll(np.arange(8.0), -1))
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)

    def test_derivative_of_sine(self):
        n = 64
        dx = 2 * np.pi / n
        x = np.arange(n) * dx
        u = jnp.asarray(np.sin(x), dtype=jnp.float32)
        c = jnp.asarray(
            stencils.coefficients([-2, -1, 0, 1, 2], Method.FINITE_DIFFERENCES, 1, dx=dx),
            dtype=jnp.float32,
        )
        out = stencils.apply_stencil(u, c, [-2, -1, 0, 1, 2])
        np.testing.assert_allclose(np.asarray(out), np.cos(x), atol=1e-4)
