"""Tests for resampling and spectral ops (≈ reference duckarray_test.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from pde_superresolution_tpu import ops
from pde_superresolution_tpu.grids import Grid


class TestGrid:
    def test_geometry(self):
        g = Grid(8, 2 * np.pi)
        assert g.dx == pytest.approx(np.pi / 4)
        np.testing.assert_allclose(g.x, np.arange(8) * np.pi / 4)

    def test_resample(self):
        g = Grid(64, 10.0)
        c = g.resample(8)
        assert c.size == 8 and c.period == 10.0
        with pytest.raises(ValueError):
            g.resample(7)

    def test_validation(self):
        with pytest.raises(ValueError):
            Grid(0, 1.0)
        with pytest.raises(ValueError):
            Grid(8, -1.0)


class TestResample:
    def test_mean_values(self):
        u = jnp.arange(8.0)
        np.testing.assert_allclose(
            np.asarray(ops.resample_mean(u, 2)), [0.5, 2.5, 4.5, 6.5]
        )

    def test_mean_batched_and_axis(self):
        rng = np.random.RandomState(0)
        u = rng.randn(3, 12, 5)
        out = np.asarray(ops.resample_mean(jnp.asarray(u), 4, axis=1))
        assert out.shape == (3, 3, 5)
        np.testing.assert_allclose(out[:, 0], u[:, :4].mean(1), rtol=1e-6)

    def test_subsample(self):
        u = jnp.arange(8.0)
        np.testing.assert_allclose(np.asarray(ops.subsample(u, 4)), [0.0, 4.0])

    def test_factor_one_identity(self):
        u = jnp.arange(6.0)
        np.testing.assert_array_equal(np.asarray(ops.resample_mean(u, 1)), np.asarray(u))
        np.testing.assert_array_equal(np.asarray(ops.subsample(u, 1)), np.asarray(u))

    def test_indivisible_raises(self):
        with pytest.raises(ValueError):
            ops.resample_mean(jnp.arange(7.0), 2)
        with pytest.raises(ValueError):
            ops.subsample(jnp.arange(7.0), 2)

    def test_mean_of_subsampled_grid_alignment(self):
        """Both coarse-grainings agree on constants and track each other."""
        n, factor = 64, 8
        x = np.arange(n) * 2 * np.pi / n
        u = jnp.asarray(np.sin(x), dtype=jnp.float32)
        mean = np.asarray(ops.resample_mean(u, factor))
        sub = np.asarray(ops.subsample(u, factor))
        # subsample keeps x=0 alignment; block mean is centered factor/2 later
        assert mean.shape == sub.shape == (8,)
        np.testing.assert_allclose(sub, np.sin(x[::factor]), atol=1e-6)


class TestSpectral:
    @pytest.mark.parametrize("order,expected_fn", [
        (1, lambda x: 3 * np.cos(3 * x)),
        (2, lambda x: -9 * np.sin(3 * x)),
        (3, lambda x: -27 * np.cos(3 * x)),
        (4, lambda x: 81 * np.sin(3 * x)),
    ])
    def test_derivative_of_sine(self, order, expected_fn):
        n, period = 64, 2 * np.pi
        x = np.arange(n) * period / n
        u = jnp.asarray(np.sin(3 * x), dtype=jnp.float32)
        out = np.asarray(ops.spectral_derivative(u, order, period))
        np.testing.assert_allclose(out, expected_fn(x), atol=2e-3 * 3**order)

    def test_nonunit_period(self):
        n, period = 128, 32.0
        x = np.arange(n) * period / n
        k = 2 * np.pi * 2 / period
        u = jnp.asarray(np.sin(k * x), dtype=jnp.float32)
        out = np.asarray(ops.spectral_derivative(u, 1, period))
        np.testing.assert_allclose(out, k * np.cos(k * x), atol=1e-4)

    def test_batched(self):
        n, period = 32, 2 * np.pi
        x = np.arange(n) * period / n
        u = jnp.asarray(np.stack([np.sin(x), np.cos(x)]), dtype=jnp.float32)
        out = np.asarray(ops.spectral_derivative(u, 1, period))
        np.testing.assert_allclose(out[0], np.cos(x), atol=1e-5)
        np.testing.assert_allclose(out[1], -np.sin(x), atol=1e-5)

    def test_axis_argument(self):
        n, period = 32, 2 * np.pi
        x = np.arange(n) * period / n
        u = jnp.asarray(np.sin(x)[:, None] * np.ones((1, 3)), dtype=jnp.float32)
        out = np.asarray(ops.spectral_derivative(u, 1, period, axis=0))
        np.testing.assert_allclose(out[:, 0], np.cos(x), atol=1e-5)

    def test_smoothing_filter_removes_high_modes(self):
        n, period = 128, 2 * np.pi
        x = np.arange(n) * period / n
        lo, hi = np.sin(2 * x), np.sin(60 * x)
        out = np.asarray(ops.smoothing_filter(jnp.asarray(lo + hi, dtype=jnp.float32), period, 0.25))
        # low mode survives (k=2 << k_c=16), high mode crushed (k=60)
        np.testing.assert_allclose(out, lo, atol=0.05)
