"""Unit tests for the periodic conv tower."""

import numpy as np
import jax
import jax.numpy as jnp

from pde_superresolution_tpu.models import conv_net


CFG = conv_net.ConvTowerConfig(num_layers=2, filters=8, kernel_size=5)


def _params(key=0):
    return conv_net.conv_tower_init(
        jax.random.PRNGKey(key), CFG, head_dims={"a": 3}
    )


def _randomized(params):
    return jax.tree.map(
        lambda l: 0.1 * jax.random.normal(jax.random.PRNGKey(7), l.shape), params
    )


class TestConvTower:
    def test_zero_init_heads(self):
        params = _params()
        out = conv_net.conv_tower_apply(params, jnp.ones((2, 32)))["a"]
        np.testing.assert_array_equal(np.asarray(out), 0.0)
        assert out.shape == (2, 32, 3)

    def test_receptive_radius(self):
        assert conv_net.receptive_radius(CFG) == 4
        assert conv_net.receptive_radius(
            conv_net.ConvTowerConfig(num_layers=3, filters=32, kernel_size=5)
        ) == 6

    def test_translation_equivariance(self):
        """Periodic conv commutes with rolls (the property the spatially
        sharded path relies on)."""
        params = _randomized(_params())
        u = jax.random.normal(jax.random.PRNGKey(1), (32,))
        a = np.asarray(conv_net.conv_tower_apply(params, jnp.roll(u, 5))["a"])
        b = np.roll(np.asarray(conv_net.conv_tower_apply(params, u)["a"]), 5, axis=0)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_valid_mode_matches_periodic_interior(self):
        """VALID on wrap-padded input == periodic output (exactly)."""
        params = _randomized(_params())
        u = jax.random.normal(jax.random.PRNGKey(2), (24,))
        want = np.asarray(conv_net.conv_tower_apply(params, u)["a"])
        r = conv_net.receptive_radius(CFG)
        u_pad = jnp.concatenate([u[-r:], u, u[:r]])
        got = np.asarray(
            conv_net.conv_tower_apply(params, u_pad, periodic=False)["a"]
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_batch_dims_flattened_and_restored(self):
        params = _params()
        out = conv_net.conv_tower_apply(params, jnp.ones((2, 3, 16)))["a"]
        assert out.shape == (2, 3, 16, 3)
