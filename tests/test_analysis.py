"""Tests for analysis helpers."""

import numpy as np
import jax.numpy as jnp

from pde_superresolution_tpu import analysis
from pde_superresolution_tpu.evaluate import EvalResult


def _fake_result():
    times = jnp.linspace(0.0, 1.0, 5)
    exact = jnp.zeros((3, 5, 16))
    mae = {"m": jnp.ones((3, 5)) * jnp.asarray([0, 1, 2, 3, 4.0])}
    corr = {"m": jnp.ones((3, 5))}
    surv = {"m": jnp.asarray([1.0, 0.5, 0.75])}
    return EvalResult(times, exact, {"m": exact}, mae, corr, surv)


def test_mae_curves():
    times, curve = analysis.mae_curves(_fake_result())["m"]
    np.testing.assert_allclose(curve, [0, 1, 2, 3, 4])


def test_survival_summary():
    s = analysis.survival_summary(_fake_result())["m"]
    assert s["median"] == 0.75 and s["min"] == 0.5 and s["max"] == 1.0


def test_energy_spectrum_single_mode():
    n, period = 64, 2 * np.pi
    x = np.arange(n) * period / n
    u = np.sin(3 * x)[None]  # amplitude 1 at k=3
    k, e = analysis.energy_spectrum(u, period)
    peak = np.argmax(e)
    np.testing.assert_allclose(k[peak], 3.0, atol=1e-9)
    # |u_hat|^2/n^2 for amplitude-1 sine at a single rfft bin = 1/4
    np.testing.assert_allclose(e[peak], 0.25, rtol=1e-6)
    assert e[np.arange(e.size) != peak].max() < 1e-10


def test_report_contains_schemes():
    text = analysis.report(_fake_result())
    assert "m" in text and "survival" in text
