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


def test_survival_curves_fractions():
    # survival times [1.0, 0.5, 0.75] on grid [0, .25, .5, .75, 1]:
    # frac(t) = P(survival >= t)
    t, frac = analysis.survival_curves(_fake_result())["m"]
    np.testing.assert_allclose(t, [0, 0.25, 0.5, 0.75, 1.0])
    np.testing.assert_allclose(frac, [1.0, 1.0, 1.0, 2 / 3, 1 / 3])


def test_make_figures_and_cli(tmp_path):
    """run_analysis end to end: save an EvalResult, produce all figures."""
    from pde_superresolution_tpu import evaluate as eval_lib
    from pde_superresolution_tpu.scripts import run_analysis

    rng = np.random.RandomState(0)
    times = jnp.linspace(0.0, 1.0, 5)
    exact = jnp.asarray(rng.randn(3, 5, 16))
    traj = {
        "model": exact + 0.01 * rng.randn(3, 5, 16),
        "baseline": exact + 0.1 * rng.randn(3, 5, 16),
    }
    mae = {k: jnp.abs(v - exact).mean(-1) for k, v in traj.items()}
    corr = {k: jnp.ones((3, 5)) for k in traj}
    surv = {k: jnp.asarray([1.0, 0.5, 0.75]) for k in traj}
    result = EvalResult(times, exact, traj, mae, corr, surv)
    h5 = str(tmp_path / "eval.h5")
    eval_lib.save_eval_h5(h5, result)

    out = str(tmp_path / "figs")
    paths = run_analysis.make_figures(
        analysis.load_eval_h5(h5), out, period=2 * np.pi, dpi=50
    )
    import os

    assert [os.path.basename(p) for p in paths] == [
        "mae.png", "survival.png", "spectrum.png", "spacetime.png",
    ]
    for p in paths:
        assert os.path.getsize(p) > 1000, p


def test_coefficients_figure(tmp_path):
    """The paper's adaptive-coefficients figure renders for both model
    families, and the plotted grid-unit values match the constraint layer's
    classic taps when the network is zero (z=0 => classic stencil)."""
    import os

    import jax
    from pde_superresolution_tpu import equations
    from pde_superresolution_tpu.grids import Grid
    from pde_superresolution_tpu.models import ModelConfig, StencilModel
    from pde_superresolution_tpu.scripts import run_analysis

    for conservative in (True, False):
        eq = equations.from_name("ks", conservative=conservative)
        grid = Grid(64, eq.period)
        model = StencilModel(
            eq, grid, ModelConfig(num_layers=2, filters=8, stencil_size=6)
        )
        params = model.init_params(jax.random.PRNGKey(0))
        u = np.asarray(
            eq.initial_conditions(jax.random.PRNGKey(1), grid)
        )
        out = str(tmp_path / f"figs_{conservative}")
        p = run_analysis.make_coefficients_figure(model, params, u, out, dpi=50)
        assert os.path.basename(p) == "coefficients.png"
        assert os.path.getsize(p) > 1000
