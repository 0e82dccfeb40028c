"""Evaluation harness tests."""

import numpy as np
import jax
import jax.numpy as jnp

from pde_superresolution_tpu import equations, evaluate, integrate
from pde_superresolution_tpu.grids import Grid


class TestMetrics:
    def test_pearson_correlation(self):
        rng = np.random.RandomState(0)
        a = jnp.asarray(rng.randn(4, 32))
        np.testing.assert_allclose(
            np.asarray(evaluate.pearson_correlation(a, a)), 1.0, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(evaluate.pearson_correlation(a, -a)), -1.0, atol=1e-6
        )

    def test_survival_time(self):
        times = jnp.asarray([0.0, 1.0, 2.0, 3.0])
        # dies at index 2, revives at 3 (must stay dead)
        corr = jnp.asarray([[1.0, 0.9, 0.5, 0.95]])
        got = evaluate.survival_time_from_correlation(corr, times, 0.8)
        np.testing.assert_allclose(np.asarray(got), [1.0])
        # never dies
        corr = jnp.asarray([[1.0, 0.9, 0.85, 0.95]])
        got = evaluate.survival_time_from_correlation(corr, times, 0.8)
        np.testing.assert_allclose(np.asarray(got), [3.0])
        # dead on arrival
        corr = jnp.asarray([[0.1, 0.9, 0.85, 0.95]])
        got = evaluate.survival_time_from_correlation(corr, times, 0.8)
        np.testing.assert_allclose(np.asarray(got), [0.0])


class TestEvaluateEndToEnd:
    def test_burgers_baseline_vs_garbage(self, tmp_path):
        # eta=0.05 keeps shocks resolved at n_fine=256 so the conservative
        # baseline at 4x tracks the exact solve for the whole horizon.
        eq = equations.BurgersEquation(eta=0.05, conservative=True)
        fine = Grid(256, eq.period)

        def baseline_factory(forcing):
            return integrate.PolynomialDifferentiator(
                eq, fine.resample(4)
            ).rhs_fn(forcing)

        def garbage_factory(forcing):
            # exponentially amplifies a spatially-scrambled copy: decorrelates
            # (a constant-in-x blowup would NOT — Pearson is shift-invariant)
            return lambda u, t: 20.0 * jnp.roll(u, u.shape[-1] // 3, -1)

        result = evaluate.evaluate(
            eq,
            fine,
            resample_factor=4,
            schemes={"baseline": baseline_factory, "garbage": garbage_factory},
            key=jax.random.PRNGKey(0),
            num_samples=2,
            time_max=1.0,
            time_delta=0.1,
        )
        assert result.exact.shape == (2, 11, 64)
        assert result.mae["baseline"].shape == (2, 11)
        # baseline survives the full horizon; garbage decorrelates early
        surv_b = np.asarray(result.survival_time["baseline"])
        surv_g = np.asarray(result.survival_time["garbage"])
        assert (surv_b >= 0.9).all(), surv_b
        assert (surv_g < surv_b).all(), (surv_g, surv_b)
        # MAE at t=0 is ~0 (matched ICs)
        assert np.asarray(result.mae["baseline"])[:, 0].max() < 1e-5

        # h5 round trip
        path = str(tmp_path / "eval.h5")
        evaluate.save_eval_h5(path, result)
        loaded = evaluate.load_eval_h5(path)
        np.testing.assert_allclose(
            np.asarray(loaded.mae["baseline"]),
            np.asarray(result.mae["baseline"]),
        )
        np.testing.assert_array_equal(
            np.asarray(loaded.survival_time["garbage"]),
            np.asarray(result.survival_time["garbage"]),
        )

    def test_ks_with_warmup(self):
        """KS: warmup lands on the attractor; baseline at 2x stays correlated
        for a while; the trajectory is finite throughout."""
        eq = equations.from_name("ks")
        fine = Grid(256, eq.period)

        def baseline_factory(forcing):
            return integrate.PolynomialDifferentiator(
                eq, fine.resample(2)
            ).rhs_fn(forcing)

        result = evaluate.evaluate(
            eq,
            fine,
            resample_factor=2,
            schemes={"baseline": baseline_factory},
            key=jax.random.PRNGKey(1),
            num_samples=2,
            time_max=5.0,
            time_delta=0.5,
            warmup_time=40.0,  # KS transient from small ICs takes ~30-50 t.u.
            ic_scale=0.1,
        )
        # after warmup the field is on the attractor: rms O(1)
        rms = float(jnp.sqrt((result.exact[:, 0] ** 2).mean()))
        assert 0.5 < rms < 4.0, rms
        assert np.isfinite(np.asarray(result.exact)).all()
        corr0 = np.asarray(result.correlation["baseline"])[:, 0]
        np.testing.assert_allclose(corr0, 1.0, atol=1e-3)


class TestMAESurvival:
    def test_threshold_crossing(self):
        times = jnp.asarray([0.0, 1.0, 2.0, 3.0])
        mae = jnp.asarray([[0.0, 0.1, 0.5, 0.2]])  # exceeds 0.3 at idx 2
        got = evaluate.survival_time_from_mae(mae, times, 0.3)
        np.testing.assert_allclose(np.asarray(got), [1.0])
        got = evaluate.survival_time_from_mae(mae, times, 1.0)
        np.testing.assert_allclose(np.asarray(got), [3.0])


class TestFamilyWarning:
    """evaluate() warns when a scheme's family tag disagrees with the
    coarse-graining family (the half-cell interpretation hazard)."""

    def _run(self, eq_eval, scheme_eq):
        import pytest

        fine = Grid(64, eq_eval.period)

        def factory(forcing):
            return integrate.PolynomialDifferentiator(
                scheme_eq, fine.resample(2, conservative=scheme_eq.conservative)
            ).rhs_fn(forcing)

        return lambda: evaluate.evaluate(
            eq_eval, fine, 2, {"s": factory},
            key=jax.random.PRNGKey(0), num_samples=1,
            time_max=0.1, time_delta=0.05, ic_scale=0.1,
        )

    def test_mixed_family_warns(self):
        import pytest

        eq_cons = equations.from_name("ks", conservative=True)
        eq_fd = equations.from_name("ks", conservative=False)
        with pytest.warns(UserWarning, match="half a cell"):
            self._run(eq_cons, eq_fd)()

    def test_matched_family_silent(self):
        import warnings

        eq = equations.from_name("ks", conservative=True)
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)
            self._run(eq, eq)()

    def test_untagged_scheme_tolerated(self):
        import warnings

        eq = equations.from_name("ks", conservative=True)
        fine = Grid(64, eq.period)
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)
            evaluate.evaluate(
                eq, fine, 2,
                {"raw": lambda f: (lambda u, t: -u)},
                key=jax.random.PRNGKey(0), num_samples=1,
                time_max=0.1, time_delta=0.05, ic_scale=0.1,
            )
