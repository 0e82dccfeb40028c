"""Training tests (≈ reference training_test.py): e2e smoke, resume, config."""

import dataclasses
import os

import numpy as np
import pytest
import jax

from pde_superresolution_tpu import equations
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.models import ModelConfig
from pde_superresolution_tpu.training import (
    LossWeights,
    TrainingConfig,
    build_training_data,
    generate_snapshots,
    load_snapshots_h5,
    parse_hparams,
    save_snapshots_h5,
)
from pde_superresolution_tpu.training import loop as loop_lib
from pde_superresolution_tpu.training import losses as loss_lib
from pde_superresolution_tpu.models.stencil_net import StencilModel


# sized for a 1-core CI host: the suite's cost is jit compiles + 1-core
# rollout steps, so keep grids small and step counts minimal
TINY = TrainingConfig(
    equation="burgers",
    conservative=True,
    resample_factor=4,
    fine_size=64,
    num_trajectories=3,
    num_times=12,
    time_delta=0.1,
    model=ModelConfig(num_layers=2, filters=8, stencil_size=4),
    num_time_steps=2,
    learning_rates=(1e-3,),
    learning_stops=(12,),
    batch_size=8,
    eval_interval=6,
    checkpoint_interval=6,
)


class TestDataPipeline:
    def test_snapshots_shapes_and_labels(self):
        eq = equations.from_name("burgers", conservative=True)
        fine = Grid(64, eq.period)
        snaps = generate_snapshots(
            eq, fine, jax.random.PRNGKey(0), num_trajectories=2, num_times=8,
            time_delta=0.05,
        )
        assert snaps.u.shape == (2, 8, 64)
        assert np.isfinite(np.asarray(snaps.u)).all()
        data = build_training_data(eq, fine, snaps, resample_factor=4, unroll_steps=2)
        assert data.inputs.shape == (2 * 6, 16)
        assert data.rollout.shape == (12, 2, 16)
        assert set(data.deriv_labels) == {0, 1}
        # order-0 face label should be close to the input field magnitude
        assert np.isfinite(np.asarray(data.deriv_labels[0])).all()

    def test_rollout_labels_align_with_inputs(self):
        """rollout[i, k] must equal the input at time index i+k+1."""
        eq = equations.from_name("ks")
        fine = Grid(128, eq.period)
        snaps = generate_snapshots(
            eq, fine, jax.random.PRNGKey(1), num_trajectories=1, num_times=6,
            time_delta=0.25,
        )
        data = build_training_data(eq, fine, snaps, resample_factor=2, unroll_steps=2)
        # trajectory 0, sample i=0: rollout[0] == inputs[1], rollout[1] == inputs[2]
        np.testing.assert_array_equal(
            np.asarray(data.rollout[0, 0]), np.asarray(data.inputs[1])
        )
        np.testing.assert_array_equal(
            np.asarray(data.rollout[0, 1]), np.asarray(data.inputs[2])
        )

    def test_h5_roundtrip(self, tmp_path):
        eq = equations.from_name("burgers", conservative=True)
        fine = Grid(64, eq.period)
        snaps = generate_snapshots(
            eq, fine, jax.random.PRNGKey(0), num_trajectories=2, num_times=4,
            time_delta=0.1,
        )
        path = str(tmp_path / "snaps.h5")
        save_snapshots_h5(path, snaps, eq, fine)
        loaded, eq2, grid2 = load_snapshots_h5(path)
        np.testing.assert_allclose(np.asarray(loaded.u), np.asarray(snaps.u))
        assert eq2.name == "burgers" and eq2.conservative
        assert grid2.size == 64
        assert loaded.forcing is not None

    def test_zero_params_loss_is_one(self):
        """Fresh (baseline-equivalent) model => normalized losses ≈ 1."""
        eq = equations.from_name("burgers", conservative=True)
        fine = Grid(64, eq.period)
        snaps = generate_snapshots(
            eq, fine, jax.random.PRNGKey(0), num_trajectories=2, num_times=8,
            time_delta=0.05,
        )
        data = build_training_data(eq, fine, snaps, resample_factor=4, unroll_steps=0)
        model = StencilModel(eq, fine.resample(4), ModelConfig(num_layers=1, filters=4, stencil_size=4))
        params = model.init_params(jax.random.PRNGKey(0))
        norms = loss_lib.compute_loss_norms(model, data, 0, 0.05)
        loss, parts = loss_lib.compute_loss(
            model, params, data, norms, LossWeights(), dt=0.05, unroll_steps=0
        )
        for key in parts:
            if key.startswith("deriv") or key == "time_deriv":
                assert abs(float(parts[key]) - 1.0) < 1e-3, (key, parts[key])

    def test_relative_error_mixing(self):
        """relative_error form: ≈1 at zero params; mixing adds the forms;
        defaults reproduce the absolute-only loss exactly."""
        eq = equations.from_name("burgers", conservative=True)
        fine = Grid(64, eq.period)
        snaps = generate_snapshots(
            eq, fine, jax.random.PRNGKey(0), num_trajectories=2, num_times=8,
            time_delta=0.05,
        )
        data = build_training_data(eq, fine, snaps, resample_factor=4, unroll_steps=2)
        model = StencilModel(
            eq, fine.resample(4), ModelConfig(num_layers=1, filters=4, stencil_size=4)
        )
        params = model.init_params(jax.random.PRNGKey(0))
        norms = loss_lib.compute_loss_norms(model, data, 2, 0.05, substeps=4)
        kwargs = dict(dt=0.05, unroll_steps=2, substeps=4)
        loss_abs, parts_abs = loss_lib.compute_loss(
            model, params, data, norms, LossWeights(), **kwargs
        )
        # relative-only: zero params == baseline, so |err|/max(|err|,floor)
        # is exactly 1 except at the <=10% floored points => part in (0.9, 1]
        _, parts_rel = loss_lib.compute_loss(
            model, params, data, norms,
            LossWeights(absolute_error=0.0, relative_error=1.0), **kwargs
        )
        for key, v in parts_rel.items():
            if key.startswith("deriv") or key == "time_deriv":
                assert 0.85 < float(v) <= 1.0 + 1e-5, (key, v)
        # mixed 1+1 at zero params: each part ≈ abs_part + rel_part
        _, parts_mix = loss_lib.compute_loss(
            model, params, data, norms,
            LossWeights(absolute_error=1.0, relative_error=1.0), **kwargs
        )
        key = "deriv_1"
        np.testing.assert_allclose(
            float(parts_mix[key]),
            float(parts_abs[key]) + float(parts_rel[key]),
            rtol=1e-5,
        )
        # default weights == explicit absolute-only, bitwise
        loss_d, _ = loss_lib.compute_loss(
            model, params, data, norms,
            LossWeights(absolute_error=1.0, relative_error=0.0), **kwargs
        )
        assert float(loss_d) == float(loss_abs)

    def test_rollout_noise_perturbs_only_the_integrated_target(self):
        """rollout_noise injects noise into the rollout's initial state:
        the integrated parts change, the pointwise consistency targets
        (derivatives, time derivative) stay bit-identical, and
        rollout_noise=0 / noise_key=None are exact no-ops."""
        eq = equations.from_name("burgers", conservative=True)
        fine = Grid(64, eq.period)
        snaps = generate_snapshots(
            eq, fine, jax.random.PRNGKey(0), num_trajectories=2, num_times=8,
            time_delta=0.05,
        )
        data = build_training_data(eq, fine, snaps, resample_factor=4, unroll_steps=2)
        model = StencilModel(
            eq, fine.resample(4), ModelConfig(num_layers=1, filters=4, stencil_size=4)
        )
        params = model.init_params(jax.random.PRNGKey(0))
        norms = loss_lib.compute_loss_norms(model, data, 2, 0.05, substeps=4)
        kwargs = dict(dt=0.05, unroll_steps=2, substeps=4)
        key = jax.random.PRNGKey(42)

        loss_clean, parts_clean = loss_lib.compute_loss(
            model, params, data, norms, LossWeights(), **kwargs
        )
        # noise off (rate 0) with a key, and noise on without a key: no-ops
        for off in (
            dict(rollout_noise=0.0, noise_key=key),
            dict(rollout_noise=0.1, noise_key=None),
        ):
            loss_off, _ = loss_lib.compute_loss(
                model, params, data, norms, LossWeights(), **kwargs, **off
            )
            assert float(loss_off) == float(loss_clean), off

        _, parts_noisy = loss_lib.compute_loss(
            model, params, data, norms, LossWeights(), **kwargs,
            rollout_noise=0.1, noise_key=key,
        )
        for k in parts_clean:
            if k.startswith("deriv") or k == "time_deriv":
                assert float(parts_noisy[k]) == float(parts_clean[k]), k
        assert float(parts_noisy["integrated"]) != float(
            parts_clean["integrated"]
        )
        # perturbed start, clean targets => the zero-params (baseline) model
        # cannot be better than on clean starts
        assert float(parts_noisy["integrated"]) > float(
            parts_clean["integrated"]
        )
        # deterministic in the key
        _, parts_again = loss_lib.compute_loss(
            model, params, data, norms, LossWeights(), **kwargs,
            rollout_noise=0.1, noise_key=key,
        )
        assert float(parts_again["integrated"]) == float(
            parts_noisy["integrated"]
        )

    def test_rollout_noise_trains_and_resumes_deterministically(self, tmp_path):
        """e2e: rollout_noise training is finite, and a resumed run replays
        the same noise stream (params match an uninterrupted run bitwise)."""
        cfg = dataclasses.replace(TINY, rollout_noise=0.05)
        ckpt_dir = str(tmp_path / "ckpt")
        half = dataclasses.replace(cfg, learning_stops=(6,))
        loop_lib.train(half, checkpoint_dir=ckpt_dir)
        _, params_resumed, metrics = loop_lib.train(cfg, checkpoint_dir=ckpt_dir)
        assert np.isfinite(metrics["eval_total"]), metrics
        _, params_full, _ = loop_lib.train(cfg)
        for a, b in zip(
            jax.tree.leaves(params_resumed), jax.tree.leaves(params_full)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_rollout_noise_hparam_parses(self):
        from pde_superresolution_tpu.training.config import parse_hparams

        cfg = parse_hparams("rollout_noise=0.02")
        assert cfg.rollout_noise == 0.02

    def test_relative_error_trains(self):
        """e2e smoke: training with relative_error mixing runs and stays finite."""
        import dataclasses as dc
        from pde_superresolution_tpu.training import LossWeights as LW

        cfg = dc.replace(
            TINY,
            learning_stops=(6,),
            loss_weights=LW(absolute_error=0.5, relative_error=0.5),
        )
        _, _, metrics = loop_lib.train(cfg)
        assert np.isfinite(metrics["eval_total"]), metrics


class TestRolloutDivergenceGuard:
    """The unrolled-loss divergence guard (round-4 weak #1: 3/16 seed-sweep
    rows reported eval_total=NaN because jnp.clip propagates the NaN a
    single overshooting inner RK4 step produces)."""

    def _loss_at(self, substeps):
        eq = equations.from_name("ks", conservative=True)
        fine = Grid(256, eq.period)
        snaps = generate_snapshots(
            eq, fine, jax.random.PRNGKey(0), num_trajectories=3, num_times=8,
            time_delta=0.1,
        )
        # resample 2 -> dx = 0.5: the KS fourth-derivative CFL bound is
        # ~dx^4/16 ≈ 0.004, so dt=0.1 at substeps=1 is deliberately and
        # violently unstable (overshoots to inf within a step or two),
        # while substeps=64 (dt_inner ≈ 0.0016) is stable
        data = build_training_data(eq, fine, snaps, resample_factor=2,
                                   unroll_steps=2)
        model = StencilModel(
            eq, fine.resample(2),
            ModelConfig(num_layers=1, filters=4, stencil_size=6),
        )
        params = model.init_params(jax.random.PRNGKey(0))
        norms = loss_lib.compute_loss_norms(
            model, data, 2, 0.1, substeps=substeps
        )
        return loss_lib.compute_loss(
            model, params, data, norms, LossWeights(), dt=0.1,
            unroll_steps=2, substeps=substeps,
        )

    def test_unstable_rollout_reports_finite_loss_and_fraction(self):
        loss, parts = self._loss_at(substeps=1)
        assert np.isfinite(float(loss)), float(loss)
        assert np.isfinite(float(parts["total"]))
        frac = float(parts["rollout_finite_frac"])
        assert 0.0 <= frac < 1.0, frac  # members diverged — and it shows

    def test_stable_rollout_has_full_finite_fraction(self):
        loss, parts = self._loss_at(substeps=64)
        assert np.isfinite(float(loss))
        assert float(parts["rollout_finite_frac"]) == 1.0

    def test_guard_is_identity_on_finite_states(self):
        """For a stable rollout the nan_to_num guard must not change a bit
        (stable recipes keep their historical loss values)."""
        from pde_superresolution_tpu import integrate

        eq = equations.from_name("burgers", conservative=True)
        fine = Grid(64, eq.period)
        coarse = fine.resample(4)
        model = StencilModel(
            eq, coarse, ModelConfig(num_layers=1, filters=4, stencil_size=4)
        )
        params = model.init_params(jax.random.PRNGKey(0))
        forcing = eq.sample_forcing(jax.random.PRNGKey(1), (2,))
        u0 = eq.initial_conditions(jax.random.PRNGKey(2), coarse, (2,))
        rhs = model.rhs_fn(params, forcing)
        dt, substeps, k = 0.02, 2, 3
        t0 = jax.numpy.zeros((2,))
        states = loss_lib.rollout_states(rhs, u0, t0, dt, substeps, k)

        # reference: the SAME scan structure with the pre-round-5 body
        # (clip only, no nan_to_num) — on a finite rollout the guard must
        # not change a bit
        dt_inner = dt / substeps
        clip = loss_lib.ROLLOUT_CLIP

        @jax.checkpoint
        def inner(carry, _):
            u, t = carry
            u = integrate.rk4_step(rhs, u, t, dt_inner)
            u = jax.numpy.clip(u, -clip, clip)
            return (u, t + dt_inner), None

        def outer(carry, _):
            carry, _ = jax.lax.scan(inner, carry, None, length=substeps)
            return carry, carry[0]

        (_, _), ref = jax.lax.scan(outer, (u0, t0), None, length=k)
        assert np.isfinite(np.asarray(ref)).all()
        np.testing.assert_array_equal(np.asarray(states), np.asarray(ref))


class TestTrainLoop:
    def test_loss_decreases_and_checkpoints(self, tmp_path):
        ckpt_dir = str(tmp_path / "ckpt")
        metrics_path = str(tmp_path / "metrics.jsonl")
        model, params, metrics = loop_lib.train(
            TINY, checkpoint_dir=ckpt_dir, metrics_path=metrics_path
        )
        # total = sum of three baseline-normalized targets => baseline ≈ 3.0;
        # a few smoke steps must stay in that neighborhood (finite, not diverged)
        assert 0.5 < metrics["eval_total"] < 3.5, metrics
        assert os.path.exists(metrics_path)
        restored = loop_lib.restore_params(ckpt_dir)
        for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_from_checkpoint(self, tmp_path):
        ckpt_dir = str(tmp_path / "ckpt")
        # train halfway (step 6 checkpoint), then resume to 12
        half = dataclasses.replace(TINY, learning_stops=(6,))
        loop_lib.train(half, checkpoint_dir=ckpt_dir)
        model, params_resumed, _ = loop_lib.train(TINY, checkpoint_dir=ckpt_dir)
        # a fresh full run with identical seeds must match bitwise:
        # the data/batch streams are deterministic and restart-aligned.
        model2, params_full, _ = loop_lib.train(TINY)
        leaves_r = jax.tree.leaves(params_resumed)
        leaves_f = jax.tree.leaves(params_full)
        for a, b in zip(leaves_r, leaves_f):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_resume_rejects_changed_config(self, tmp_path):
        """Resuming a checkpoint dir with different hparams must raise, not
        silently continue with mismatched optimizer/schedule semantics."""
        ckpt_dir = str(tmp_path / "ckpt")
        half = dataclasses.replace(TINY, learning_stops=(6,))
        loop_lib.train(half, checkpoint_dir=ckpt_dir)
        # changed optimizer semantics: different learning rate
        bad_lr = dataclasses.replace(
            TINY, learning_rates=(5e-4,), learning_stops=(12,)
        )
        with pytest.raises(ValueError, match="learning_rates"):
            loop_lib.train(bad_lr, checkpoint_dir=ckpt_dir)
        # changed model architecture
        bad_model = dataclasses.replace(
            TINY, model=dataclasses.replace(TINY.model, filters=16)
        )
        with pytest.raises(ValueError, match="model"):
            loop_lib.train(bad_model, checkpoint_dir=ckpt_dir)
        # changed schedule SHAPE (an interior stop boundary) is rejected even
        # though extending the final stop (= num_steps) is allowed
        bad_stops = dataclasses.replace(
            TINY, learning_rates=(1e-3, 1e-3), learning_stops=(4, 12)
        )
        with pytest.raises(ValueError, match="learning_stops"):
            loop_lib.train(bad_stops, checkpoint_dir=ckpt_dir)

    def test_resume_accepts_checkpoint_missing_new_fields(self, tmp_path):
        """A checkpoint written before a config field existed must resume:
        missing keys take the live defaults (defined to reproduce the old
        behavior), so they are not a semantic diff. Regression for the
        round-2 loss-weight keys breaking round-1 checkpoints."""
        import json

        ckpt_dir = str(tmp_path / "ckpt")
        half = dataclasses.replace(TINY, learning_stops=(6,))
        loop_lib.train(half, checkpoint_dir=ckpt_dir)
        # simulate an old checkpoint: strip a loss-weight key that defaults
        # to behavior-preserving values from the stored config JSON
        import glob
        import os

        (cfg_path,) = glob.glob(
            os.path.join(ckpt_dir, "*", "config", "*.json")
        ) or glob.glob(os.path.join(ckpt_dir, "*", "config*"))
        if os.path.isdir(cfg_path):
            inner = glob.glob(os.path.join(cfg_path, "*"))
            cfg_path = inner[0]
        stored = json.loads(open(cfg_path).read())
        for key in ("absolute_error", "relative_error", "error_floor_quantile"):
            stored["loss_weights"].pop(key, None)
        open(cfg_path, "w").write(json.dumps(stored))
        # resume with identical live hparams must succeed
        _, params, _ = loop_lib.train(TINY, checkpoint_dir=ckpt_dir)
        assert params is not None

    def test_flat_split_is_by_trajectory(self):
        """No trajectory may appear in both train and eval splits (the flat
        path used to split flattened samples randomly, leaking each eval
        trajectory's other timesteps into training — round-3 VERDICT #3)."""
        eq = equations.from_name("burgers", conservative=True)
        fine = Grid(64, eq.period)
        snaps = generate_snapshots(
            eq, fine, jax.random.PRNGKey(0), num_trajectories=5, num_times=8,
            time_delta=0.1,
        )
        data = build_training_data(eq, fine, snaps, resample_factor=4,
                                   unroll_steps=2)
        assert data.traj_ids is not None
        train_idx, eval_idx = loop_lib._split_train_eval(data, 0.6, seed=0)
        ids = np.asarray(data.traj_ids)
        train_traj = set(ids[train_idx].tolist())
        eval_traj = set(ids[eval_idx].tolist())
        assert train_traj and eval_traj
        assert not (train_traj & eval_traj)
        # every sample lands in exactly one split
        assert sorted(np.concatenate([train_idx, eval_idx]).tolist()) == list(
            range(data.num_samples)
        )

    def test_split_without_traj_ids_warns(self):
        eq = equations.from_name("burgers", conservative=True)
        fine = Grid(64, eq.period)
        snaps = generate_snapshots(
            eq, fine, jax.random.PRNGKey(0), num_trajectories=2, num_times=6,
            time_delta=0.1,
        )
        data = build_training_data(eq, fine, snaps, resample_factor=4)
        stripped = data._replace(traj_ids=None)
        with pytest.warns(UserWarning, match="no traj_ids"):
            loop_lib._split_train_eval(stripped, 0.8, seed=0)

    def test_empty_eval_split_raises(self):
        """frac_training=1 must raise instead of yielding NaN eval metrics."""
        eq = equations.from_name(TINY.equation, conservative=True)
        fine = Grid(TINY.fine_size, eq.period)
        snaps = generate_snapshots(
            eq, fine, jax.random.PRNGKey(0), num_trajectories=2, num_times=6,
            time_delta=0.1,
        )
        dataset = build_training_data(
            eq, fine, snaps, TINY.resample_factor, unroll_steps=0
        )
        cfg = dataclasses.replace(TINY, frac_training=1.0, num_time_steps=0)
        with pytest.raises(ValueError, match="eval split is empty"):
            loop_lib.train(cfg, dataset=dataset)


class TestHparams:
    def test_parse_overrides(self):
        c = parse_hparams("filters=64,conservative=false,num_time_steps=8")
        assert c.model.filters == 64
        assert c.conservative is False
        assert c.num_time_steps == 8

    def test_parse_tuples_and_floats(self):
        c = parse_hparams("learning_rates=1e-2;1e-3,learning_stops=100;200")
        assert c.learning_rates == (1e-2, 1e-3)
        assert c.learning_stops == (100, 200)

    def test_unknown_key_raises(self):
        with pytest.raises(ValueError):
            parse_hparams("warp_speed=9")

    def test_json_roundtrip(self):
        c = parse_hparams("filters=64,integrated_solution=0.5")
        c2 = TrainingConfig.from_json(c.to_json())
        assert c2 == c

    def test_eq_prefix_merges_equation_params(self):
        c = parse_hparams(
            "equation=burgers,eq.eta=0.02,eq.forcing_k_min=30,"
            "eq.period=62.8,filters=16"
        )
        assert c.equation_params == {
            "eta": 0.02, "forcing_k_min": 30, "period": 62.8
        }
        assert c.model.filters == 16
        # the built equation actually receives them
        from pde_superresolution_tpu import equations

        eq = equations.from_name(
            c.equation, conservative=c.conservative, **c.equation_params
        )
        assert eq.eta == 0.02 and eq.forcing_k_min == 30
        # overrides compose: a later parse replaces only the given keys
        c2 = parse_hparams("eq.eta=0.05", base=c)
        assert c2.equation_params["eta"] == 0.05
        assert c2.equation_params["forcing_k_min"] == 30
        # json round-trips with equation_params populated
        assert TrainingConfig.from_json(c2.to_json()) == c2

    def test_direct_equation_params_key_rejected(self):
        with pytest.raises(ValueError):
            parse_hparams("equation_params=bad")


class TestTrajectoryData:
    def test_sampled_batch_matches_flat_pipeline(self):
        """sample_training_batch must reproduce the flat build_training_data
        labels/rollouts for the same (traj, time) pairs."""
        from pde_superresolution_tpu.training import (
            build_trajectory_data,
            sample_training_batch,
        )
        import jax.numpy as jnp

        eq = equations.from_name("burgers", conservative=True)
        fine = Grid(64, eq.period)
        key = jax.random.PRNGKey(0)
        snaps = generate_snapshots(eq, fine, jax.random.fold_in(key, 0), 3, 10, 0.1)
        flat = build_training_data(eq, fine, snaps, 4, unroll_steps=2)
        tdata = build_trajectory_data(
            eq, fine, key, num_trajectories=3, num_times=10, time_delta=0.1,
            resample_factor=4, unroll_steps=2, chunk_trajectories=2,
        )
        # chunked generation uses fold_in(key, c): chunk 0 = traj 0..1
        # matches generate_snapshots(fold_in(key,0), 2 traj)? No — flat used
        # 3 traj in one call, so compare structurally via a direct rebuild:
        usable = 8
        ti = jnp.asarray([0, 1, 2, 2])
        si = jnp.asarray([0, 3, 7, 0])
        batch = sample_training_batch(tdata, ti, si)
        assert batch.inputs.shape == (4, 16)
        assert batch.rollout.shape == (4, 2, 16)
        # rollout windows == series slices
        np.testing.assert_array_equal(
            np.asarray(batch.rollout[1]), np.asarray(tdata.series[1, 4:6])
        )
        np.testing.assert_array_equal(
            np.asarray(batch.inputs[2]), np.asarray(tdata.series[2, 7])
        )
        # labels are per-(traj,time) gathers
        np.testing.assert_array_equal(
            np.asarray(batch.time_deriv_label[0]),
            np.asarray(tdata.time_deriv_label[0, 0]),
        )

    def test_train_on_trajectory_data(self, tmp_path):
        """End-to-end: chunked generation + structured training runs and
        checkpoints."""
        from pde_superresolution_tpu.training import build_trajectory_data
        import dataclasses as dc

        cfg = dc.replace(TINY, num_time_steps=2, learning_stops=(6,),
                         batch_size=8, eval_interval=3, checkpoint_interval=6)
        eq = equations.from_name(cfg.equation, conservative=cfg.conservative)
        fine = Grid(cfg.fine_size, eq.period)
        tdata = build_trajectory_data(
            eq, fine, jax.random.PRNGKey(0), num_trajectories=4,
            num_times=16, time_delta=cfg.time_delta,
            resample_factor=cfg.resample_factor,
            unroll_steps=cfg.num_time_steps, chunk_trajectories=2,
        )
        model, params, metrics = loop_lib.train(
            cfg, dataset=tdata, checkpoint_dir=str(tmp_path / "ck")
        )
        assert 0.2 < metrics["eval_total"] < 8.0, metrics  # held-out-trajectory eval: norms from train trajs
        restored = loop_lib.restore_params(str(tmp_path / "ck"))
        for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_host_resident_matches_device_resident(self):
        """The host-staged dataset (numpy leaves, per-batch transfer) must
        hold the same arrays as the device-resident build and train to the
        same params — it is a memory-placement choice, not a data change."""
        from pde_superresolution_tpu.training import (
            build_trajectory_data,
            sample_training_batch,
        )
        import dataclasses as dc
        import jax.numpy as jnp

        cfg = dc.replace(TINY, num_time_steps=2, learning_stops=(4,),
                         batch_size=8, eval_interval=4)
        eq = equations.from_name(cfg.equation, conservative=cfg.conservative)
        fine = Grid(cfg.fine_size, eq.period)
        build = lambda host: build_trajectory_data(
            eq, fine, jax.random.PRNGKey(0), num_trajectories=4,
            num_times=12, time_delta=cfg.time_delta,
            resample_factor=cfg.resample_factor,
            unroll_steps=cfg.num_time_steps, chunk_trajectories=2,
            host_resident=host,
        )
        dev, host = build(False), build(True)
        assert not dev.host_resident and host.host_resident
        assert isinstance(host.series, np.ndarray)
        assert isinstance(host.time_deriv_label, np.ndarray)
        assert host.nbytes() == dev.nbytes()
        np.testing.assert_array_equal(host.series, np.asarray(dev.series))
        for d in dev.deriv_labels:
            np.testing.assert_array_equal(
                host.deriv_labels[d], np.asarray(dev.deriv_labels[d])
            )

        # identical gathers through both paths (numpy vs jit/device)
        ti, si = np.asarray([0, 3, 1]), np.asarray([0, 5, 9])
        b_host = sample_training_batch(host, ti, si)
        b_dev = sample_training_batch(dev, jnp.asarray(ti), jnp.asarray(si))
        assert isinstance(b_host.inputs, np.ndarray)
        np.testing.assert_array_equal(b_host.inputs, np.asarray(b_dev.inputs))
        np.testing.assert_array_equal(b_host.rollout, np.asarray(b_dev.rollout))
        np.testing.assert_array_equal(b_host.t, np.asarray(b_dev.t))

        # same training outcome (batch streams are a pure function of seed)
        _, p_dev, m_dev = loop_lib.train(cfg, dataset=dev)
        _, p_host, m_host = loop_lib.train(cfg, dataset=host)
        for a, b in zip(jax.tree.leaves(p_dev), jax.tree.leaves(p_host)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            )
        assert abs(m_dev["eval_total"] - m_host["eval_total"]) < 1e-5


class TestLegacy2DH5:
    @staticmethod
    def _write_legacy(path, samples=12, nx=64, **attrs):
        import h5py
        rng = np.random.RandomState(0)
        with h5py.File(path, "w") as f:
            f.create_dataset("v", data=rng.randn(samples, nx).astype(np.float32))
            f.attrs["equation"] = "burgers"
            f.attrs["conservative"] = True
            f.attrs["period"] = 6.28
            f.attrs["fine_size"] = nx
            for k, v in attrs.items():
                f.attrs[k] = v

    def test_2d_snapshot_matrix_loads(self, tmp_path):
        path = str(tmp_path / "legacy.h5")
        self._write_legacy(path)
        with pytest.warns(UserWarning, match="ONE contiguous trajectory"):
            snaps, eq, grid = load_snapshots_h5(path)
        assert snaps.u.shape == (1, 12, 64)
        assert snaps.times.shape == (12,)
        assert snaps.synthetic_times
        assert abs(eq.period - 6.28) < 1e-6

    def test_2d_with_declared_trajectories(self, tmp_path):
        path = str(tmp_path / "legacy.h5")
        self._write_legacy(path, num_trajectories=3)
        snaps, _, _ = load_snapshots_h5(path)
        assert snaps.u.shape == (3, 4, 64)
        assert snaps.times.shape == (4,)
        # argument overrides the attr
        snaps2, _, _ = load_snapshots_h5(path, num_trajectories=2)
        assert snaps2.u.shape == (2, 6, 64)
        with pytest.raises(ValueError, match="does not divide"):
            load_snapshots_h5(path, num_trajectories=5)

    def test_flat_times_shared_window_ok(self, tmp_path):
        import h5py

        path = str(tmp_path / "legacy.h5")
        self._write_legacy(path, num_trajectories=3)
        with h5py.File(path, "a") as f:
            # 12 flat times = 3 trajectories x 4 times, all sharing a window
            f.create_dataset("times", data=np.tile(0.5 * np.arange(4), 3))
        snaps, _, _ = load_snapshots_h5(path)
        assert snaps.times.shape == (4,) and not snaps.synthetic_times
        np.testing.assert_allclose(np.asarray(snaps.times), 0.5 * np.arange(4))

    def test_flat_times_mismatched_windows_rejected(self, tmp_path):
        """Rows that are segments of one long run (different spacings or a
        differing window shape) must not silently get trajectory 0's times."""
        import h5py

        path = str(tmp_path / "legacy.h5")
        self._write_legacy(path, num_trajectories=3)
        with h5py.File(path, "a") as f:
            # one continuous ramp with non-uniform spacing across rows
            f.create_dataset("times", data=np.arange(12.0) ** 1.5)
        with pytest.raises(ValueError, match="shared time window"):
            load_snapshots_h5(path)

    def test_flat_times_shifted_segments_warn(self, tmp_path):
        import h5py

        path = str(tmp_path / "legacy.h5")
        self._write_legacy(path, num_trajectories=3)
        with h5py.File(path, "a") as f:
            # equal spacing but consecutive start times (one long run)
            f.create_dataset("times", data=0.5 * np.arange(12.0))
        with pytest.warns(UserWarning, match="differing start times"):
            snaps, _, _ = load_snapshots_h5(path)
        assert snaps.times.shape == (4,)

    def test_bogus_times_length_rejected(self, tmp_path):
        import h5py

        path = str(tmp_path / "legacy.h5")
        self._write_legacy(path, num_trajectories=3)
        with h5py.File(path, "a") as f:
            f.create_dataset("times", data=np.arange(7.0))
        with pytest.raises(ValueError, match="'times' has length 7"):
            load_snapshots_h5(path)

    def test_synthetic_times_refuse_unrolled_training(self, tmp_path):
        path = str(tmp_path / "legacy.h5")
        self._write_legacy(path, num_trajectories=3)
        snaps, eq, grid = load_snapshots_h5(path)
        assert snaps.synthetic_times
        with pytest.raises(ValueError, match="synthesized times"):
            build_training_data(eq, grid, snaps, 4, unroll_steps=2)
        # derivative-only training from the same file is fine
        data = build_training_data(eq, grid, snaps, 4, unroll_steps=0)
        assert data.inputs.shape == (12, 16)


class TestCommittedCheckpoints:
    """Every checkpoint shipped under artifacts/ckpt_* must stay loadable
    (the README promises `run_evaluation --checkpoint_dir=artifacts/...`
    works out of the box; a config forward-compat regression would break
    users silently)."""

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def _dirs(self):
        import glob

        return sorted(glob.glob(os.path.join(self.REPO, "artifacts", "ckpt_*")))

    def test_zoo_is_present(self):
        assert len(self._dirs()) >= 5, self._dirs()

    def test_all_load_and_produce_finite_rhs(self):
        for d in self._dirs():
            model, params, config = loop_lib.load_model(d)
            assert config.equation in ("burgers", "kdv", "ks"), d
            rhs = model.rhs_fn(params, None, use_pallas=False)
            u = np.sin(
                2 * np.pi * np.arange(model.grid.size) / model.grid.size
            ).astype(np.float32)
            out = rhs(u, 0.0)
            assert out.shape == u.shape, d
            assert np.isfinite(np.asarray(out)).all(), d


class TestUnrollCurriculum:
    """Phase-wise unroll growth (unroll_curriculum/curriculum_stops):
    the training-stability tool for long unrolls at hard coarsenings
    (KdV-16x unroll-32 diverges from a fresh init, RESULTS.md round 3)."""

    def test_validation_errors(self):
        base = dataclasses.replace(TINY)
        bad = [
            dict(unroll_curriculum=(1, 2), curriculum_stops=(12,)),      # len
            dict(unroll_curriculum=(2, 1), curriculum_stops=(6, 12)),    # order
            dict(unroll_curriculum=(1, 3), curriculum_stops=(6, 12)),    # K != num_time_steps
            dict(unroll_curriculum=(1, 2), curriculum_stops=(6, 9)),     # stop != num_steps
        ]
        for kw in bad:
            with pytest.raises(ValueError):
                dataclasses.replace(base, **kw).curriculum_phases()
        assert dataclasses.replace(
            base, unroll_curriculum=(1, 2), curriculum_stops=(6, 12)
        ).curriculum_phases() == ((1, 6), (2, 12))
        assert base.curriculum_phases() == ((2, 12),)

    def test_flat_path_trains_through_phases(self, tmp_path):
        metrics_path = str(tmp_path / "m.jsonl")
        cfg = dataclasses.replace(
            TINY, unroll_curriculum=(1, 2), curriculum_stops=(6, 12),
        )
        _, params, metrics = loop_lib.train(cfg, metrics_path=metrics_path)
        assert np.isfinite(metrics["eval_total"]), metrics
        import json

        records = [json.loads(l) for l in open(metrics_path)]
        seen = {int(r["step"]): int(r["unroll_steps"]) for r in records}
        # phase 1 (unroll 1) logs at step 6; phase 2 (unroll 2) at 12
        assert seen[6] == 1 and seen[12] == 2, seen

    def test_resume_past_curriculum_is_idempotent(self, tmp_path):
        ckpt = str(tmp_path / "ckpt")
        cfg = dataclasses.replace(
            TINY, unroll_curriculum=(1, 2), curriculum_stops=(6, 12),
        )
        _, params, _ = loop_lib.train(cfg, checkpoint_dir=ckpt)
        _, params2, _ = loop_lib.train(cfg, checkpoint_dir=ckpt)  # restores step 12
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_hparams_parse(self):
        cfg = parse_hparams(
            "num_time_steps=2,unroll_curriculum=1;2,curriculum_stops=6;12,"
            "learning_rates=1e-3,learning_stops=12"
        )
        assert cfg.curriculum_phases() == ((1, 6), (2, 12))

    def test_orphan_curriculum_stops_rejected(self):
        cfg = dataclasses.replace(TINY, curriculum_stops=(6, 12))
        with pytest.raises(ValueError, match="without\\s+unroll_curriculum"):
            cfg.curriculum_phases()

    def test_truncate_norms_is_bit_exact(self):
        """Prefix-sliced full-width norms == a fresh shorter computation
        (the invariant the curriculum loops rely on to compute norms once
        at the final width — losses.truncate_norms)."""
        eq = equations.from_name("burgers", conservative=True)
        fine = Grid(64, eq.period)
        snaps = generate_snapshots(
            eq, fine, jax.random.PRNGKey(0), num_trajectories=2, num_times=8,
            time_delta=0.05,
        )
        data = build_training_data(eq, fine, snaps, resample_factor=4, unroll_steps=4)
        model = StencilModel(
            eq, fine.resample(4), ModelConfig(num_layers=1, filters=4, stencil_size=4)
        )
        full = loss_lib.compute_loss_norms(model, data, 4, 0.05, substeps=2)
        fresh = loss_lib.compute_loss_norms(model, data, 2, 0.05, substeps=2)
        assert loss_lib.truncate_norms(full, 2) == fresh
        assert loss_lib.truncate_norms(full, 4) == full
        with pytest.raises(ValueError, match="cannot truncate"):
            loss_lib.truncate_norms(full, 5)

    def test_trajectory_path_trains_through_phases(self):
        from pde_superresolution_tpu.training import data as data_lib

        eq = equations.from_name("burgers", conservative=True)
        fine = Grid(64, eq.period)
        cfg = dataclasses.replace(
            TINY, num_trajectories=4, frac_training=0.75,
            unroll_curriculum=(1, 2), curriculum_stops=(6, 12),
        )
        traj = data_lib.build_trajectory_data(
            eq, fine, jax.random.PRNGKey(0), cfg.num_trajectories,
            cfg.num_times, cfg.time_delta, cfg.resample_factor,
            unroll_steps=cfg.num_time_steps,
        )
        _, params, metrics = loop_lib.train(cfg, dataset=traj)
        assert np.isfinite(metrics["eval_total"]), metrics
