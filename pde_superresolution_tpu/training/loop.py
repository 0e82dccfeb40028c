"""The training loop: optax Adam + piecewise LR, orbax checkpoints, JSONL logs.

≈ pde_superresolution/training.py §training_loop (unverified — see
SURVEY.md), redesigned TPU-first:

  * one jitted ``train_step`` (loss + grads + optax update) — no session,
    no feed dict; batches are sliced on device from a device-resident
    dataset (the datasets here are tiny by TPU standards);
  * checkpointing via orbax (params, opt_state, step, rng and the config
    JSON), enabling exact resume;
  * metrics stream to JSONL via utils.MetricsLogger.
"""

from __future__ import annotations

import functools
import os
import typing
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp

from pde_superresolution_tpu import integrate
from pde_superresolution_tpu.equations import from_name
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.models.stencil_net import StencilModel
from pde_superresolution_tpu.training import data as data_lib
from pde_superresolution_tpu.training import losses as loss_lib
from pde_superresolution_tpu.training.config import TrainingConfig
from pde_superresolution_tpu.utils.metrics import MetricsLogger


class TrainState(typing.NamedTuple):
    params: dict
    opt_state: typing.Any
    step: jnp.ndarray  # int32 scalar


def make_optimizer(config: TrainingConfig) -> optax.GradientTransformation:
    """Adam with the reference's piecewise-constant LR schedule."""
    rates = list(config.learning_rates)
    stops = list(config.learning_stops)
    if len(rates) != len(stops):
        raise ValueError("learning_rates and learning_stops must align")
    schedule = optax.join_schedules(
        [optax.constant_schedule(r) for r in rates],
        boundaries=stops[:-1],
    )
    chain = []
    if config.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(config.grad_clip_norm))
    chain.append(optax.adam(schedule))
    # a NaN batch (unstable rollout) must not poison params: apply_if_finite
    # skips the ENTIRE update (including optimizer-state mutation) on
    # non-finite grads. (zero_nans would be wrong here — zeroed grads still
    # apply a momentum-driven Adam step and corrupt the moments.)
    return optax.apply_if_finite(optax.chain(*chain), max_consecutive_errors=10**6)


# Config fields allowed to differ when resuming from a checkpoint: they
# only extend/re-pace the run, never change model/optimizer/data semantics.
# (learning_stops is special-cased: only its LAST element — which sets
# num_steps, not the schedule's boundaries — may change.)
_RESUME_MUTABLE = frozenset(
    {"eval_interval", "checkpoint_interval", "learning_stops"}
)


def _noise_key(config: TrainingConfig, step) -> jax.Array:
    """Per-step rollout-noise key, a pure function of (seed, step) so that
    resumed runs replay the exact noise stream of an uninterrupted one
    (mirrors the batch-index convention above). The offset decorrelates it
    from the data_seed/seed PRNGKey streams used for ICs and init. Called
    INSIDE the jitted train_step with the traced ``state.step`` — the key
    derivation compiles into the step instead of costing two eager
    dispatches per step on the host."""
    return jax.random.fold_in(jax.random.PRNGKey(config.seed + 0x6E01), step)


def _restore_state(ckpt_mgr, state: TrainState, config: TrainingConfig):
    """Restore the latest step's state, validating the live config against
    the one embedded in the checkpoint.

    Resuming a directory with changed hparams would silently continue with
    mismatched optimizer/schedule/data semantics — the same contract
    ``integrate_resumable`` enforces on (dt, t0, method). Raises ValueError
    listing every differing field outside ``_RESUME_MUTABLE``.
    """
    import json

    latest = ckpt_mgr.latest_step()
    if latest is None:
        return state
    # restore the config FIRST, alone: with a changed model architecture the
    # state restore itself fails deep in orbax with a shape error — the
    # config diff below is the actionable message.
    stored = ckpt_mgr.restore(
        latest, args=ocp.args.Composite(config=ocp.args.JsonRestore())
    )["config"]
    live = json.loads(config.to_json())
    # Checkpoints written before a config field existed must stay resumable:
    # round-trip the stored dict through TrainingConfig so missing fields
    # pick up the live defaults (which are defined to reproduce the old
    # behavior exactly — e.g. the round-2 absolute_error/relative_error
    # loss-weight keys default to the round-1 absolute-only loss).
    try:
        stored = json.loads(TrainingConfig.from_json(json.dumps(stored)).to_json())
    except (TypeError, KeyError):
        pass  # unknown/missing stored keys: the explicit diff below reports
    diffs = {
        k: (stored.get(k), live.get(k))
        for k in sorted(set(stored) | set(live))
        if k not in _RESUME_MUTABLE and stored.get(k) != live.get(k)
    }
    s_stops = list(stored.get("learning_stops", []))
    l_stops = list(live.get("learning_stops", []))
    if s_stops[:-1] != l_stops[:-1] or len(s_stops) != len(l_stops):
        diffs["learning_stops"] = (s_stops, l_stops)
    if diffs:
        raise ValueError(
            f"checkpoint at step {latest} was written with a different "
            f"config; refusing to resume. Differing fields "
            f"(stored, live): {diffs}. Use a fresh checkpoint_dir or "
            f"match the stored config."
        )
    restored = ckpt_mgr.restore(
        latest,
        args=ocp.args.Composite(state=ocp.args.StandardRestore(state)),
    )
    return restored["state"]


def _slice_batch(dataset: data_lib.TrainingData, idx: jnp.ndarray) -> data_lib.TrainingData:
    take = lambda leaf: jnp.take(leaf, idx, axis=0)
    return data_lib.TrainingData(
        inputs=take(dataset.inputs),
        t=take(dataset.t),
        forcing=(
            jax.tree.map(take, dataset.forcing)
            if dataset.forcing is not None
            else None
        ),
        deriv_labels={d: take(v) for d, v in dataset.deriv_labels.items()},
        time_deriv_label=take(dataset.time_deriv_label),
        rollout=take(dataset.rollout),
        traj_ids=(
            take(dataset.traj_ids) if dataset.traj_ids is not None else None
        ),
    )


def _split_train_eval(
    dataset: data_lib.TrainingData, frac_training: float, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """(train_idx, eval_idx) sample indices, split BY TRAJECTORY.

    A random split of the flattened (trajectory, time) samples leaks each
    eval trajectory's other timesteps into training, so eval losses are
    optimistically biased (the `_train_on_trajectories` path always split
    by trajectory; this brings the flat path in line). Falls back to the
    sample-level split — with a leakage warning — only when the dataset
    carries no trajectory ids (externally built TrainingData).
    """
    import warnings

    n = dataset.num_samples
    rng = np.random.RandomState(seed)
    if dataset.traj_ids is None:
        warnings.warn(
            "dataset carries no traj_ids: falling back to a sample-level "
            "train/eval split, which leaks eval trajectories' other "
            "timesteps into training (eval losses will read optimistic). "
            "Build the dataset with build_training_data to get the "
            "by-trajectory split.",
            stacklevel=3,
        )
        perm = rng.permutation(n)
        n_train = int(frac_training * n)
        if n_train in (0, n):
            # mean over an empty split would silently yield NaN metrics
            raise ValueError(
                f"eval split is empty ({n} samples, frac_training="
                f"{frac_training}): lower frac_training or add data"
            )
        return perm[:n_train], perm[n_train:]
    ids = np.asarray(dataset.traj_ids)
    unique = np.unique(ids)
    traj_perm = rng.permutation(unique)
    n_train_traj = int(frac_training * unique.size)
    train_traj = traj_perm[:n_train_traj]
    mask = np.isin(ids, train_traj)
    # shuffle within each split so fixed-size batch slices don't correlate
    # with trajectory order
    train_idx = rng.permutation(np.nonzero(mask)[0])
    eval_idx = rng.permutation(np.nonzero(~mask)[0])
    if eval_idx.size == 0 or train_idx.size == 0:
        raise ValueError(
            f"train or eval split is empty under the by-trajectory split "
            f"({unique.size} trajectories, frac_training={frac_training}): "
            "adjust frac_training or add trajectories (evaluating on "
            "training trajectories would defeat the no-leakage guarantee)"
        )
    return train_idx, eval_idx


def train(
    config: TrainingConfig,
    dataset: Optional[data_lib.TrainingData] = None,
    checkpoint_dir: Optional[str] = None,
    metrics_path: Optional[str] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    tensorboard_dir: Optional[str] = None,
) -> tuple[StencilModel, dict, dict]:
    """Train a learned discretization end to end.

    If ``dataset`` is None, snapshots are generated on device from the
    config (exact ETDRK4 solves). Returns (model, params, final_metrics).

    With ``mesh``, the dataset and every batch are sharded over the
    trajectory/sample axis ("data"); if the mesh also has a non-trivial
    "space" axis, the spatial grid axis of fields is sharded too (GSPMD
    auto-partitions the rolls/convs — verified gradient-exact in
    tests/test_parallel.py). Gradients reduce via XLA collectives.
    """
    equation = from_name(
        config.equation,
        conservative=config.conservative,
        **config.equation_params,
    )
    fine = Grid(config.fine_size, equation.period)
    coarse = fine.resample(
        config.resample_factor, conservative=config.conservative
    )
    model = StencilModel(equation, coarse, config.model)

    # --- large-ensemble path: trajectory-structured dataset -------------------
    if isinstance(dataset, data_lib.TrajectoryData):
        return _train_on_trajectories(
            config, equation, coarse, model, dataset,
            checkpoint_dir, metrics_path, mesh, tensorboard_dir,
        )

    # --- data ----------------------------------------------------------------
    if dataset is None:
        key = jax.random.PRNGKey(config.data_seed)
        snapshots = data_lib.generate_snapshots(
            equation,
            fine,
            key,
            num_trajectories=config.num_trajectories,
            num_times=config.num_times,
            time_delta=config.time_delta,
            warmup_time=config.warmup_time,
            ic_scale=config.ic_scale,
        )
        dataset = data_lib.build_training_data(
            equation,
            fine,
            snapshots,
            config.resample_factor,
            unroll_steps=config.num_time_steps,
        )

    train_idx, eval_idx = _split_train_eval(
        dataset, config.frac_training, config.seed
    )
    n_train = train_idx.size
    train_set = _slice_batch(dataset, jnp.asarray(train_idx))
    eval_set = _slice_batch(dataset, jnp.asarray(eval_idx))

    substeps = config.coarse_time_subsample
    if substeps == 0:  # auto: respect the MODEL's explicit-RK4 CFL (wide
        # stencils have larger spectral radii than the equation-level
        # bound assumes — StencilModel.stable_time_step)
        stable = model.stable_time_step(u_scale=3.0)
        substeps = max(1, int(np.ceil(config.time_delta / stable)))
    dt = config.time_delta  # snapshot spacing; inner step = dt / substeps
    phases = config.curriculum_phases()  # ((unroll_k, end_step), ...)

    # --- optimizer / state -----------------------------------------------------
    tx = make_optimizer(config)
    params = model.init_params(jax.random.PRNGKey(config.seed))
    state = TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))

    # --- sharding (optional DP over the sample axis) ----------------------------
    if mesh is not None:
        n_data = mesh.shape["data"]
        if config.batch_size % n_data:
            raise ValueError(
                f"batch_size {config.batch_size} must be divisible by the "
                f"mesh data axis ({n_data})"
            )
        # trim the eval split to a shardable multiple
        n_eval = (eval_set.num_samples // n_data) * n_data
        if n_eval == 0:
            raise ValueError("eval split smaller than the mesh data axis")
        eval_set = _slice_batch(eval_set, jnp.arange(n_eval))
        space = (
            "space"
            if "space" in mesh.axis_names and mesh.shape["space"] > 1
            else None
        )
        P = jax.sharding.PartitionSpec

        def spec_for(leaf):
            # leading axis = samples; last axis = space (fields only);
            # rollout has an extra middle time axis.
            if leaf.ndim == 1:  # t
                return P("data")
            if leaf.ndim == 2 and leaf.shape[-1] == coarse.size:
                return P("data", space)
            if leaf.ndim == 3 and leaf.shape[-1] == coarse.size:
                return P("data", None, space)
            return P("data")  # forcing leaves [n, terms]

        replicated = jax.sharding.NamedSharding(mesh, P())
        state = jax.device_put(state, replicated)
        shard_batch = lambda b: jax.tree.map(
            lambda leaf: jax.device_put(
                leaf, jax.sharding.NamedSharding(mesh, spec_for(leaf))
            ),
            b,
        )
    else:
        shard_batch = lambda b: b

    # Norms are computed ONCE at the final curriculum width; each phase
    # takes the exact prefix (shorter-unroll norms are bit-identical to a
    # fresh computation — see losses.truncate_norms).
    full_norms = loss_lib.compute_loss_norms(
        model, train_set, phases[-1][0], dt, substeps,
        floor_quantile=config.loss_weights.error_floor_quantile,
    )

    def make_steps(unroll_k: int):
        """(train_step, eval_step) jitted for one curriculum phase, with
        the per-rollout-step integrated-target normalizers restricted to
        this phase's unroll width."""
        norms = loss_lib.truncate_norms(full_norms, unroll_k)
        loss_fn = functools.partial(
            loss_lib.compute_loss,
            model,
            norms=norms,
            weights=config.loss_weights,
            dt=dt,
            unroll_steps=unroll_k,
            substeps=substeps,
            rollout_noise=config.rollout_noise,
        )

        @jax.jit
        def train_step(state: TrainState, batch: data_lib.TrainingData):
            noise_key = _noise_key(config, state.step)
            (_, parts), grads = jax.value_and_grad(
                lambda p: loss_fn(p, batch, noise_key=noise_key),
                has_aux=True,
            )(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), parts

        @jax.jit
        def eval_step(params, batch):
            # eval is always CLEAN: noise_key=None disables injection
            _, parts = loss_fn(params, batch)
            return parts

        return train_step, eval_step

    # --- checkpointing -----------------------------------------------------------
    ckpt_mgr = None
    if checkpoint_dir:
        ckpt_mgr = ocp.CheckpointManager(
            os.path.abspath(checkpoint_dir),
            options=ocp.CheckpointManagerOptions(max_to_keep=3),
        )
        state = _restore_state(ckpt_mgr, state, config)

    logger = MetricsLogger(metrics_path, tensorboard_dir)
    metrics = {}
    for unroll_k, phase_end in phases:
        if int(state.step) >= phase_end:
            continue  # resumed past this phase
        train_step, eval_step = make_steps(unroll_k)
        for step in range(int(state.step), phase_end):
            # batch indices are a pure function of (seed, step) so that a
            # resumed run replays exactly the batch stream of an
            # uninterrupted one.
            idx = np.random.RandomState(config.seed * 100003 + step).randint(
                0, n_train, size=config.batch_size
            )
            batch = shard_batch(_slice_batch(train_set, jnp.asarray(idx)))
            state, parts = train_step(state, batch)

            if (step + 1) % config.eval_interval == 0 or step + 1 == phase_end:
                eval_parts = eval_step(state.params, shard_batch(eval_set))
                metrics = {
                    **{f"train_{k}": float(v) for k, v in parts.items()},
                    **{f"eval_{k}": float(v) for k, v in eval_parts.items()},
                }
                logger.log(step + 1, unroll_steps=unroll_k, **metrics)
            if ckpt_mgr and (
                (step + 1) % config.checkpoint_interval == 0
                or step + 1 == phase_end
            ):
                ckpt_mgr.save(
                    step + 1,
                    args=ocp.args.Composite(
                        state=ocp.args.StandardSave(state),
                        config=ocp.args.JsonSave(
                            __import__("json").loads(config.to_json())
                        ),
                    ),
                )
    if ckpt_mgr:
        ckpt_mgr.wait_until_finished()
        ckpt_mgr.close()
    logger.close()
    return model, state.params, metrics


def _train_on_trajectories(
    config: TrainingConfig,
    equation,
    coarse: Grid,
    model: StencilModel,
    data: data_lib.TrajectoryData,
    checkpoint_dir: Optional[str],
    metrics_path: Optional[str],
    mesh: Optional[jax.sharding.Mesh],
    tensorboard_dir: Optional[str] = None,
) -> tuple[StencilModel, dict, dict]:
    """Training over a TrajectoryData ensemble (10k-trajectory scale).

    Differences from the flat path: the train/eval split is BY TRAJECTORY
    (no leakage of a trajectory's other timesteps into eval), batches are
    (trajectory, time) index pairs gathered on device by
    ``sample_training_batch`` (rollout windows sliced on the fly), and the
    eval set is one fixed sampled batch.
    """
    if config.num_time_steps != data.unroll_steps:
        raise ValueError(
            f"config.num_time_steps={config.num_time_steps} != dataset "
            f"unroll_steps={data.unroll_steps}"
        )
    n_traj = data.num_trajectories
    usable = data.usable_times
    n_train = max(1, int(config.frac_training * n_traj))
    perm = np.random.RandomState(config.seed).permutation(n_traj)
    train_traj = jnp.asarray(perm[:n_train])
    eval_traj = perm[n_train:]

    substeps = config.coarse_time_subsample
    if substeps == 0:  # model-aware CFL (see train())
        stable = model.stable_time_step(u_scale=3.0)
        substeps = max(1, int(np.ceil(config.time_delta / stable)))
    dt = config.time_delta

    sample = functools.partial(
        data_lib.sample_training_batch, unroll_steps=data.unroll_steps
    )
    if data.host_resident:
        # host-staged dataset (numpy leaves): gather in numpy on the host
        # and ship only the batch each step. Jitting the gather here would
        # device_put the WHOLE series on every call, defeating the staging.
        as_idx = np.asarray
    else:
        sample = jax.jit(sample)
        as_idx = jnp.asarray

    def draw(rng, traj_pool, size):
        ti = as_idx(rng.choice(traj_pool, size=size))
        si = as_idx(rng.randint(0, usable, size=size))
        return sample(data, ti, si)

    if eval_traj.size == 0:
        raise ValueError(
            "by-trajectory eval split is empty: lower frac_training or add "
            "trajectories (silently evaluating on training trajectories "
            "would defeat the no-leakage guarantee)"
        )
    rng_eval = np.random.RandomState(config.seed + 7)
    eval_batch = draw(rng_eval, eval_traj, min(1024, config.batch_size * 8))
    norm_batch = draw(
        np.random.RandomState(config.seed + 11), perm[:n_train], 1024
    )
    phases = config.curriculum_phases()  # ((unroll_k, end_step), ...)

    tx = make_optimizer(config)
    params = model.init_params(jax.random.PRNGKey(config.seed))
    state = TrainState(params, tx.init(params), jnp.asarray(0, jnp.int32))

    if mesh is not None:
        if config.batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {config.batch_size} must be divisible by the "
                f"mesh data axis ({mesh.shape['data']})"
            )
        replicated = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()
        )
        batch_sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data")
        )
        state = jax.device_put(state, replicated)
        shard_batch = lambda b: jax.tree.map(
            lambda leaf: jax.device_put(leaf, batch_sharding), b
        )
    else:
        shard_batch = lambda b: b

    # one full-width norms computation; phases slice the exact prefix
    # (losses.truncate_norms)
    full_norms = loss_lib.compute_loss_norms(
        model, norm_batch, phases[-1][0], dt, substeps,
        floor_quantile=config.loss_weights.error_floor_quantile,
    )

    def make_steps(unroll_k: int):
        """(train_step, eval_step) for one curriculum phase. Batches carry
        full-width (data.unroll_steps) rollout windows; compute_loss reads
        only the first ``unroll_k`` — norms are the phase-width prefix."""
        norms = loss_lib.truncate_norms(full_norms, unroll_k)
        loss_fn = functools.partial(
            loss_lib.compute_loss,
            model,
            norms=norms,
            weights=config.loss_weights,
            dt=dt,
            unroll_steps=unroll_k,
            substeps=substeps,
            rollout_noise=config.rollout_noise,
        )

        @jax.jit
        def train_step(state: TrainState, batch: data_lib.TrainingData):
            noise_key = _noise_key(config, state.step)
            (_, parts), grads = jax.value_and_grad(
                lambda p: loss_fn(p, batch, noise_key=noise_key),
                has_aux=True,
            )(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), parts

        @jax.jit
        def eval_step(params, batch):
            # eval is always CLEAN: noise_key=None disables injection
            return loss_fn(params, batch)[1]

        return train_step, eval_step

    ckpt_mgr = None
    if checkpoint_dir:
        ckpt_mgr = ocp.CheckpointManager(
            os.path.abspath(checkpoint_dir),
            options=ocp.CheckpointManagerOptions(max_to_keep=3),
        )
        state = _restore_state(ckpt_mgr, state, config)

    logger = MetricsLogger(metrics_path, tensorboard_dir)
    metrics = {}
    train_pool = perm[:n_train]
    for unroll_k, phase_end in phases:
        if int(state.step) >= phase_end:
            continue  # resumed past this phase
        train_step, eval_step = make_steps(unroll_k)
        for step in range(int(state.step), phase_end):
            rng = np.random.RandomState(config.seed * 100003 + step)
            batch = shard_batch(draw(rng, train_pool, config.batch_size))
            state, parts = train_step(state, batch)
            if (step + 1) % config.eval_interval == 0 or step + 1 == phase_end:
                eval_parts = eval_step(state.params, shard_batch(eval_batch))
                metrics = {
                    **{f"train_{k}": float(v) for k, v in parts.items()},
                    **{f"eval_{k}": float(v) for k, v in eval_parts.items()},
                }
                logger.log(step + 1, unroll_steps=unroll_k, **metrics)
            if ckpt_mgr and (
                (step + 1) % config.checkpoint_interval == 0
                or step + 1 == phase_end
            ):
                ckpt_mgr.save(
                    step + 1,
                    args=ocp.args.Composite(
                        state=ocp.args.StandardSave(state),
                        config=ocp.args.JsonSave(
                            __import__("json").loads(config.to_json())
                        ),
                    ),
                )
    if ckpt_mgr:
        ckpt_mgr.wait_until_finished()
        ckpt_mgr.close()
    logger.close()
    return model, state.params, metrics


def _restore_state_host(checkpoint_dir: str, step: int) -> dict:
    """Restore a checkpoint's state as HOST (numpy) arrays.

    A bare ``mgr.restore(step)`` rebuilds every array with the sharding
    recorded at SAVE time, so a checkpoint written on a TPU refuses to
    load anywhere else ("Device TPU v5 lite0 was not found in
    jax.local_devices()"). The committed checkpoint zoo must be loadable
    on any machine; the inference paths therefore restore to host numpy
    and let JAX place arrays on first use (tested CPU-side in
    tests/test_training.py::TestCommittedCheckpoints)."""
    path = os.path.join(os.path.abspath(checkpoint_dir), str(step), "state")
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path).item_metadata
    meta_tree = getattr(meta, "tree", meta)
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree
    )
    return ckptr.restore(path, restore_args=restore_args)


def restore_params(checkpoint_dir: str) -> dict:
    """Restore the latest checkpoint's params (inference path)."""
    mgr = ocp.CheckpointManager(os.path.abspath(checkpoint_dir))
    step = mgr.latest_step()
    mgr.close()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {checkpoint_dir}")
    return _restore_state_host(checkpoint_dir, step)["params"]


def load_model(checkpoint_dir: str) -> tuple[StencilModel, dict, TrainingConfig]:
    """Rebuild (model, params, config) from a checkpoint directory.

    The TPU-native counterpart of the reference's SavedModelDifferentiator
    (≈ integrate.py §SavedModelDifferentiator, unverified): the returned
    model's ``rhs_fn(params, forcing)`` plugs straight into
    ``integrate.integrate``.
    """
    import json

    mgr = ocp.CheckpointManager(os.path.abspath(checkpoint_dir))
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint under {checkpoint_dir}")
    restored = {
        "config": mgr.restore(
            step, args=ocp.args.Composite(config=ocp.args.JsonRestore())
        )["config"],
        "state": _restore_state_host(checkpoint_dir, step),
    }
    mgr.close()
    config = TrainingConfig.from_json(json.dumps(restored["config"]))
    equation = from_name(
        config.equation,
        conservative=config.conservative,
        **config.equation_params,
    )
    fine = Grid(config.fine_size, equation.period)
    model = StencilModel(
        equation,
        fine.resample(config.resample_factor, conservative=config.conservative),
        config.model,
    )
    return model, restored["state"]["params"], config
