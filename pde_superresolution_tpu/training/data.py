"""On-device training data generation and coarse-grained label construction.

Replaces the reference's pipeline (scripts/create_training_data.py: scipy
spectral solve on CPU -> HDF5 -> training.py §make_dataset label pipeline —
unverified citations, see SURVEY.md) with a fully on-device path: ETDRK4
exact solves, spectral labels, and coarse-graining all run jitted on the
TPU; HDF5 import/export is kept for parity/interchange.

Label conventions:
  * non-conservative (finite differences): coarse-graining = subsample;
    derivative labels are fine-grid spectral derivatives subsampled at the
    coarse points.
  * conservative (finite volumes): coarse-graining = block mean; derivative
    labels are fine-grid spectral derivatives evaluated (via the Fourier
    shift theorem) exactly at the coarse cell FACES x_{j+1/2}; the
    time-derivative label is the block mean of the fine-grid RHS (exact, by
    linearity).
"""

from __future__ import annotations

import typing
from typing import Optional

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from pde_superresolution_tpu import integrate
from pde_superresolution_tpu.equations import Equation, ForcingParams, from_name
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.ops import resample, spectral


class Snapshots(typing.NamedTuple):
    """Fine-grid solution snapshots (≈ the reference's HDF5 dataset)."""

    u: jnp.ndarray  # [num_trajectories, num_times, nx_fine]
    times: jnp.ndarray  # [num_times]
    forcing: Optional[ForcingParams]  # leaves [num_trajectories, terms]
    # True when the file carried no 'times' dataset and times were
    # synthesized as arange (unit spacing): fine for derivative-only
    # training, but unrolled-loss rollout labels would silently assume a
    # wrong (and possibly boundary-crossing) time structure — see
    # build_training_data.
    synthetic_times: bool = False


class TrainingData(typing.NamedTuple):
    """Flattened (trajectory, time) samples with coarse inputs and labels."""

    inputs: jnp.ndarray  # [n, nx_coarse]
    t: jnp.ndarray  # [n]
    forcing: Optional[ForcingParams]  # leaves [n, terms]
    deriv_labels: dict  # {order: [n, nx_coarse]}
    time_deriv_label: jnp.ndarray  # [n, nx_coarse]
    rollout: jnp.ndarray  # [n, unroll_steps, nx_coarse] (unroll may be 0)
    # source-trajectory index per sample [n], so train() can split
    # train/eval BY TRAJECTORY (a random sample split leaks each eval
    # trajectory's other timesteps into training and biases eval losses
    # optimistically). None only for externally built datasets that carry
    # no trajectory structure — train() then falls back to a sample split
    # with a leakage warning.
    traj_ids: Optional[jnp.ndarray] = None

    @property
    def num_samples(self) -> int:
        return self.inputs.shape[0]


def generate_snapshots(
    equation: Equation,
    fine_grid: Grid,
    key: jax.Array,
    num_trajectories: int,
    num_times: int,
    time_delta: float,
    warmup_time: float = 0.0,
    ic_scale: float = 1.0,
) -> Snapshots:
    """Exact (spectral ETDRK4) solves sampled every ``time_delta``.

    ``time_delta`` should be the coarse solver's step (or an integer multiple)
    so that unrolled training losses line up with saved snapshots. The ETDRK4
    internal step subdivides ``time_delta`` as needed for accuracy.
    """
    k_ic, k_f = jax.random.split(key)
    u0 = ic_scale * equation.initial_conditions(k_ic, fine_grid, (num_trajectories,))
    forcing = equation.sample_forcing(k_f, (num_trajectories,))
    times, traj = integrate.exact_solve_sampled(
        equation, fine_grid, u0, time_delta, num_times,
        warmup_time=warmup_time, forcing=forcing,
    )
    # traj: [num_times, num_traj, nx] -> [num_traj, num_times, nx]
    return Snapshots(u=jnp.swapaxes(traj, 0, 1), times=times, forcing=forcing)


def _coarse_fields_and_labels(
    equation: Equation,
    fine_grid: Grid,
    snapshots: Snapshots,
    factor: int,
    usable: int,
):
    """Shared label pipeline: (coarse series [traj, times, nx],
    {order: labels [traj, usable, nx]}, u_t labels [traj, usable, nx])."""
    conservative = equation.conservative
    u = snapshots.u  # [traj, times, nx_fine]
    if conservative:
        coarsen = lambda f: resample.resample_mean(f, factor)
    else:
        coarsen = lambda f: resample.subsample(f, factor)

    inputs_all = coarsen(u)  # [traj, times, nx_c]

    deriv_labels = {}
    for d in equation.derivative_orders:
        if conservative:
            # exact value/derivative at coarse right faces:
            # x = (j*factor + factor - 0.5) * dx_fine
            offset = (factor - 0.5) * fine_grid.dx
            shifted = spectral.spectral_derivative_at_offset(
                u, d, fine_grid.period, offset
            )
            label = resample.subsample(shifted, factor)
        else:
            fine_deriv = spectral.spectral_derivative(u, d, fine_grid.period)
            label = resample.subsample(fine_deriv, factor)
        deriv_labels[d] = label[:, :usable]

    # vmap the exact spectral RHS over the time axis; the per-trajectory
    # forcing (closed over) broadcasts against u_i [traj, nx].
    rhs = integrate.SpectralDifferentiator(equation, fine_grid).rhs_fn(
        snapshots.forcing
    )
    ut_fine = jax.vmap(rhs, in_axes=(1, 0), out_axes=1)(u, snapshots.times)
    time_deriv_label = coarsen(ut_fine)[:, :usable]
    return inputs_all, deriv_labels, time_deriv_label


def build_training_data(
    equation: Equation,
    fine_grid: Grid,
    snapshots: Snapshots,
    resample_factor: int,
    unroll_steps: int = 0,
) -> TrainingData:
    """Coarse inputs + spectral labels from fine snapshots (see module doc)."""
    factor = resample_factor
    coarse = fine_grid.resample(factor)
    u = snapshots.u  # [traj, times, nx_fine]
    num_traj, num_times, _ = u.shape
    usable = num_times - unroll_steps
    if usable < 1:
        raise ValueError(
            f"need > {unroll_steps} snapshot times, got {num_times}"
        )
    if unroll_steps > 0 and snapshots.synthetic_times:
        raise ValueError(
            "unrolled-loss training from snapshots with synthesized times: "
            "the file carried no 'times' dataset, so the snapshot spacing "
            "(and trajectory structure) is unknown and rollout labels would "
            "be silently wrong. Set num_time_steps=0 (derivative-only "
            "training) or use a file with an explicit 'times' dataset."
        )
    times = snapshots.times
    inputs_all, deriv_labels, time_deriv_label = _coarse_fields_and_labels(
        equation, fine_grid, snapshots, factor, usable
    )

    # --- rollout labels ----------------------------------------------------------
    if unroll_steps > 0:
        idx = jnp.arange(usable)[:, None] + jnp.arange(1, unroll_steps + 1)
        rollout = inputs_all[:, idx]  # [traj, usable, K, nx_c]
    else:
        rollout = jnp.zeros((num_traj, usable, 0, coarse.size), inputs_all.dtype)

    # --- flatten (traj, time) -> samples ---------------------------------------
    def flat(a):
        return a.reshape((num_traj * usable,) + a.shape[2:])

    inputs = flat(inputs_all[:, :usable])
    t_flat = jnp.tile(times[:usable], num_traj)
    if snapshots.forcing is not None:
        forcing_flat = jax.tree.map(
            lambda leaf: jnp.repeat(leaf, usable, axis=0), snapshots.forcing
        )
    else:
        forcing_flat = None
    return TrainingData(
        inputs=inputs,
        t=t_flat,
        forcing=forcing_flat,
        deriv_labels={d: flat(v) for d, v in deriv_labels.items()},
        time_deriv_label=flat(time_deriv_label),
        rollout=flat(rollout),
        traj_ids=jnp.repeat(jnp.arange(num_traj, dtype=jnp.int32), usable),
    )


# ---------------------------------------------------------------------------
# Large-ensemble (10k-trajectory) training: structured dataset + sampler.
# ---------------------------------------------------------------------------


class TrajectoryData(typing.NamedTuple):
    """Trajectory-structured training data for large ensembles.

    Unlike the flat ``TrainingData`` (whose materialized ``rollout`` copies
    each field ``unroll_steps`` times — a 10k-trajectory KS dataset at
    unroll 8 would need ~10 GB for rollouts alone), rollout windows here are
    gathered ON THE FLY from the full coarse series when a batch is sampled.
    HBM cost is one copy of each label array.

    Leaves are either device arrays (default: the whole dataset lives in
    HBM, batch gathers are jitted) or HOST numpy arrays
    (``build_trajectory_data(host_resident=True)``): batch gathers then run
    in numpy and only the gathered batch crosses to the device each step —
    the path for ensembles larger than HBM (~40k KS-8x trajectories fill a
    16 GB v5e once params/rollouts are accounted for).
    """

    series: jnp.ndarray  # [traj, num_times, nx] full coarse series
    times: jnp.ndarray  # [num_times]
    forcing: Optional[ForcingParams]  # leaves [traj, terms]
    deriv_labels: dict  # {order: [traj, usable, nx]}
    time_deriv_label: jnp.ndarray  # [traj, usable, nx]
    unroll_steps: int  # static

    @property
    def num_trajectories(self) -> int:
        return self.series.shape[0]

    @property
    def usable_times(self) -> int:
        return self.series.shape[1] - self.unroll_steps

    @property
    def host_resident(self) -> bool:
        return isinstance(self.series, np.ndarray)

    def nbytes(self) -> int:
        """Total array bytes (device or host) held by this dataset."""
        arrays = [self.series, self.times, self.time_deriv_label]
        arrays += list(self.deriv_labels.values())
        if self.forcing is not None:
            arrays += jax.tree.leaves(self.forcing)
        return sum(a.nbytes for a in arrays)


def build_trajectory_data(
    equation: Equation,
    fine_grid: Grid,
    key: jax.Array,
    num_trajectories: int,
    num_times: int,
    time_delta: float,
    resample_factor: int,
    unroll_steps: int,
    warmup_time: float = 0.0,
    ic_scale: float = 1.0,
    chunk_trajectories: int = 512,
    host_resident: bool = False,
) -> TrajectoryData:
    """Generate a large ensemble in trajectory chunks (fine snapshots are
    discarded per chunk; only coarse fields/labels accumulate), on device.

    A 10k-trajectory KS-8x dataset costs ~6 GB HBM this way (vs >10 GB fine
    snapshots + >10 GB materialized rollouts for the flat pipeline).

    With ``host_resident=True`` each chunk's coarse fields/labels are pulled
    to host numpy as soon as they are computed (generation itself — the
    fine ETDRK4 solves and label spectral math — still runs on device, one
    chunk of fine snapshots in HBM at a time). The returned dataset's leaves
    are numpy; batch sampling gathers on host and ships only the batch to
    the device. This is how ensembles LARGER than HBM train: the dataset
    size is then bounded by host RAM, not the chip (65k KS-8x trajectories
    ≈ 9 GB host vs a 16 GB v5e that also needs params + rollout activations).
    """
    chunks = []
    times = None
    usable = num_times - unroll_steps
    num_chunks = int(np.ceil(num_trajectories / chunk_trajectories))
    to_host = (lambda t: jax.tree.map(np.asarray, t)) if host_resident else (
        lambda t: t
    )
    for c in range(num_chunks):
        n_c = min(chunk_trajectories, num_trajectories - c * chunk_trajectories)
        snaps = generate_snapshots(
            equation, fine_grid, jax.random.fold_in(key, c), n_c, num_times,
            time_delta, warmup_time=warmup_time, ic_scale=ic_scale,
        )
        series, deriv_labels, ut_label = _coarse_fields_and_labels(
            equation, fine_grid, snaps, resample_factor, usable
        )
        chunks.append(
            TrajectoryData(
                series=to_host(series),
                times=snaps.times,
                forcing=to_host(snaps.forcing),
                deriv_labels=to_host(deriv_labels),
                time_deriv_label=to_host(ut_label),
                unroll_steps=unroll_steps,
            )
        )
        times = snaps.times
    cat = (np.concatenate if host_resident else jnp.concatenate)
    cat_leaves = lambda leaves: cat(leaves, axis=0)
    forcing = None
    if chunks[0].forcing is not None:
        forcing = jax.tree.map(
            lambda *l: cat_leaves(list(l)), *[c.forcing for c in chunks]
        )
    return TrajectoryData(
        series=cat_leaves([c.series for c in chunks]),
        times=np.asarray(times) if host_resident else times,
        forcing=forcing,
        deriv_labels={
            d: cat_leaves([c.deriv_labels[d] for c in chunks])
            for d in chunks[0].deriv_labels
        },
        time_deriv_label=cat_leaves([c.time_deriv_label for c in chunks]),
        unroll_steps=unroll_steps,
    )


def sample_training_batch(
    data: TrajectoryData,
    traj_idx: jnp.ndarray,
    time_idx: jnp.ndarray,
    unroll_steps: int | None = None,
) -> TrainingData:
    """Gather a flat TrainingData batch (with rollout windows) from the
    structured dataset. Pure gathers; rollout windows are sliced from
    ``series`` on the fly. Under jit, pass ``unroll_steps`` explicitly as a
    static argument (the NamedTuple field would trace as a leaf).

    Works unchanged on a host-resident dataset (numpy leaves + numpy
    indices): the gathers then run in numpy on the host and the returned
    batch is numpy — the caller's jitted step transfers just the batch.
    Do NOT jit this function over a host-resident dataset (jit would
    device_put the whole series every call, defeating the staging)."""
    k = data.unroll_steps if unroll_steps is None else unroll_steps
    xp = np if data.host_resident else jnp
    inputs = data.series[traj_idx, time_idx]
    window = time_idx[:, None] + xp.arange(1, k + 1)  # [B, K]
    rollout = data.series[traj_idx[:, None], window]  # [B, K, nx]
    forcing = (
        jax.tree.map(lambda leaf: leaf[traj_idx], data.forcing)
        if data.forcing is not None
        else None
    )
    return TrainingData(
        inputs=inputs,
        t=data.times[time_idx],
        forcing=forcing,
        deriv_labels={d: v[traj_idx, time_idx] for d, v in data.deriv_labels.items()},
        time_deriv_label=data.time_deriv_label[traj_idx, time_idx],
        rollout=rollout,
        traj_ids=traj_idx.astype(xp.int32),
    )


# ---------------------------------------------------------------------------
# HDF5 interchange (reference-format parity: dataset 'v' of snapshots).
# ---------------------------------------------------------------------------


def save_snapshots_h5(
    path: str, snapshots: Snapshots, equation: Equation, fine_grid: Grid
) -> None:
    """Write snapshots to HDF5 (dataset ``v`` [traj, times, nx] + attrs).

    The reference stores a 2-D snapshot matrix (≈ create_training_data.py,
    layout unverified); we store the trajectory axis explicitly and flatten
    on demand for 2-D consumers.
    """
    import json as _json

    with h5py.File(path, "w") as f:
        f.create_dataset("v", data=np.asarray(snapshots.u))
        f.create_dataset("times", data=np.asarray(snapshots.times))
        f.attrs["equation"] = equation.name
        f.attrs["conservative"] = equation.conservative
        f.attrs["period"] = equation.period
        f.attrs["fine_size"] = fine_grid.size
        # full equation parameters (eta, period, ...) so non-default physics
        # round-trips; 'conservative' is stored separately above
        from pde_superresolution_tpu.equations import params_dict

        f.attrs["equation_params"] = _json.dumps(params_dict(equation))
        if snapshots.forcing is not None:
            g = f.create_group("forcing")
            for name, leaf in snapshots.forcing._asdict().items():
                g.create_dataset(name, data=np.asarray(leaf))


def load_snapshots_h5(
    path: str, num_trajectories: Optional[int] = None
) -> tuple[Snapshots, Equation, Grid]:
    """Load snapshots; both layouts are accepted:

      * native 3-D ``v`` [trajectory, time, x] + ``times`` [time];
      * reference-style 2-D ``v`` [samples, x] (exact reference layout
        unverified — SURVEY.md §7-7). The sample axis is split into
        ``num_trajectories`` equal trajectories (argument, or the file's
        ``num_trajectories`` attr); with neither, it is treated as ONE
        contiguous trajectory and a warning is emitted, since rollout
        windows would silently span any hidden trajectory boundaries.

    When the file has no ``times`` dataset, times are synthesized as arange
    and the snapshots are marked ``synthetic_times``; build_training_data
    then refuses unrolled-loss training (the spacing is unknown).
    """
    import warnings

    with h5py.File(path, "r") as f:
        u = jnp.asarray(f["v"][...])
        synthetic = False
        if u.ndim == 2:
            count = num_trajectories or int(f.attrs.get("num_trajectories", 0))
            if count:
                if u.shape[0] % count:
                    raise ValueError(
                        f"2-D snapshot matrix with {u.shape[0]} samples does "
                        f"not divide into num_trajectories={count}"
                    )
                u = u.reshape(count, u.shape[0] // count, u.shape[1])
            else:
                warnings.warn(
                    f"{path}: 2-D snapshot matrix with no trajectory count "
                    "(num_trajectories attr or argument): treating all "
                    f"{u.shape[0]} samples as ONE contiguous trajectory. If "
                    "the rows are independent snapshots or concatenated "
                    "trajectories, declare the count.",
                    stacklevel=2,
                )
                u = u[None]
        if "times" in f:
            times = jnp.asarray(f["times"][...])
            k, nt = u.shape[0], u.shape[1]
            if times.shape[0] == k * nt and times.shape[0] != nt:
                # flat times saved alongside a reshaped 2-D matrix: every
                # trajectory must share ONE time window (the loader keeps a
                # single [T] axis). Rows that are consecutive segments of
                # one long run would otherwise silently get trajectory 0's
                # times — wrong forcing phases and labels for a forced
                # equation.
                per_traj = np.asarray(times).reshape(k, nt)
                rel = per_traj - per_traj[:, :1]
                if not np.allclose(rel, rel[0], rtol=1e-6, atol=1e-8):
                    raise ValueError(
                        f"{path}: flat 'times' of length {k * nt} does not "
                        f"split into {k} trajectories with a shared time "
                        "window (rows have differing spacings); store times "
                        "as one [num_times] axis or fix num_trajectories"
                    )
                if not np.allclose(per_traj[:, 0], per_traj[0, 0]):
                    # segments of one long run: spacing matches but start
                    # times differ — only time DIFFERENCES enter training
                    # for unforced equations; forced labels need true t
                    warnings.warn(
                        f"{path}: trajectories have differing start times; "
                        "using trajectory 0's window for all (forced-"
                        "equation labels would be wrong for the rest)",
                        stacklevel=2,
                    )
                times = times[:nt]
            elif times.shape[0] != nt:
                raise ValueError(
                    f"{path}: 'times' has length {times.shape[0]}, expected "
                    f"{nt} (per-trajectory) or {k * nt} (flat)"
                )
        else:
            times = jnp.arange(u.shape[1], dtype=jnp.float32)
            synthetic = True
        forcing = None
        if "forcing" in f:
            forcing = ForcingParams(
                **{k: jnp.asarray(v[...]) for k, v in f["forcing"].items()}
            )
        import json as _json

        params = _json.loads(f.attrs.get("equation_params", "{}"))
        params.setdefault("period", float(f.attrs["period"]))
        equation = from_name(
            f.attrs["equation"],
            conservative=bool(f.attrs["conservative"]),
            **params,
        )
        grid = Grid(int(f.attrs["fine_size"]), float(f.attrs["period"]))
    return (
        Snapshots(u=u, times=times, forcing=forcing, synthetic_times=synthetic),
        equation,
        grid,
    )
