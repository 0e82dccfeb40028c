"""Evaluation harness: exact vs baselines vs model, MAE and survival time.

≈ pde_superresolution/scripts/run_evaluation.py + integrate.py
§integrate_exact_baseline_and_model (unverified — see SURVEY.md). The
reference integrates matched initial conditions through every scheme and
writes an xarray Dataset (time, x) to netCDF; here the whole ensemble runs
batched on device and results are plain arrays + an HDF5 writer (xarray is
not available in this environment — SURVEY.md §7).

Survival ("valid") time criterion — the reference's exact rule is unknown
[MED]; we freeze an explicit, standard definition (configurable threshold):

    survival_time = first time the Pearson correlation over x between the
    scheme's solution and the coarse-grained exact solution drops below
    ``correlation_threshold`` (default 0.8); once dead, always dead.

This matches the common practice in the coarse-grained-PDE literature for
chaotic systems (KS) and degrades gracefully for Burgers/KdV.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import logging
import os
import tempfile
import typing
import warnings
from typing import Callable, Mapping, Optional

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from pde_superresolution_tpu import integrate
from pde_superresolution_tpu.equations import Equation, ForcingParams
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.ops import resample

logger = logging.getLogger(__name__)


class EvalResult(typing.NamedTuple):
    times: jnp.ndarray  # [T]
    exact: jnp.ndarray  # [batch, T, nx_coarse]
    trajectories: dict  # {scheme: [batch, T, nx_coarse]}
    mae: dict  # {scheme: [batch, T]}
    correlation: dict  # {scheme: [batch, T]}
    survival_time: dict  # {scheme: [batch]}


def pearson_correlation(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    a = a - a.mean(axis=axis, keepdims=True)
    b = b - b.mean(axis=axis, keepdims=True)
    num = (a * b).sum(axis=axis)
    den = jnp.sqrt((a**2).sum(axis=axis) * (b**2).sum(axis=axis))
    return num / jnp.maximum(den, 1e-12)


def survival_time_from_correlation(
    corr: jnp.ndarray, times: jnp.ndarray, threshold: float = 0.8
) -> jnp.ndarray:
    """First time corr drops below threshold (monotone: once dead, dead).

    corr: [..., T]; returns [...] (the last alive time; times[-1] if never
    dies, times[0] if dead on arrival).
    """
    alive = jnp.cumprod((corr >= threshold).astype(jnp.int32), axis=-1)
    n_alive = alive.sum(axis=-1)
    idx = jnp.clip(n_alive - 1, 0, times.shape[0] - 1)
    return times[idx]


def survival_time_from_mae(
    mae: jnp.ndarray,
    times: jnp.ndarray,
    threshold: float,
) -> jnp.ndarray:
    """Alternative validity criterion: first time the MAE exceeds
    ``threshold`` (monotone: once dead, always dead). The reference's exact
    rule is unknown (SURVEY.md); the correlation criterion is the default,
    this is provided for MAE-threshold analyses on saved EvalResults."""
    alive = jnp.cumprod((mae <= threshold).astype(jnp.int32), axis=-1)
    n_alive = alive.sum(axis=-1)
    idx = jnp.clip(n_alive - 1, 0, times.shape[0] - 1)
    return times[idx]


def default_reference_cache_dir() -> str:
    """The default on-disk location for cached exact references."""
    base = os.environ.get(
        "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache")
    )
    return os.path.join(base, "pde_superresolution_tpu", "exact_refs")


def _reference_cache_key(
    equation: Equation,
    fine_grid: Grid,
    key: jax.Array,
    num_samples: int,
    time_delta: float,
    num_times: int,
    warmup_time: float,
    ic_scale: float,
    exact_dt_cap: Optional[float],
) -> tuple[str, str]:
    """(hash, canonical-JSON) identifying one exact fine solve EXACTLY.

    Every input that changes a single bit of the fine trajectory is in the
    key: the full equation dataclass (eta, forcing/IC bands, ...), the fine
    grid, the raw PRNG key bits (IC + forcing draws), the sampling protocol
    and the integrator step cap. The coarse-graining factor is deliberately
    NOT in the key — all resample factors share one fine solve, which is
    where the evaluation pipeline's time goes (641 s of a ~700 s KS run).
    """
    from pde_superresolution_tpu.equations import params_dict

    canonical = json.dumps(
        {
            "equation": equation.name,
            "equation_params": dict(sorted(params_dict(equation).items())),
            # the family decides whether evaluate() coarse-grains by block
            # mean or subsample, but the FINE solve is family-agnostic
            # (SpectralDifferentiator always uses the direct form). Keyed
            # anyway: the IC/forcing draw code paths could diverge.
            "conservative": bool(equation.conservative),
            "fine_size": int(fine_grid.size),
            "period": float(fine_grid.period),
            "key_data": np.asarray(jax.random.key_data(key)).tolist(),
            "num_samples": int(num_samples),
            "time_delta": float(time_delta),
            "num_times": int(num_times),
            "warmup_time": float(warmup_time),
            "ic_scale": float(ic_scale),
            "exact_dt_cap": None if exact_dt_cap is None else float(exact_dt_cap),
            # the ACTUAL compute dtype: a jax_enable_x64 process (the fp64
            # reference controls) solves in float64 — hard-coding "float32"
            # here would let an x64 run poison the cache for fp32 readers
            "dtype": (
                "float64" if jax.config.jax_enable_x64 else "float32"
            ),
            # bumped when exact-solver numerics change, so stale cached
            # references invalidate instead of being silently served
            "solver_version": integrate.EXACT_SOLVER_VERSION,
            "format": 1,
        },
        sort_keys=True,
        default=list,
    )
    return hashlib.sha256(canonical.encode()).hexdigest()[:20], canonical


def _cached_exact_solve(
    cache_dir: str,
    equation: Equation,
    fine_grid: Grid,
    key: jax.Array,
    num_samples: int,
    time_delta: float,
    num_times: int,
    warmup_time: float,
    ic_scale: float,
    exact_dt_cap: Optional[float],
) -> tuple[jnp.ndarray, jnp.ndarray, Optional[ForcingParams]]:
    """Exact fine solve through a content-keyed on-disk cache.

    Returns (times, traj_fine, forcing) bit-identical to the uncached path
    (the stored arrays ARE the computed ones; the forcing draw is stored and
    reloaded so the cache is self-contained). Concurrent writers are safe:
    the store is written to a temp file and atomically renamed.
    """
    h, canonical = _reference_cache_key(
        equation, fine_grid, key, num_samples, time_delta, num_times,
        warmup_time, ic_scale, exact_dt_cap,
    )
    path = os.path.join(cache_dir, f"ref_{h}.h5")
    if os.path.exists(path):
        with h5py.File(path, "r") as f:
            stored = f.attrs["canonical"]
            if stored != canonical:  # sha256-20 collision: effectively never
                raise RuntimeError(
                    f"reference cache collision at {path}:\n"
                    f"stored   {stored}\nrequested {canonical}"
                )
            times = jnp.asarray(f["times"][...])
            traj_fine = jnp.asarray(f["traj_fine"][...])
            forcing = None
            if "forcing" in f:
                forcing = ForcingParams(
                    **{k: jnp.asarray(v[...]) for k, v in f["forcing"].items()}
                )
        logger.info("exact-reference cache HIT: %s", path)
        return times, traj_fine, forcing

    logger.info("exact-reference cache miss: computing %s", path)
    k_ic, k_f = jax.random.split(key)
    u0 = ic_scale * equation.initial_conditions(k_ic, fine_grid, (num_samples,))
    forcing = equation.sample_forcing(k_f, (num_samples,))
    times, traj_fine = integrate.exact_solve_sampled(
        equation, fine_grid, u0, time_delta, num_times,
        warmup_time=warmup_time, forcing=forcing, dt_cap=exact_dt_cap,
    )
    os.makedirs(cache_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".h5.tmp")
    os.close(fd)
    try:
        with h5py.File(tmp, "w") as f:
            f.attrs["canonical"] = canonical
            f.create_dataset("times", data=np.asarray(times))
            f.create_dataset("traj_fine", data=np.asarray(traj_fine))
            if forcing is not None:
                g = f.create_group("forcing")
                for name, arr in forcing._asdict().items():
                    g.create_dataset(name, data=np.asarray(arr))
        os.replace(tmp, path)
        logger.info(
            "exact-reference cache write: %s (%.1f MB; the cache has no "
            "eviction — delete old ref_*.h5 files or the directory to "
            "reclaim space)",
            path,
            os.path.getsize(path) / 1e6,
        )
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return times, traj_fine, forcing


def evaluate(
    equation: Equation,
    fine_grid: Grid,
    resample_factor: int,
    schemes: Mapping[str, Callable[[Optional[ForcingParams]], integrate.RHSFn]],
    key: jax.Array,
    num_samples: int,
    time_max: float,
    time_delta: float,
    warmup_time: float = 0.0,
    correlation_threshold: float = 0.8,
    coarse_dt: Optional[float] = None,
    exact_dt_cap: Optional[float] = None,
    ic_scale: float = 1.0,
    reference_cache_dir: Optional[str] = None,
) -> EvalResult:
    """Integrate matched ICs through exact + every scheme; compute metrics.

    Args:
      schemes: name -> (forcing -> rhs_fn) factories, e.g.
        ``{"baseline": lambda f: PolynomialDifferentiator(...).rhs_fn(f),
           "model": lambda f: model.rhs_fn(params, f)}``. NOTE: ONE
        coarse-graining — chosen by ``equation.conservative`` (block mean if
        conservative, subsample otherwise) — produces the matched initial
        conditions and the exact reference for EVERY scheme; mixing
        conservative and non-conservative schemes in one call compares the
        odd one out against the other family's coarse-graining (a half-cell
        interpretation mismatch). Run two evaluations to compare across
        families fairly. Enforced at runtime: rhs closures built by the
        library carry a ``.conservative`` family tag and a mismatch raises
        a UserWarning.
      coarse_dt: coarse integrator step; defaults to an integer subdivision
        of ``time_delta`` near the equation's stable step.
      reference_cache_dir: if set, the exact fine solve is served from a
        content-keyed on-disk cache (key = equation params + grid + PRNG key
        bits + sampling protocol; see ``_reference_cache_key``). The fine
        solve dominates evaluation wall time (~90% for KS protocols) and is
        deterministic, so repeated evaluations — sweep rows at different
        resample factors, re-evaluations of new checkpoints under one
        protocol — reuse one solve. Results are bit-identical to the
        uncached path.
    """
    coarse = fine_grid.resample(
        resample_factor, conservative=equation.conservative
    )
    num_times = int(round(time_max / time_delta)) + 1

    if reference_cache_dir:
        # exact fine solve (same solver as training-data generation),
        # through the content-keyed cache
        times, traj_fine, forcing = _cached_exact_solve(
            reference_cache_dir, equation, fine_grid, key, num_samples,
            time_delta, num_times, warmup_time, ic_scale, exact_dt_cap,
        )
    else:
        k_ic, k_f = jax.random.split(key)
        u0 = ic_scale * equation.initial_conditions(
            k_ic, fine_grid, (num_samples,)
        )
        forcing = equation.sample_forcing(k_f, (num_samples,))

        # exact fine solve (the SAME solver as training-data generation)
        times, traj_fine = integrate.exact_solve_sampled(
            equation,
            fine_grid,
            u0,
            time_delta,
            num_times,
            warmup_time=warmup_time,
            forcing=forcing,
            dt_cap=exact_dt_cap,
        )  # [T, batch, nx_fine]; traj_fine[0] is the (possibly warmed) IC
    t0 = float(times[0])

    if equation.conservative:
        coarsen = lambda f: resample.resample_mean(f, resample_factor)
    else:
        coarsen = lambda f: resample.subsample(f, resample_factor)
    exact = jnp.swapaxes(coarsen(traj_fine), 0, 1)  # [batch, T, nx_c]
    u0_coarse = exact[:, 0]

    # coarse integrations
    if coarse_dt is None:
        stable = equation.stable_time_step(coarse, u_scale=3.0)
        inner = max(1, int(np.ceil(time_delta / stable)))
    else:
        # ceil, not round: when coarse_dt does not divide time_delta the
        # requested step is impossible and FINER is the only safe side —
        # rounding down would integrate beyond a stability bound passed
        # here (e.g. KdV-16x: 0.05/0.0222 = 2.25 would round to 2 inner
        # steps, dt 0.025 > the bound)
        inner = max(1, int(np.ceil(time_delta / coarse_dt - 1e-9)))
    dt_coarse = time_delta / inner

    trajectories, mae, corr_d, surv = {}, {}, {}, {}
    for name, factory in schemes.items():
        rhs = factory(forcing)
        # family check (the docstring's coarse-graining hazard, enforced at
        # runtime): rhs_fn closures carry a .conservative tag; a scheme of
        # the other family is being compared against this family's
        # coarse-graining — a half-cell interpretation mismatch. DEFAULT-
        # DENY: an untagged closure cannot be verified, so it warns too
        # (every library-built rhs carries the tag; tag user closures with
        # ``rhs.conservative = True/False`` to assert the family).
        family = getattr(rhs, "conservative", None)
        if family is None:
            warnings.warn(
                f"scheme {name!r} carries no .conservative family tag, so "
                "its coarse-graining family (cell-average vs point-value) "
                "cannot be verified against this evaluation's "
                f"{'conservative' if equation.conservative else 'non-conservative'}"
                " coarse-graining — if the families differ, its initial"
                " conditions and exact reference are half a cell off. Set"
                " rhs.conservative = True/False on the closure to assert"
                " the family and silence this warning.",
                stacklevel=2,
            )
        elif family != equation.conservative:
            warnings.warn(
                f"scheme {name!r} is a "
                f"{'conservative (cell-average)' if family else 'non-conservative (point-value)'}"
                f" scheme but the evaluation coarse-graining follows the "
                f"{'conservative' if equation.conservative else 'non-conservative'}"
                " equation — its initial conditions and exact reference are"
                " half a cell off. Run a separate evaluation for this"
                " scheme's family.",
                stacklevel=2,
            )
        _, traj = integrate.integrate(
            rhs,
            u0_coarse,
            dt_coarse,
            (num_times - 1) * inner,
            save_every=inner,
            t0=t0,
        )
        traj = jnp.swapaxes(traj, 0, 1)  # [batch, T, nx_c]
        trajectories[name] = traj
        mae[name] = jnp.abs(traj - exact).mean(axis=-1)
        c = pearson_correlation(traj, exact)
        c = jnp.where(jnp.isfinite(c), c, -1.0)  # NaN blowup = dead
        corr_d[name] = c
        # survival relative to the evaluation start (warmup excluded)
        surv[name] = survival_time_from_correlation(
            c, times - times[0], correlation_threshold
        )

    return EvalResult(
        times=times,
        exact=exact,
        trajectories=trajectories,
        mae=mae,
        correlation=corr_d,
        survival_time=surv,
    )


def save_eval_h5(path: str, result: EvalResult) -> None:
    """Persist an EvalResult (HDF5 stands in for the reference's netCDF)."""
    with h5py.File(path, "w") as f:
        f.create_dataset("times", data=np.asarray(result.times))
        f.create_dataset("exact", data=np.asarray(result.exact))
        for group_name in ("trajectories", "mae", "correlation", "survival_time"):
            g = f.create_group(group_name)
            for scheme, arr in getattr(result, group_name).items():
                g.create_dataset(scheme, data=np.asarray(arr))


def load_eval_h5(path: str) -> EvalResult:
    with h5py.File(path, "r") as f:
        read_group = lambda name: {
            k: jnp.asarray(v[...]) for k, v in f[name].items()
        }
        return EvalResult(
            times=jnp.asarray(f["times"][...]),
            exact=jnp.asarray(f["exact"][...]),
            trajectories=read_group("trajectories"),
            mae=read_group("mae"),
            correlation=read_group("correlation"),
            survival_time=read_group("survival_time"),
        )
