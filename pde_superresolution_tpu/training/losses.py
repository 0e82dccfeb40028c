"""Training losses: baseline-normalized multi-target errors + unrolled loss.

≈ pde_superresolution/model.py §model_loss / loss heads (unverified — see
SURVEY.md). The reference's scheme: each target's error is normalized by the
error of the fixed polynomial *baseline* scheme on the same data, so a loss
of 1.0 means "no better than the classic stencils" and the weights are
comparable across targets of wildly different scales (u_x vs u_xxxx vs u_t).

Targets:
  * space derivatives (one per derivative order the PDE needs),
  * the time derivative u_t through the equation of motion,
  * the integrated (unrolled) solution: roll the learned scheme forward K
    steps with the SAME RK4/scan integrator used at inference and compare to
    coarse-grained exact snapshots. (The reference's inner integrator is
    unknown [MED]; using the inference integrator is self-consistent.)

All normalization constants are computed once on the dataset and baked into
the jitted loss as static floats.
"""

from __future__ import annotations

import dataclasses
import typing

import jax
import jax.numpy as jnp
import numpy as np

from pde_superresolution_tpu import integrate
from pde_superresolution_tpu.models.stencil_net import StencilModel
from pde_superresolution_tpu.training.data import TrainingData


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Relative weights per target (≈ hparams *_weight names, unverified)."""

    space_derivatives: float = 1.0
    time_derivative: float = 1.0
    integrated_solution: float = 1.0


class LossNorms(typing.NamedTuple):
    """Static per-target normalization: the baseline scheme's MAE."""

    derivs: dict  # {order: float}
    time_deriv: float
    integrated: tuple  # per-unroll-step float


def _mae(pred, label):
    return jnp.mean(jnp.abs(pred - label))


def compute_loss_norms(
    model: StencilModel,
    data: TrainingData,
    unroll_steps: int,
    dt: float,
    substeps: int = 1,
    floor: float = 1e-7,
    max_samples: int = 1024,
) -> LossNorms:
    """Baseline-scheme MAEs on (a subset of) the dataset, as static floats."""
    n = min(data.num_samples, max_samples)
    u = data.inputs[:n]
    base_derivs = model.baseline_derivatives(u)
    d_norms = {
        d: max(float(_mae(base_derivs[d], data.deriv_labels[d][:n])), floor)
        for d in base_derivs
    }
    forcing = (
        jax.tree.map(lambda leaf: leaf[:n], data.forcing)
        if data.forcing is not None
        else None
    )
    ut_base = model.equation.time_derivative(
        u, base_derivs, model.grid, data.t[:n], forcing
    )
    t_norm = max(float(_mae(ut_base, data.time_deriv_label[:n])), floor)

    int_norms = []
    if unroll_steps > 0:
        # the normalizing baseline must be the MODEL's own zero-z scheme
        # (same stencil width): a narrower default baseline can be unstable
        # where the model's classic stencils are not (e.g. FD KdV at 4x),
        # which would poison the norms.
        def rhs(ut, t):
            return model.equation.time_derivative(
                ut, model.baseline_derivatives(ut), model.grid, t, forcing
            )

        cur, t = u, data.t[:n]
        dt_inner = dt / substeps
        for k in range(unroll_steps):
            for _ in range(substeps):
                cur = integrate.rk4_step(rhs, cur, t, dt_inner)
                t = t + dt_inner
            cur = jnp.nan_to_num(cur, nan=1e3, posinf=1e3, neginf=-1e3)
            int_norms.append(
                max(float(_mae(cur, data.rollout[:n, k])), floor)
            )
    return LossNorms(derivs=d_norms, time_deriv=t_norm, integrated=tuple(int_norms))


def compute_loss(
    model: StencilModel,
    params,
    batch: TrainingData,
    norms: LossNorms,
    weights: LossWeights,
    dt: float,
    unroll_steps: int,
    substeps: int = 1,
) -> tuple[jnp.ndarray, dict]:
    """Total weighted loss + per-target breakdown for logging. Jit-able."""
    u, t, forcing = batch.inputs, batch.t, batch.forcing
    derivs = model.derivatives(params, u)

    parts = {}
    loss = 0.0
    num_orders = len(derivs)
    for d, pred in derivs.items():
        part = _mae(pred, batch.deriv_labels[d]) / norms.derivs[d]
        parts[f"deriv_{d}"] = part
        loss = loss + weights.space_derivatives * part / num_orders

    ut = model.equation.time_derivative(u, derivs, model.grid, t, forcing)
    part = _mae(ut, batch.time_deriv_label) / norms.time_deriv
    parts["time_deriv"] = part
    loss = loss + weights.time_derivative * part

    if unroll_steps > 0 and weights.integrated_solution > 0:
        rhs = model.rhs_fn(params, forcing)
        dt_inner = dt / substeps
        # remat the step: K-deep RK4 unrolls through a conv net are the
        # memory hot spot; trading recompute for HBM is the TPU-native call.
        # substeps decouple the snapshot spacing from the coarse CFL limit:
        # comparing only every `substeps` inner RK4 steps keeps the rollout
        # inside the stable region regardless of how the data was sampled.
        step = jax.checkpoint(
            lambda ut_, t_: integrate.rk4_step(rhs, ut_, t_, dt_inner)
        )
        cur, tt = u, t
        int_loss = 0.0
        for k in range(unroll_steps):
            for _ in range(substeps):
                cur = step(cur, tt)
                tt = tt + dt_inner
            part = _mae(cur, batch.rollout[:, k]) / norms.integrated[k]
            parts[f"integrated_{k}"] = part
            int_loss = int_loss + part / unroll_steps
        parts["integrated"] = int_loss
        loss = loss + weights.integrated_solution * int_loss

    parts["total"] = loss
    return loss, parts
