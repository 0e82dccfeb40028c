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
import types
import typing

import jax
import jax.numpy as jnp
import numpy as np

from pde_superresolution_tpu import integrate
from pde_superresolution_tpu.models.stencil_net import StencilModel
from pde_superresolution_tpu.training.data import TrainingData


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Relative weights per target (≈ hparams *_weight names, unverified).

    ``absolute_error``/``relative_error`` mix two error forms per target
    (≈ the reference's absolute/relative error hparams, names [MED]):

      * absolute: MAE normalized by the baseline scheme's dataset-level MAE
        (the original form; baseline ≡ 1.0 per target);
      * relative: POINTWISE |error| divided by the baseline scheme's
        |error| at the same point, floored at the ``error_floor_quantile``
        quantile of the baseline error distribution (static, from the
        training set). This emphasizes points where the baseline is already
        accurate — smooth regions — instead of letting shock-dominated
        points swamp the mean. At zero params (model ≡ baseline) it is
        ≈ 1.0 as well, so the two forms mix on a common scale.

    Defaults (1.0 / 0.0) reproduce the absolute-only loss exactly.
    """

    space_derivatives: float = 1.0
    time_derivative: float = 1.0
    integrated_solution: float = 1.0
    absolute_error: float = 1.0
    relative_error: float = 0.0
    error_floor_quantile: float = 0.1


ROLLOUT_CLIP = 100.0  # bound on |u| during unrolled training rollouts


def rollout_states(
    rhs,
    u: jnp.ndarray,
    t: jnp.ndarray,
    dt: float,
    substeps: int,
    unroll_steps: int,
    clip: float = ROLLOUT_CLIP,
) -> jnp.ndarray:
    """Advance ``u`` by ``unroll_steps`` snapshot intervals of ``substeps``
    inner RK4 steps each; return the state at each snapshot [K, ...].

    States are clamped to ``[-clip, clip]`` after every inner step: a
    diverging member then contributes a large-but-finite loss (with live
    gradients from its pre-divergence dynamics) instead of NaN-ing the whole
    batch — without this, one unstable rollout freezes training forever
    (every update gets skipped by zero_nans; observed on FD KdV).

    The clamp alone is not enough: one inner RK4 step can overshoot straight
    to inf/NaN (u_xxxx evaluated at |u|=clip), and ``jnp.clip`` PROPAGATES
    NaN — so non-finite values are first mapped onto the clip bound
    (sign-preserving for ±inf). Without this the end-of-training eval loss
    reads NaN at hard corners even when the integration protocol itself is
    stable (3/16 rows of the round-4 KdV-16x seed sweep). For rollouts that
    stay finite the guard is the identity, so stable recipes are unchanged.

    Structured as nested lax.scan with a rematerialized inner step: O(1)
    graph size in the step count (a 48-step Python unroll costs ~6 min of
    XLA compile; this compiles in seconds) and O(K) memory.
    """
    dt_inner = dt / substeps

    @jax.checkpoint
    def inner(carry, _):
        u, t = carry
        u = integrate.rk4_step(rhs, u, t, dt_inner)
        u = jnp.nan_to_num(u, nan=clip, posinf=clip, neginf=-clip)
        u = jnp.clip(u, -clip, clip)
        return (u, t + dt_inner), None

    def outer(carry, _):
        carry, _ = jax.lax.scan(inner, carry, None, length=substeps)
        return carry, carry[0]

    (_, _), states = jax.lax.scan(outer, (u, t), None, length=unroll_steps)
    return states


class LossNorms(typing.NamedTuple):
    """Static per-target normalization: the baseline scheme's MAE, plus
    per-target floors (the ``error_floor_quantile`` quantile of the
    baseline's pointwise |error|) for the relative-error form."""

    derivs: typing.Mapping  # {order: float}
    time_deriv: float
    integrated: tuple  # per-unroll-step float
    # immutable empty-mapping default: a literal ``{}`` here would be ONE
    # shared dict across every LossNorms instance — a mutation foot-gun
    deriv_floors: typing.Mapping = types.MappingProxyType({})  # {order: float}
    time_floor: float = 1e-7
    integrated_floors: tuple = ()


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
    floor_quantile: float = 0.1,
) -> LossNorms:
    """Baseline-scheme MAEs on (a subset of) the dataset, as static floats.

    Also computes the per-target relative-error floors: the
    ``floor_quantile`` quantile of the baseline's pointwise |error| (so the
    relative form cannot blow up where the baseline is exact).
    """
    n = min(data.num_samples, max_samples)
    u = data.inputs[:n]

    def quantile_floor(err):
        return max(float(np.quantile(np.abs(np.asarray(err)), floor_quantile)), floor)

    base_derivs = model.baseline_derivatives(u)
    d_norms, d_floors = {}, {}
    for d in base_derivs:
        err = base_derivs[d] - data.deriv_labels[d][:n]
        d_norms[d] = max(float(jnp.mean(jnp.abs(err))), floor)
        d_floors[d] = quantile_floor(err)
    forcing = (
        jax.tree.map(lambda leaf: leaf[:n], data.forcing)
        if data.forcing is not None
        else None
    )
    ut_base = model.equation.time_derivative(
        u, base_derivs, model.grid, data.t[:n], forcing
    )
    t_err = ut_base - data.time_deriv_label[:n]
    t_norm = max(float(jnp.mean(jnp.abs(t_err))), floor)
    t_floor = quantile_floor(t_err)

    int_norms, int_floors = [], []
    if unroll_steps > 0:
        # the normalizing baseline must be the MODEL's own zero-z scheme
        # (same stencil width): a narrower default baseline can be unstable
        # where the model's classic stencils are not (e.g. FD KdV at 4x),
        # which would poison the norms.
        def rhs(ut, t):
            return model.equation.time_derivative(
                ut, model.baseline_derivatives(ut), model.grid, t, forcing
            )

        states = rollout_states(rhs, u, data.t[:n], dt, substeps, unroll_steps)
        for k in range(unroll_steps):
            cur = jnp.nan_to_num(states[k], nan=1e3, posinf=1e3, neginf=-1e3)
            err = cur - data.rollout[:n, k]
            int_norms.append(max(float(jnp.mean(jnp.abs(err))), floor))
            int_floors.append(quantile_floor(err))
    return LossNorms(
        derivs=d_norms,
        time_deriv=t_norm,
        integrated=tuple(int_norms),
        deriv_floors=d_floors,
        time_floor=t_floor,
        integrated_floors=tuple(int_floors),
    )


def truncate_norms(norms: LossNorms, unroll_steps: int) -> LossNorms:
    """Restrict full-width norms to a shorter unroll.

    Norms for a shorter unroll are an exact prefix of a longer one's: the
    derivative/time-derivative norms do not depend on the rollout length,
    and the baseline rollout is deterministic, so ``integrated[k]`` (and
    its floor) is identical whether computed at width k or sliced from a
    wider computation (verified bit-exact in
    tests/test_training.py::TestUnrollCurriculum). The curriculum training
    loops use this to compute norms ONCE at the final width instead of
    re-rolling the baseline for every phase (a 2+4+8+16-step cumulative
    rollout where 16 suffices — and the cost repeats on every resume).
    """
    if unroll_steps > len(norms.integrated):
        raise ValueError(
            f"cannot truncate norms of width {len(norms.integrated)} to "
            f"{unroll_steps}"
        )
    return norms._replace(
        integrated=norms.integrated[:unroll_steps],
        integrated_floors=norms.integrated_floors[:unroll_steps],
    )


def compute_loss(
    model: StencilModel,
    params,
    batch: TrainingData,
    norms: LossNorms,
    weights: LossWeights,
    dt: float,
    unroll_steps: int,
    substeps: int = 1,
    use_pallas: bool = False,
    rollout_noise: float = 0.0,
    noise_key: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict]:
    """Total weighted loss + per-target breakdown for logging. Jit-able.

    Each target's part mixes the absolute form (MAE / dataset baseline MAE)
    and the relative form (pointwise |err| / floored baseline |err|) with
    the static ``weights.absolute_error`` / ``weights.relative_error``; the
    baseline's pointwise errors are recomputed in-graph per batch (cheap
    fixed-stencil convolutions; for the integrated target, a second
    baseline rollout — only traced when relative_error > 0).
    """
    u, t, forcing = batch.inputs, batch.t, batch.forcing
    derivs = model.derivatives(params, u)

    w_abs, w_rel = weights.absolute_error, weights.relative_error
    use_rel = w_rel > 0  # static: weights are baked into the jitted loss
    base_derivs = model.baseline_derivatives(u) if use_rel else None

    def mix(pred, label, norm, base_pred, rel_floor):
        part = w_abs * (_mae(pred, label) / norm)
        if use_rel:
            scale = jnp.maximum(jnp.abs(base_pred - label), rel_floor)
            part = part + w_rel * jnp.mean(jnp.abs(pred - label) / scale)
        return part

    parts = {}
    loss = 0.0
    num_orders = len(derivs)
    for d, pred in derivs.items():
        part = mix(
            pred,
            batch.deriv_labels[d],
            norms.derivs[d],
            base_derivs[d] if use_rel else None,
            norms.deriv_floors.get(d, 1e-7) if use_rel else None,
        )
        parts[f"deriv_{d}"] = part
        loss = loss + weights.space_derivatives * part / num_orders

    ut = model.equation.time_derivative(u, derivs, model.grid, t, forcing)
    ut_base = (
        model.equation.time_derivative(u, base_derivs, model.grid, t, forcing)
        if use_rel
        else None
    )
    part = mix(ut, batch.time_deriv_label, norms.time_deriv, ut_base, norms.time_floor)
    parts["time_deriv"] = part
    loss = loss + weights.time_derivative * part

    if unroll_steps > 0 and weights.integrated_solution > 0:
        # This rollout sits under jax.grad. Since round 3 the fused Pallas
        # RHS carries a custom_vjp (backward = the XLA twin's vjp,
        # pallas_kernels.make_fused_rhs), so use_pallas=True is SAFE here
        # — but measured on v5e it is not faster (flagship recipe,
        # unroll-16/stencil-8: 17.8 vs 16.4 ms/step at batch 128, 67.7 vs
        # 69.5 at batch 512 — the kernel fuses the part of the RHS that is
        # already nearly free next to the conv tower, and per-stage launch
        # overhead eats the gain; a whole-chunk fused forward measured
        # WORSE, 94.5 vs 71.0 ms, and loses the per-inner-step divergence
        # clip). The XLA rollout therefore stays the default training
        # path; the knob exists for future shapes where the balance flips.
        rhs = model.rhs_fn(params, forcing, use_pallas=use_pallas)
        # Rollout-noise injection (train-time): perturb the rollout's
        # INITIAL state with Gaussian noise of std rollout_noise*rms(u)
        # per sample, keeping the clean snapshots as targets — the scheme
        # learns to contract accumulated error back onto the true
        # trajectory instead of only propagating clean states. The
        # derivative/time-derivative targets above stay clean (they are
        # pointwise consistency constraints, not stability ones).
        u0 = u
        if rollout_noise > 0.0 and noise_key is not None:  # static branch
            rms = jnp.sqrt(jnp.mean(u * u, axis=-1, keepdims=True))
            u0 = u + rollout_noise * rms * jax.random.normal(
                noise_key, u.shape, u.dtype
            )
        # substeps decouple the snapshot spacing from the coarse CFL limit:
        # comparisons happen only every `substeps` inner RK4 steps, so the
        # rollout stays inside the stable region regardless of how the data
        # was sampled. See rollout_states for the clip/remat story.
        states = rollout_states(rhs, u0, t, dt, substeps, unroll_steps)
        # diagnostic (never part of the loss): fraction of batch members
        # whose rollout stayed strictly inside the divergence clip — a
        # diverged member is pinned at ±ROLLOUT_CLIP by rollout_states, so
        # "< clip everywhere" means the rollout was genuinely finite. Logged
        # as train_/eval_rollout_finite_frac, making a clipped eval loss
        # interpretable (loss finite but frac < 1 = some members diverged).
        parts["rollout_finite_frac"] = jnp.mean(
            jnp.all(jnp.abs(states) < ROLLOUT_CLIP, axis=(0, -1)).astype(
                jnp.float32
            )
        )
        base_states = None
        if use_rel:

            def base_rhs(ut_, t_):
                return model.equation.time_derivative(
                    ut_, model.baseline_derivatives(ut_), model.grid, t_, forcing
                )

            # the relative form's normalizer starts from the SAME perturbed
            # state: it measures how much better the model recovers from
            # the identical perturbation, keeping the comparison fair
            base_states = rollout_states(
                base_rhs, u0, t, dt, substeps, unroll_steps
            )
        int_loss = 0.0
        for k in range(unroll_steps):
            part = mix(
                states[k],
                batch.rollout[:, k],
                norms.integrated[k],
                base_states[k] if use_rel else None,
                (
                    norms.integrated_floors[k]
                    if use_rel and k < len(norms.integrated_floors)
                    else 1e-7
                ),
            )
            parts[f"integrated_{k}"] = part
            int_loss = int_loss + part / unroll_steps
        parts["integrated"] = int_loss
        loss = loss + weights.integrated_solution * int_loss

    parts["total"] = loss
    return loss, parts
