"""Profile the flagship TRAINING step (VERDICT r3 weak #3 / next #3).

Where do the milliseconds of one unroll-16 / stencil-8 / batch-512 KS-8x
train step go? This probe builds the exact step `loop.make_steps` builds
(same losses, norms, optimizer) and times it in pieces:

  * full          value_and_grad + optax update (the real train step)
  * gradloss      value_and_grad only (full - this = optimizer cost)
  * fwd           loss forward only
  * fwd_rollout   the unrolled-integration target alone (no deriv heads)
  * fwd_heads     derivative + time-derivative targets alone (unroll 0)
  * draw_device / draw_host   batch sampling from a TrajectoryData
    (device-resident jitted gather vs host-staged numpy gather + transfer)
  * step+draw loop at both dataset placements (the end-to-end step rate)

plus ablation variants:
  * substeps      the inner-RK4 subdivision ladder (23 = the CFL auto
    value at time_delta=0.1; fewer substeps = proportionally fewer conv
    evals IF the rollout stays stable)
  * bf16 tower    conv tower activations cast to bfloat16 inside the
    rollout (matmuls already run bf16 on the MXU by default; this halves
    activation HBM traffic and the non-matmul VPU work)

Timing rule (DECISIONS.md #15 round-4): every sample forces a host fetch
of a scalar pulled from the result, so axon's early-return
block_until_ready cannot fake the numbers.

Usage:  python scripts_dev/bench_train_step.py [--batch=512] [--samples=5]
Writes: artifacts/r4_train_step_profile.json
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pde_superresolution_tpu import equations
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.models import ModelConfig, StencilModel
from pde_superresolution_tpu.training import config as config_lib
from pde_superresolution_tpu.training import data as data_lib
from pde_superresolution_tpu.training import loop as loop_lib
from pde_superresolution_tpu.training import losses as loss_lib

UNROLL = 16
TIME_DELTA = 0.1


def parse_flag(name, default):
    for a in sys.argv[1:]:
        if a.startswith(f"--{name}="):
            return int(a.split("=", 1)[1])
    return default


def timeit(fn, *args, samples=5, fetch=None):
    """Median ms of fn(*args), forcing a scalar host fetch per sample."""
    out = fn(*args)
    fetch = fetch or (lambda o: jax.tree.leaves(o)[0].ravel()[0])
    float(fetch(out))  # compile + warm
    ts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        out = fn(*args)
        float(fetch(out))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)), [round(t, 1) for t in ts]


def main():
    batch = parse_flag("batch", 512)
    samples = parse_flag("samples", 5)
    traj = parse_flag("traj", 512)

    cfg = config_lib.parse_hparams(
        "equation=ks,conservative=true,resample_factor=8,fine_size=1024,"
        f"num_times=64,time_delta={TIME_DELTA},warmup_time=44,"
        f"stencil_size=8,num_time_steps={UNROLL},batch_size={batch},"
        "learning_rates=1e-3,learning_stops=2000"
    )
    eq = equations.from_name(cfg.equation, conservative=cfg.conservative)
    fine = Grid(cfg.fine_size, eq.period)
    coarse = fine.resample(cfg.resample_factor, conservative=True)
    model = StencilModel(eq, coarse, cfg.model)
    params = model.init_params(jax.random.PRNGKey(0))

    stable = eq.stable_time_step(coarse, u_scale=3.0)
    auto_substeps = max(1, int(np.ceil(TIME_DELTA / stable)))
    print(f"stable dt {stable:.5f} -> auto substeps {auto_substeps}",
          file=sys.stderr)

    datasets = {}
    for host in (False, True):
        datasets["host" if host else "device"] = data_lib.build_trajectory_data(
            eq, fine, jax.random.PRNGKey(cfg.data_seed),
            num_trajectories=traj, num_times=cfg.num_times,
            time_delta=TIME_DELTA, resample_factor=cfg.resample_factor,
            unroll_steps=UNROLL, warmup_time=cfg.warmup_time,
            host_resident=host,
        )

    def make_draw(data):
        sample = functools.partial(
            data_lib.sample_training_batch, unroll_steps=UNROLL
        )
        if not data.host_resident:
            sample = jax.jit(sample)
        as_idx = np.asarray if data.host_resident else jnp.asarray

        def draw(step):
            rng = np.random.RandomState(step)
            ti = as_idx(rng.randint(0, traj, size=batch))
            si = as_idx(rng.randint(0, data.usable_times, size=batch))
            return sample(data, ti, si)

        return draw

    draw_dev = make_draw(datasets["device"])
    norm_batch = draw_dev(12345)
    tx = loop_lib.make_optimizer(cfg)
    opt_state = tx.init(params)

    results = {
        "config": {
            "batch": batch, "unroll": UNROLL, "substeps": auto_substeps,
            "nx": coarse.size, "stencil": cfg.model.stencil_size,
            "filters": cfg.model.filters, "samples": samples,
        }
    }

    def build_steps(substeps, unroll=UNROLL, weights=None):
        norms = loss_lib.compute_loss_norms(
            model, norm_batch, unroll, TIME_DELTA, substeps,
            floor_quantile=cfg.loss_weights.error_floor_quantile,
        )
        loss_fn = functools.partial(
            loss_lib.compute_loss, model, norms=norms,
            weights=weights or cfg.loss_weights, dt=TIME_DELTA,
            unroll_steps=unroll, substeps=substeps,
        )

        @jax.jit
        def full(params, opt_state, b):
            (_, parts), grads = jax.value_and_grad(
                lambda p: loss_fn(p, b), has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, parts

        @jax.jit
        def gradloss(params, b):
            return jax.value_and_grad(
                lambda p: loss_fn(p, b)[0]
            )(params)

        @jax.jit
        def fwd(params, b):
            return loss_fn(params, b)[0]

        return full, gradloss, fwd

    b = draw_dev(0)

    # --- the real step + its decomposition at auto substeps ----------------
    full, gradloss, fwd = build_steps(auto_substeps)
    fetch_p = lambda o: jax.tree.leaves(o[0])[0].ravel()[0]
    ms, raw = timeit(full, params, opt_state, b, samples=samples,
                     fetch=fetch_p)
    results["full_ms"] = {"median": round(ms, 1), "samples": raw}
    ms_g, raw_g = timeit(gradloss, params, b, samples=samples,
                         fetch=lambda o: o[0])
    results["gradloss_ms"] = {"median": round(ms_g, 1), "samples": raw_g}
    ms_f, raw_f = timeit(fwd, params, b, samples=samples,
                         fetch=lambda o: o)
    results["fwd_ms"] = {"median": round(ms_f, 1), "samples": raw_f}

    import dataclasses

    w = cfg.loss_weights
    only_rollout = dataclasses.replace(
        w, space_derivatives=0.0, time_derivative=0.0
    )
    only_heads = dataclasses.replace(w, integrated_solution=0.0)
    _, gl_roll, fwd_roll = build_steps(auto_substeps, weights=only_rollout)
    _, gl_heads, fwd_heads = build_steps(auto_substeps, weights=only_heads)
    ms, raw = timeit(fwd_roll, params, b, samples=samples, fetch=lambda o: o)
    results["fwd_rollout_ms"] = {"median": round(ms, 1), "samples": raw}
    ms, raw = timeit(gl_roll, params, b, samples=samples, fetch=lambda o: o[0])
    results["gradloss_rollout_ms"] = {"median": round(ms, 1), "samples": raw}
    ms, raw = timeit(fwd_heads, params, b, samples=samples, fetch=lambda o: o)
    results["fwd_heads_ms"] = {"median": round(ms, 1), "samples": raw}
    ms, raw = timeit(gl_heads, params, b, samples=samples, fetch=lambda o: o[0])
    results["gradloss_heads_ms"] = {"median": round(ms, 1), "samples": raw}

    # --- substeps ladder (full step) ---------------------------------------
    results["substeps_ladder"] = {}
    ladder = () if parse_flag("skip_ladder", 0) else (auto_substeps, 16, 12, 8, 1)
    for s in sorted(set(ladder)):
        f_s, _, _ = build_steps(s)
        ms, raw = timeit(f_s, params, opt_state, b, samples=samples,
                         fetch=fetch_p)
        results["substeps_ladder"][str(s)] = {
            "median_ms": round(ms, 1), "samples": raw,
        }
        print(f"substeps {s}: {ms:.1f} ms", file=sys.stderr)

    # --- bf16 tower activations (ModelConfig.tower_dtype) ------------------
    import dataclasses as _dc

    model_bf = StencilModel(
        eq, coarse, _dc.replace(cfg.model, tower_dtype="bfloat16")
    )
    saved_model = model
    try:
        # build_steps closes over main's `model` variable: rebinding it
        # here makes the next build_steps call use the bf16-tower model
        model = model_bf
        f_bf, _, fwd_bf = build_steps(auto_substeps)
        ms, raw = timeit(f_bf, params, opt_state, b, samples=samples,
                         fetch=fetch_p)
        results["full_bf16_tower_ms"] = {"median": round(ms, 1), "samples": raw}
        ms_fb, _ = timeit(fwd_bf, params, b, samples=samples,
                          fetch=lambda o: o)
        results["fwd_bf16_tower_ms"] = {"median": round(ms_fb, 1)}
        print(f"bf16 tower: full {results['full_bf16_tower_ms']['median']} ms"
              f" (f32 {results['full_ms']['median']}), fwd {ms_fb:.1f}",
              file=sys.stderr)
    finally:
        model = saved_model

    # --- draw + end-to-end step rate at both placements --------------------
    for name, data in datasets.items():
        draw = make_draw(data)
        ms, raw = timeit(
            lambda step: draw(step), 7,
            samples=samples,
            fetch=lambda o: np.asarray(o.inputs).ravel()[0],
        )
        results[f"draw_{name}_ms"] = {"median": round(ms, 1), "samples": raw}

        # end-to-end: draw a fresh batch + full step, like the train loop
        p, s = params, opt_state
        full(p, s, draw(0))  # warm
        ts = []
        for i in range(samples):
            t0 = time.perf_counter()
            p2, s2, parts = full(p, s, draw(i + 1))
            float(jax.tree.leaves(p2)[0].ravel()[0])
            ts.append((time.perf_counter() - t0) * 1e3)
        results[f"step_with_draw_{name}_ms"] = {
            "median": round(float(np.median(ts)), 1),
            "samples": [round(t, 1) for t in ts],
        }
        print(f"{name}: draw {results[f'draw_{name}_ms']['median']} ms, "
              f"step+draw {results[f'step_with_draw_{name}_ms']['median']} ms",
              file=sys.stderr)

    out = "artifacts/r4_train_step_profile.json"
    if parse_flag("skip_ladder", 0):  # partial run: don't clobber the full one
        out = "artifacts/r4_train_step_profile_partial.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
