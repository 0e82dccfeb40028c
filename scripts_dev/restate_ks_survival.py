"""Restate KS survival/MAE against the fp64 reference (round-4 item #1b).

The fp64 control (scripts_dev/fp64_reference_control.py) showed the KS fp32
exact reference decorrelates (<0.8) from its fp64 twin for 5/32 ensemble
members before the horizon-50 mark (earliest t~21), from intrinsic fp32
rounding amplified by the chaos (identical on CPU and TPU). This script
measures whether that tail MOVES the quoted survival/MAE numbers: each
flagship KS checkpoint's coarse integration (the production path, same ICs,
same dt selection as evaluate()) is scored twice — against the fp32
reference (production metrology) and against the fp64 reference.

Run on the TPU (one process):
    python scripts_dev/restate_ks_survival.py
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from pde_superresolution_tpu import evaluate as eval_lib
from pde_superresolution_tpu import integrate
from pde_superresolution_tpu.training import loop as loop_lib

CONTROL_DIR = "/root/repo/artifacts/fp64_control"
OUT_JSON = "/root/repo/artifacts/ks_survival_restatement.json"

# (checkpoint, resample_factor, baseline stencil size = model width)
CHECKPOINTS = [
    ("artifacts/ckpt_ks8_u16s8", 8),
    ("artifacts/ckpt_ks16", 16),
    ("artifacts/ckpt_ks32", 32),
]
TIME_DELTA = 0.1  # run_evaluation default, the protocol in RESULTS.md
HORIZON = 50.0


def block_mean(a, f):
    if f == 1:
        return a
    return a.reshape(a.shape[:-1] + (a.shape[-1] // f, f)).mean(-1)


def main():
    f32 = np.load(os.path.join(CONTROL_DIR, "ks_fp32.npz"))
    f64 = np.load(os.path.join(CONTROL_DIR, "ks_fp64.npz"))
    min_factor = int(f32["min_factor"])
    times = f32["times"]
    rel_t = jnp.asarray(times - times[0])
    t0 = float(times[0])

    report = {}
    for ckpt, factor in CHECKPOINTS:
        model, params, config = loop_lib.load_model(ckpt)
        assert config.resample_factor == factor, (ckpt, factor)
        eq = model.equation
        coarse = model.grid
        ratio = factor // min_factor
        exact32 = np.swapaxes(block_mean(f32["coarse"], ratio), 0, 1)
        exact64 = np.swapaxes(
            block_mean(f64["coarse"], ratio), 0, 1
        ).astype(np.float32)
        u0_coarse = jnp.asarray(exact32[:, 0])  # the production IC

        # same dt selection as evaluate()
        stable = eq.stable_time_step(coarse, u_scale=3.0)
        inner = max(1, int(np.ceil(TIME_DELTA / stable)))
        dt_coarse = TIME_DELTA / inner
        num_times = exact32.shape[1]

        entry = {}
        schemes = {
            "model": model.rhs_fn(params, None),
            "baseline": integrate.PolynomialDifferentiator(
                eq, coarse, stencil_size=model.config.stencil_size
            ).rhs_fn(None),
        }
        for name, rhs in schemes.items():
            _, traj = integrate.integrate(
                rhs, u0_coarse, dt_coarse, (num_times - 1) * inner,
                save_every=inner, t0=t0,
            )
            traj = jnp.swapaxes(traj, 0, 1)  # [batch, T, nx]
            entry[name] = {}
            for ref_name, exact in (("fp32", exact32), ("fp64", exact64)):
                exact = jnp.asarray(exact)
                mae = jnp.abs(traj - exact).mean(-1)
                corr = eval_lib.pearson_correlation(traj, exact)
                corr = jnp.where(jnp.isfinite(corr), corr, -1.0)
                surv = np.asarray(
                    eval_lib.survival_time_from_correlation(corr, rel_t, 0.8)
                )
                final = np.asarray(mae)[:, -1]
                finite = np.isfinite(final)
                entry[name][ref_name] = {
                    "final_mae": float(final[finite].mean()) if finite.any() else None,
                    "diverged": int((~finite).sum()),
                    "survival_median": float(np.median(surv)),
                    "survival_mean": float(surv.mean()),
                    "per_member_survival": [float(s) for s in surv],
                }
            d32, d64 = entry[name]["fp32"], entry[name]["fp64"]
            moved = sum(
                1 for a, b in zip(d32["per_member_survival"],
                                  d64["per_member_survival"])
                if abs(a - b) > 1e-6
            )
            print(
                f"{ckpt} [{name}]: vs fp32 median {d32['survival_median']:.2f}"
                f" mean {d32['survival_mean']:.2f} MAE {d32['final_mae']}"
                f" | vs fp64 median {d64['survival_median']:.2f}"
                f" mean {d64['survival_mean']:.2f} MAE {d64['final_mae']}"
                f" | {moved}/32 members moved"
            )
        report[ckpt] = {"factor": factor, "schemes": entry}

    with open(OUT_JSON, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {OUT_JSON}")


if __name__ == "__main__":
    main()
