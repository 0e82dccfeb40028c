"""Resample-factor sweep: the paper's headline figure as a CLI.

Trains a learned discretization at each coarsening factor and evaluates it
against the exact solve, the polynomial baseline, and (Burgers) WENO5 —
producing the accuracy-vs-coarsening table of Bar-Sinai et al. Fig. 2/3.

Example:
  python -m pde_superresolution_tpu.scripts.run_sweep \
      --equation=burgers --factors=4,8,16,32 --output_path=/tmp/sweep.jsonl
"""

import json

import numpy as np
from absl import app, flags

import jax

from pde_superresolution_tpu import evaluate as eval_lib
from pde_superresolution_tpu import integrate, weno
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.training import config as config_lib
from pde_superresolution_tpu.training import loop as loop_lib

FLAGS = flags.FLAGS

flags.DEFINE_string("equation", "burgers", "equation name")
flags.DEFINE_list("factors", ["4", "8", "16", "32"], "resample factors")
flags.DEFINE_string("hparams", "", "extra hparam overrides applied to every run")
flags.DEFINE_string("output_path", None, "optional JSONL results path")
flags.DEFINE_integer("num_eval_samples", 16, "eval ensemble size")
flags.DEFINE_float("eval_time_max", 3.0, "eval horizon")
flags.DEFINE_float("eval_warmup", 0.0, "eval warmup (KS: ~40)")
flags.DEFINE_integer(
    "baseline_stencil_size", 0,
    "taps in the classic polynomial-baseline stencils; 0 (default) = the "
    "model's own stencil width, so 'beats the baseline' always means "
    "'beats classic stencils of equal width' (a narrower baseline can be "
    "the unstable one, flattering the model)")
flags.DEFINE_string(
    "reference_cache_dir", "auto",
    "content-keyed cache for exact reference solves — sweep rows sharing "
    "one (equation, protocol) reuse ONE fine solve across resample "
    "factors. 'auto' = ~/.cache/pde_superresolution_tpu/exact_refs; "
    "'' disables")


def main(argv):
    del argv
    base = config_lib.parse_hparams(FLAGS.hparams)
    records = []
    for factor in [int(f) for f in FLAGS.factors]:
        config = config_lib.parse_hparams(
            f"equation={FLAGS.equation},resample_factor={factor}", base
        )
        model, params, metrics = loop_lib.train(config)
        equation = model.equation
        fine = Grid(config.fine_size, equation.period)
        baseline_size = (
            FLAGS.baseline_stencil_size or model.config.stencil_size
        )
        schemes = {
            "model": lambda forcing, m=model, p=params: m.rhs_fn(p, forcing),
            "baseline": lambda forcing, m=model, s=baseline_size:
                integrate.PolynomialDifferentiator(
                    equation, m.grid, stencil_size=s
                ).rhs_fn(forcing),
        }
        if equation.name == "burgers":
            schemes["weno"] = lambda forcing, m=model: weno.WENODifferentiator(
                equation, m.grid
            ).rhs_fn(forcing)
        # model-aware CFL, passed only when it tightens (wide stencils;
        # StencilModel.stable_time_step) — historical protocols keep their
        # exact step counts (mirrors run_evaluation.py)
        model_dt = model.stable_time_step(u_scale=3.0)
        coarse_dt = (
            model_dt
            if model_dt < equation.stable_time_step(model.grid, u_scale=3.0)
            else None
        )
        result = eval_lib.evaluate(
            equation,
            fine,
            factor,
            schemes,
            key=jax.random.PRNGKey(12345),
            num_samples=FLAGS.num_eval_samples,
            time_max=FLAGS.eval_time_max,
            time_delta=config.time_delta,
            warmup_time=FLAGS.eval_warmup,
            ic_scale=config.ic_scale,
            coarse_dt=coarse_dt,
            reference_cache_dir=(
                eval_lib.default_reference_cache_dir()
                if FLAGS.reference_cache_dir == "auto"
                else (FLAGS.reference_cache_dir or None)
            ),
        )
        record = {
            "factor": factor,
            "eval_total": metrics.get("eval_total"),
            "baseline_stencil_size": baseline_size,
        }
        for name in schemes:
            final = np.asarray(result.mae[name])[:, -1]
            finite = np.isfinite(final)
            record[f"{name}_mae"] = (
                float(final[finite].mean()) if finite.any() else None
            )
            # the robust long-horizon statistic (RESULTS.md round-4
            # "Reference precision": quote medians, means are tail-sensitive)
            record[f"{name}_mae_median"] = (
                float(np.median(final[finite])) if finite.any() else None
            )
            record[f"{name}_diverged"] = int((~finite).sum())
            record[f"{name}_survival_median"] = float(
                np.median(np.asarray(result.survival_time[name]))
            )
        records.append(record)
        print(json.dumps(record), flush=True)
    if FLAGS.output_path:
        with open(FLAGS.output_path, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    app.run(main)
