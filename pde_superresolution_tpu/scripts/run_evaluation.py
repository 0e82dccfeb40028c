"""Evaluate a trained model against exact + classical baselines.

≈ pde_superresolution/scripts/run_evaluation.py §main (unverified — see
SURVEY.md): restore checkpoint, integrate model + baselines + exact from
matched initial conditions, write artifacts (HDF5 here; the reference used
netCDF/xarray) with MAE curves and survival times.

Example:
  python -m pde_superresolution_tpu.scripts.run_evaluation \
      --checkpoint_dir=/tmp/ckpt --output_path=/tmp/eval.h5 \
      --num_samples=16 --time_max=10
"""

import os

import numpy as np
from absl import app, flags

import jax

from pde_superresolution_tpu import evaluate as eval_lib
from pde_superresolution_tpu import integrate, weno
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.training import loop as loop_lib

FLAGS = flags.FLAGS

flags.DEFINE_string("checkpoint_dir", None,
                    "trained model checkpoint (or use --exported_dir)")
flags.DEFINE_string(
    "exported_dir", None,
    "serving artifact from run_export; evaluates the FROZEN StableHLO "
    "graph instead of a live checkpoint — the serving-parity path")
flags.DEFINE_string("output_path", None, "HDF5 output path", required=True)
flags.DEFINE_integer("num_samples", 16, "ensemble size (matched ICs)")
flags.DEFINE_float("time_max", 10.0, "evaluation horizon")
flags.DEFINE_float("time_delta", 0.1, "metric sampling interval")
flags.DEFINE_float("warmup_time", 0.0, "attractor warmup (KS: ~40)")
flags.DEFINE_float("correlation_threshold", 0.8,
                   "survival-time correlation threshold")
flags.DEFINE_float(
    "mae_survival_threshold", 0.0,
    "if > 0, ALSO report survival times under the alternative MAE-threshold "
    "criterion (first time ensemble-member MAE exceeds this value; the "
    "reference's exact validity rule is unknown — SURVEY.md §3.4 — so both "
    "criteria are available)")
flags.DEFINE_integer("seed", 0, "evaluation seed")
flags.DEFINE_string(
    "seeds", "",
    "comma-separated evaluation seeds for a MULTI-KEY evaluation "
    "(overrides --seed). The round-5 KS-32x cross-score matrix measured "
    "several t.u. of eval-set noise in a single 32-member survival median "
    "(RESULTS.md round-5 delta); multi-key runs report per-key lines plus "
    "a POOLED median over all keys' members — the statistic comparisons "
    "should quote when they cannot share the eval key exactly. Each key's "
    "full EvalResult is saved to <output_path> with '.key<N>' inserted "
    "before the extension; each key needs its own fine reference solve "
    "(cached separately)")
flags.DEFINE_float("ic_scale", 1.0, "initial-condition amplitude")
flags.DEFINE_integer(
    "baseline_stencil_size", 0,
    "taps in the classic polynomial-baseline stencils; 0 (default) = the "
    "model's own stencil width, so 'beats the baseline' always means "
    "'beats classic stencils of equal width' (a narrower baseline can be "
    "the unstable one, flattering the model)")
flags.DEFINE_string(
    "reference_cache_dir", "auto",
    "content-keyed on-disk cache for the exact fine reference solve (the "
    "dominant evaluation cost; key covers equation params, grid, PRNG key "
    "bits and the sampling protocol, so a hit is bit-identical to "
    "recomputing). 'auto' (default) = the user cache dir "
    "(~/.cache/pde_superresolution_tpu/exact_refs); '' disables")
flags.DEFINE_integer(
    "domain_factor", 1,
    "evaluate the checkpoint on a domain this many times LARGER than it "
    "was trained on (same dx; the learned discretization is a local "
    "operator — RESULTS.md 'domain generalization'). Integer forcing/IC "
    "wavenumber bands scale with the factor so the physical wavelengths "
    "match the training distribution. Checkpoints only: a frozen "
    "--exported_dir artifact has its grid size baked in.")


def main(argv):
    del argv
    if bool(FLAGS.checkpoint_dir) == bool(FLAGS.exported_dir):
        raise app.UsageError(
            "pass exactly one of --checkpoint_dir / --exported_dir")
    if FLAGS.domain_factor > 1 and FLAGS.exported_dir:
        raise app.UsageError(
            "--domain_factor needs a live checkpoint: a frozen StableHLO "
            "artifact's grid size (nx) is baked into the exported graph"
        )
    if FLAGS.exported_dir:
        from pde_superresolution_tpu import export as export_lib

        served = export_lib.load_served_model(FLAGS.exported_dir)
        equation, fine, coarse = export_lib.science_context(served.meta)
        resample_factor = served.meta["resample_factor"]
        model_rhs = served.rhs_fn
        model_stencil_size = served.meta.get("stencil_size", 0)
    else:
        model, params, config = loop_lib.load_model(FLAGS.checkpoint_dir)
        equation = model.equation
        resample_factor = config.resample_factor
        fine = Grid(config.fine_size, equation.period)
        coarse = model.grid
        if FLAGS.domain_factor > 1:
            # same physics in an N-times larger box, same dx: the trained
            # parameters apply unchanged (translation-invariant conv tower,
            # nx-independent constraint layer); the integer wavenumber
            # bands scale so physical forcing/IC wavelengths are unchanged
            import dataclasses

            from pde_superresolution_tpu.models import StencilModel

            n = FLAGS.domain_factor
            equation = dataclasses.replace(
                equation,
                period=n * equation.period,
                forcing_k_min=n * equation.forcing_k_min,
                forcing_k_max=n * equation.forcing_k_max,
                ic_k_min=n * equation.ic_k_min,
                ic_k_max=n * equation.ic_k_max,
            )
            fine = Grid(n * config.fine_size, equation.period)
            coarse = fine.resample(
                resample_factor, conservative=equation.conservative
            )
            model = StencilModel(equation, coarse, config.model)
        model_rhs = lambda forcing: model.rhs_fn(params, forcing)
        model_stencil_size = model.config.stencil_size

    baseline_size = FLAGS.baseline_stencil_size or model_stencil_size
    schemes = {
        "model": model_rhs,
        "baseline": lambda forcing: integrate.PolynomialDifferentiator(
            equation, coarse, stencil_size=baseline_size
        ).rhs_fn(forcing),
    }
    if equation.name == "burgers":
        schemes["weno"] = lambda forcing: weno.WENODifferentiator(
            equation, coarse
        ).rhs_fn(forcing)

    # model-aware CFL: wide stencils need a tighter coarse dt than
    # evaluate()'s equation-level default (the matched-width baseline and
    # WENO schemes integrate at the same dt, which only ever tightens for
    # them). Passed ONLY when it actually tightens, so every historical
    # protocol (stencil ≤8) keeps its exact step count. Frozen artifacts
    # carry the bound in meta["stable_dt"] (the live model is gone at
    # serve time); pre-round-4 artifacts without it keep the default.
    coarse_dt = None
    model_dt = (
        model.stable_time_step(u_scale=3.0)
        if FLAGS.checkpoint_dir
        else served.meta.get("stable_dt")
    )
    if model_dt and model_dt < equation.stable_time_step(
        coarse, u_scale=3.0
    ):
        coarse_dt = model_dt
    if FLAGS.seeds:
        seeds = [int(s) for s in FLAGS.seeds.split(",") if s.strip()]
        if len(set(seeds)) != len(seeds):
            raise app.UsageError(f"--seeds has duplicates: {FLAGS.seeds}")
    else:
        seeds = [FLAGS.seed]
    multi = len(seeds) > 1
    # pooled[scheme] accumulates per-member statistics across eval keys:
    # the pooled MEDIAN over K x num_samples members is the multi-key
    # statistic the round-5 eval-key-noise finding calls for
    pooled_final = {name: [] for name in schemes}
    pooled_surv = {name: [] for name in schemes}
    pooled_surv_mae = {name: [] for name in schemes}
    for seed in seeds:
        result = eval_lib.evaluate(
            equation,
            fine,
            resample_factor,
            schemes,
            key=jax.random.PRNGKey(seed),
            num_samples=FLAGS.num_samples,
            time_max=FLAGS.time_max,
            time_delta=FLAGS.time_delta,
            warmup_time=FLAGS.warmup_time,
            correlation_threshold=FLAGS.correlation_threshold,
            ic_scale=FLAGS.ic_scale,
            coarse_dt=coarse_dt,
            reference_cache_dir=(
                eval_lib.default_reference_cache_dir()
                if FLAGS.reference_cache_dir == "auto"
                else (FLAGS.reference_cache_dir or None)
            ),
        )
        if multi:
            root, ext = os.path.splitext(FLAGS.output_path)
            out_path = f"{root}.key{seed}{ext or '.h5'}"
        else:
            out_path = FLAGS.output_path
        eval_lib.save_eval_h5(out_path, result)
        rel_times = result.times - result.times[0]
        prefix = f"[key {seed}] " if multi else ""
        for name in schemes:
            final = np.asarray(result.mae[name])[:, -1]
            finite = np.isfinite(final)
            mae = float(final[finite].mean()) if finite.any() else float("nan")
            # the member MEDIAN is the robust long-horizon statistic:
            # final-MAE MEANS are tail-sensitive to which attractor
            # trajectory a drifted member is compared against (RESULTS.md
            # round-4 "Reference precision" — quote medians for
            # long-horizon KS comparisons)
            mae_med = float(np.median(final[finite])) if finite.any() else float("nan")
            surv = np.asarray(result.survival_time[name])
            diverged = f" [{int((~finite).sum())}/{finite.size} diverged]" if (~finite).any() else ""
            pooled_final[name].append(final)
            pooled_surv[name].append(surv)
            extra = ""
            if FLAGS.mae_survival_threshold > 0:
                m = np.asarray(result.mae[name])
                m = np.where(np.isfinite(m), m, np.inf)  # NaN blowup = dead
                s2 = np.asarray(
                    eval_lib.survival_time_from_mae(
                        m, rel_times, FLAGS.mae_survival_threshold
                    )
                )
                pooled_surv_mae[name].append(s2)
                extra = (
                    f" | MAE<{FLAGS.mae_survival_threshold:g} survival "
                    f"median {np.median(s2):.2f}"
                )
            print(
                f"{prefix}{name:>10}: final MAE median {mae_med:.4f} / "
                f"mean {mae:.4f}{diverged} | survival "
                f"median {np.median(surv):.2f} / mean {surv.mean():.2f} "
                f"(horizon {FLAGS.time_max}){extra}"
            )
    if multi:
        for name in schemes:
            final = np.concatenate(pooled_final[name])
            finite = np.isfinite(final)
            mae_med = (
                float(np.median(final[finite])) if finite.any() else float("nan")
            )
            surv = np.concatenate(pooled_surv[name])
            per_key = ", ".join(
                f"{np.median(s):.2f}" for s in pooled_surv[name]
            )
            diverged = (
                f" [{int((~finite).sum())}/{finite.size} diverged]"
                if (~finite).any() else ""
            )
            extra = ""
            if FLAGS.mae_survival_threshold > 0:
                s2 = np.concatenate(pooled_surv_mae[name])
                extra = (
                    f" | MAE<{FLAGS.mae_survival_threshold:g} survival "
                    f"median {np.median(s2):.2f}"
                )
            print(
                f"POOLED {len(seeds)} keys {name:>10}: final MAE median "
                f"{mae_med:.4f}{diverged} | survival median "
                f"{np.median(surv):.2f} / mean {surv.mean():.2f} over "
                f"{surv.size} members (per-key medians: {per_key}){extra}"
            )


if __name__ == "__main__":
    app.run(main)
