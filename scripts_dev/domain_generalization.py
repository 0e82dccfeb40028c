"""Domain generalization: run a trained discretization on an N-times larger domain.

The reference paper's locality claim (Bar-Sinai et al., PNAS 2019): the
learned coefficients come from a translation-invariant conv net over the
local solution, so a scheme trained on a small periodic domain should
apply unchanged to a much larger one — the paper demonstrates its Burgers
scheme on a 10x larger domain than it was trained on. This script is that
experiment for this framework:

  * load a trained checkpoint (default: the committed ``ckpt_burgers8``,
    trained at L = 2 pi, fine 1024 -> coarse 128, 8x);
  * rebuild the SAME model (identical parameters; the conv tower and the
    constraint layer are nx-independent) on a domain ``domain_factor``
    times larger with the same dx — integer forcing/IC wavenumber bands
    scale by the factor so the PHYSICAL wavelengths match the training
    distribution (equations.Equation band fields);
  * evaluate against a fresh exact solve on the big fine grid (10240
    points at 10x), with matched-width classic stencils and WENO5
    baselines, under the standard protocol (evaluate.evaluate);
  * ALSO re-evaluate the same checkpoint on its trained domain with the
    same ensemble size/seed for an apples-to-apples reference row.

Writes one JSONL record per domain and prints them.

Run (TPU, ~5 min):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts_dev/domain_generalization.py
"""

import dataclasses
import json

import numpy as np
from absl import app, flags

import jax

from pde_superresolution_tpu import evaluate as eval_lib
from pde_superresolution_tpu import integrate, weno
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.models import StencilModel
from pde_superresolution_tpu.training import loop as loop_lib

FLAGS = flags.FLAGS

flags.DEFINE_string("checkpoint_dir", "artifacts/ckpt_burgers8",
                    "trained checkpoint (its config fixes equation/grids)")
flags.DEFINE_integer("domain_factor", 10, "domain enlargement factor N")
flags.DEFINE_integer("num_samples", 16, "evaluation ensemble size")
flags.DEFINE_float("time_max", 3.0, "evaluation horizon")
flags.DEFINE_float("warmup_time", 0.0, "exact-solver warmup (KS: ~44)")
flags.DEFINE_integer("seed", 0, "evaluation seed")
flags.DEFINE_string("output_path", None, "optional JSONL results path")


def _run(model, params, config, equation, fine, label):
    factor = config.resample_factor
    coarse = fine.resample(factor, conservative=equation.conservative)
    width = config.model.stencil_size
    schemes = {
        "model": lambda f, m=model, p=params: m.rhs_fn(p, f),
        "baseline": lambda f, e=equation, c=coarse, s=width:
            integrate.PolynomialDifferentiator(e, c, stencil_size=s).rhs_fn(f),
    }
    if equation.name == "burgers":
        schemes["weno"] = lambda f, e=equation, c=coarse: (
            weno.WENODifferentiator(e, c).rhs_fn(f)
        )
    result = eval_lib.evaluate(
        equation,
        fine,
        factor,
        schemes,
        key=jax.random.PRNGKey(FLAGS.seed),
        num_samples=FLAGS.num_samples,
        time_max=FLAGS.time_max,
        time_delta=config.time_delta,
        warmup_time=FLAGS.warmup_time,
        ic_scale=config.ic_scale,
    )
    record = {
        "domain": label,
        "period": float(equation.period),
        "nx_coarse": int(coarse.size),
        "num_samples": FLAGS.num_samples,
        "baseline_stencil_size": width,
    }
    horizon = float(np.asarray(result.times)[-1] - np.asarray(result.times)[0])
    record["horizon"] = horizon
    for name in schemes:
        final = np.asarray(result.mae[name])[:, -1]
        finite = np.isfinite(final)
        record[f"{name}_mae"] = (
            float(final[finite].mean()) if finite.any() else None
        )
        record[f"{name}_diverged"] = int((~finite).sum())
        record[f"{name}_survival_median"] = float(
            np.median(np.asarray(result.survival_time[name]))
        )
    return record


def main(argv):
    del argv
    model, params, config = loop_lib.load_model(FLAGS.checkpoint_dir)
    base_eq = model.equation
    n = FLAGS.domain_factor

    records = [
        _run(model, params, config, base_eq,
             Grid(config.fine_size, base_eq.period), "trained")
    ]

    # Same physics, N-times larger box: period scales, integer wavenumber
    # bands scale with it so physical forcing/IC wavelengths are unchanged
    # (forcing POWER per point is also unchanged: the same number of
    # sinusoid terms with the same amplitude law — they are just spread
    # over 10x more admissible integer wavenumbers within the same
    # physical band).
    big_eq = dataclasses.replace(
        base_eq,
        period=n * base_eq.period,
        forcing_k_min=n * base_eq.forcing_k_min,
        forcing_k_max=n * base_eq.forcing_k_max,
        ic_k_min=n * base_eq.ic_k_min,
        ic_k_max=n * base_eq.ic_k_max,
    )
    big_fine = Grid(n * config.fine_size, big_eq.period)  # same dx_fine
    big_coarse = big_fine.resample(
        config.resample_factor, conservative=big_eq.conservative
    )
    assert abs(big_coarse.dx - model.grid.dx) < 1e-12  # same coarse dx
    # identical parameters on the big grid: the model is a local operator
    big_model = StencilModel(big_eq, big_coarse, config.model)
    records.append(
        _run(big_model, params, config, big_eq, big_fine, f"{n}x_larger")
    )

    for r in records:
        print(json.dumps(r), flush=True)
    if FLAGS.output_path:
        with open(FLAGS.output_path, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    app.run(main)
