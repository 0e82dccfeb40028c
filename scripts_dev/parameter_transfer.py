"""Parameter transfer: deploy a trained closure at a viscosity it never saw.

Production models face parameter drift: a Burgers closure trained at
eta=0.01 may be asked to run at a different viscosity. The learned face
reconstructions feed a flux J = u^2/2 - eta*u_x whose eta term follows the
EQUATION (equations.BurgersEquation.flux), so the same parameters define a
valid scheme at any eta — the question is whether the learned upwinding,
tuned to eta=0.01 shock widths, still beats classic schemes when shocks
are sharper (smaller eta) or smoother (larger eta). Exact solves and
baselines use the deployed eta, so every row is a fair same-physics
comparison.

Run (TPU, ~10 min):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts_dev/parameter_transfer.py
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
                    "trained checkpoint (Burgers; trained at its config eta)")
flags.DEFINE_list("etas", ["0.005", "0.01", "0.02"],
                  "viscosities to deploy the SAME parameters at")
flags.DEFINE_integer("num_samples", 16, "evaluation ensemble size")
flags.DEFINE_float("time_max", 3.0, "evaluation horizon")
flags.DEFINE_integer("seed", 0, "evaluation seed")
flags.DEFINE_string("output_path", None, "optional JSONL results path")


def main(argv):
    del argv
    model, params, config = loop_lib.load_model(FLAGS.checkpoint_dir)
    base_eq = model.equation
    trained_eta = base_eq.eta
    fine = Grid(config.fine_size, base_eq.period)
    factor = config.resample_factor
    width = config.model.stencil_size

    records = []
    for eta in [float(e) for e in FLAGS.etas]:
        eq = dataclasses.replace(base_eq, eta=eta)
        coarse = fine.resample(factor, conservative=eq.conservative)
        deployed = StencilModel(eq, coarse, config.model)
        schemes = {
            "model": lambda f, m=deployed: m.rhs_fn(params, f),
            "baseline": lambda f, e=eq, c=coarse:
                integrate.PolynomialDifferentiator(
                    e, c, stencil_size=width
                ).rhs_fn(f),
            "weno": lambda f, e=eq, c=coarse:
                weno.WENODifferentiator(e, c).rhs_fn(f),
        }
        result = eval_lib.evaluate(
            eq, fine, factor, schemes,
            key=jax.random.PRNGKey(FLAGS.seed),
            num_samples=FLAGS.num_samples,
            time_max=FLAGS.time_max,
            time_delta=config.time_delta,
            ic_scale=config.ic_scale,
        )
        record = {
            "eta": eta,
            "trained_eta": trained_eta,
            "num_samples": FLAGS.num_samples,
            "baseline_stencil_size": width,
        }
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
        records.append(record)
        print(json.dumps(record), flush=True)
    if FLAGS.output_path:
        with open(FLAGS.output_path, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    app.run(main)
