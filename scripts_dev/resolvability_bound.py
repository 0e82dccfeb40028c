"""Upper-bound probe: how long can the BEST POSSIBLE coarse scheme track KS?

RESULTS.md round 3 claims the KS 32x survival plateau (~37 t.u.) is a
RESOLVABILITY limit, not a training limit — sub-grid scales the coarse grid
cannot represent decorrelate the chaotic attractor no matter how good the
stencils are. This probe tests that claim directly: evaluate a coarse-grid
SPECTRAL scheme (exact band-limited derivatives — the most accurate scheme
any method could realize on N points) under the exact same protocol as the
learned-model sweeps (fine 1024, warmup 44, horizon 50, 32 matched ICs,
eval key 12345). If even spectral-on-32-points saturates near the learned
model's plateau, the plateau is the grid's, not the model's.

Usage (TPU, one process):
  python scripts_dev/resolvability_bound.py --factors=8,16,32 \
      --output_path=/tmp/resolvability.jsonl
"""

import json

import numpy as np
from absl import app, flags

import jax

from pde_superresolution_tpu import equations
from pde_superresolution_tpu import evaluate as eval_lib
from pde_superresolution_tpu import integrate
from pde_superresolution_tpu.grids import Grid

FLAGS = flags.FLAGS

flags.DEFINE_string("equation", "ks", "equation name")
flags.DEFINE_list("factors", ["8", "16", "32"], "resample factors")
flags.DEFINE_integer("fine_size", 1024, "fine grid points (sweep default)")
flags.DEFINE_integer("num_samples", 32, "ensemble size (sweep protocol)")
flags.DEFINE_float("time_max", 50.0, "horizon")
flags.DEFINE_float("time_delta", 0.1, "save interval")
flags.DEFINE_float("warmup", 44.0, "attractor warmup (KS)")
flags.DEFINE_integer("baseline_stencil_size", 10, "classic comparator width")
flags.DEFINE_string("output_path", None, "optional JSONL results path")


def main(argv):
    del argv
    eq = equations.from_name(FLAGS.equation, conservative=True)
    fine = Grid(FLAGS.fine_size, eq.period)
    for factor in [int(f) for f in FLAGS.factors]:
        coarse = fine.resample(factor, conservative=True)
        schemes = {
            "spectral_coarse": lambda f, c=coarse: integrate.SpectralDifferentiator(
                eq, c
            ).rhs_fn(f),
            "baseline": lambda f, c=coarse: integrate.PolynomialDifferentiator(
                eq, c, stencil_size=FLAGS.baseline_stencil_size
            ).rhs_fn(f),
        }
        result = eval_lib.evaluate(
            eq,
            fine,
            factor,
            schemes,
            key=jax.random.PRNGKey(12345),
            num_samples=FLAGS.num_samples,
            time_max=FLAGS.time_max,
            time_delta=FLAGS.time_delta,
            warmup_time=FLAGS.warmup,
        )
        record = {"factor": factor, "n_coarse": coarse.size}
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
        print(json.dumps(record), flush=True)
        if FLAGS.output_path:
            with open(FLAGS.output_path, "a") as f:
                f.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    app.run(main)
