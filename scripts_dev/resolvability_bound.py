"""Upper-bound probe: how long can the BEST POSSIBLE coarse scheme track KS?

RESULTS.md round 3 claims the KS 32x survival plateau (~37 t.u.) is a
RESOLVABILITY limit, not a training limit — sub-grid scales the coarse grid
cannot represent decorrelate the chaotic attractor no matter how good the
stencils are. This probe tests that claim directly: solve KS *spectrally
with ETDRK4 on the coarse grid itself* — exact band-limited derivatives and
an exact stiff linear part, the most accurate scheme any method could
realize on N points — under the same protocol as the learned-model sweeps
(fine 1024, warmup 44, horizon 50, 32 matched ICs, eval key 12345, the
sweep's correlation-survival criterion). If even ETDRK4-on-N-points
saturates near the learned model's plateau, the plateau is the grid's, not
the model's.

(Why not plug SpectralDifferentiator into evaluate()? evaluate integrates
schemes with RK4 at the classic schemes' stable step; spectral derivatives
raise the stiff |k|^4 ceiling to pi/dx so that step is unstable — measured:
instant divergence at every factor. ETDRK4 removes the stiffness exactly.)

Both coarse-graining families are reported: block-mean (cell averages, the
conservative models' comparator) and subsample (point values).

Usage (TPU, one process):
  python scripts_dev/resolvability_bound.py --factors=8,16,32 \
      --output_path=/tmp/resolvability.jsonl
"""

import json

import numpy as np
from absl import app, flags

import jax
import jax.numpy as jnp

from pde_superresolution_tpu import equations
from pde_superresolution_tpu import evaluate as eval_lib
from pde_superresolution_tpu import integrate
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.ops import resample

FLAGS = flags.FLAGS

flags.DEFINE_string("equation", "ks", "equation name")
flags.DEFINE_list("factors", ["8", "16", "32"], "resample factors")
flags.DEFINE_integer("fine_size", 1024, "fine grid points (sweep default)")
flags.DEFINE_integer("num_samples", 32, "ensemble size (sweep protocol)")
flags.DEFINE_float("time_max", 50.0, "horizon")
flags.DEFINE_float("time_delta", 0.1, "save interval")
flags.DEFINE_float("warmup", 44.0, "attractor warmup (KS)")
flags.DEFINE_float("correlation_threshold", 0.8, "survival criterion")
flags.DEFINE_string("output_path", None, "optional JSONL results path")


def main(argv):
    del argv
    eq = equations.from_name(FLAGS.equation, conservative=True)
    if eq.forced:
        # The coarse re-solve below starts its forcing clock at t=0 while
        # its initial state sits at t=warmup+0 of the FINE trajectory —
        # exact_solve_sampled has no t0 parameter, so for forced equations
        # the comparison would run against phase-shifted forcing and the
        # "best classical scheme" bound would be silently wrong.
        raise app.UsageError(
            f"{eq.name} is forced; this probe only supports unforced "
            "equations (the coarse re-solve cannot resume the forcing "
            "phase at t=warmup)"
        )
    fine = Grid(FLAGS.fine_size, eq.period)
    num_times = int(round(FLAGS.time_max / FLAGS.time_delta)) + 1

    # matched ICs/forcing, same key-split as evaluate()
    k_ic, k_f = jax.random.split(jax.random.PRNGKey(12345))
    u0 = eq.initial_conditions(k_ic, fine, (FLAGS.num_samples,))
    forcing = eq.sample_forcing(k_f, (FLAGS.num_samples,))

    times, traj_fine = integrate.exact_solve_sampled(
        eq, fine, u0, FLAGS.time_delta, num_times,
        warmup_time=FLAGS.warmup, forcing=forcing,
    )  # [T, batch, nx_fine]

    for factor in [int(f) for f in FLAGS.factors]:
        record = {"factor": factor, "n_coarse": FLAGS.fine_size // factor}
        for family, coarsen in (
            ("mean", lambda f, k=factor: resample.resample_mean(f, k)),
            ("subsample", lambda f, k=factor: resample.subsample(f, k)),
        ):
            coarse = fine.resample(factor, conservative=(family == "mean"))
            exact = jnp.swapaxes(coarsen(traj_fine), 0, 1)  # [batch, T, nx_c]
            _, ctraj = integrate.exact_solve_sampled(
                eq, coarse, exact[:, 0], FLAGS.time_delta, num_times,
                warmup_time=0.0, forcing=forcing,
            )
            ctraj = jnp.swapaxes(ctraj, 0, 1)
            corr = eval_lib.pearson_correlation(ctraj, exact)
            corr = jnp.where(jnp.isfinite(corr), corr, -1.0)
            surv = eval_lib.survival_time_from_correlation(
                corr, times - times[0], FLAGS.correlation_threshold
            )
            final = np.asarray(jnp.abs(ctraj - exact).mean(axis=-1))[:, -1]
            finite = np.isfinite(final)
            record[f"etdrk4_{family}_mae"] = (
                float(final[finite].mean()) if finite.any() else None
            )
            record[f"etdrk4_{family}_diverged"] = int((~finite).sum())
            record[f"etdrk4_{family}_survival_median"] = float(
                np.median(np.asarray(surv))
            )
        print(json.dumps(record), flush=True)
        if FLAGS.output_path:
            with open(FLAGS.output_path, "a") as f:
                f.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    app.run(main)
