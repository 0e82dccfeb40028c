"""Generate exact-solution training snapshots and write HDF5.

≈ pde_superresolution/scripts/create_training_data.py §main (unverified —
see SURVEY.md): pick an equation + seed, run a high-resolution exact solve
with random forcing/ICs, sample snapshots, write HDF5. Here the entire
solve (ETDRK4) runs on the TPU in one jitted scan — the reference's
slowest stage (scipy loop, one session.run per RHS eval) becomes
sub-second.

Example:
  python -m pde_superresolution_tpu.scripts.create_training_data \
      --equation=burgers --conservative --output_path=/tmp/burgers.h5 \
      --num_trajectories=32 --num_times=128 --time_delta=0.1 --seed=0
"""

from absl import app, flags

import jax

from pde_superresolution_tpu import equations
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.training import data as data_lib

FLAGS = flags.FLAGS

flags.DEFINE_string("output_path", None, "HDF5 output path", required=True)
flags.DEFINE_enum("equation", "burgers", sorted(equations.EQUATION_TYPES),
                  "equation to solve")
flags.DEFINE_boolean("conservative", True,
                     "conservative (finite-volume) labeling downstream")
flags.DEFINE_integer("fine_size", 1024, "fine (exact) grid size")
flags.DEFINE_integer("num_trajectories", 32, "number of trajectories")
flags.DEFINE_integer("num_times", 128, "snapshots per trajectory")
flags.DEFINE_float("time_delta", 0.1, "time between snapshots")
flags.DEFINE_float("warmup_time", 0.0,
                   "discard this much initial time (KS: use ~40 to land on "
                   "the attractor)")
flags.DEFINE_float("ic_scale", 1.0, "initial-condition amplitude scale")
flags.DEFINE_integer("seed", 0, "random seed")


def main(argv):
    del argv
    equation = equations.from_name(
        FLAGS.equation, conservative=FLAGS.conservative
    )
    fine = Grid(FLAGS.fine_size, equation.period)
    snapshots = data_lib.generate_snapshots(
        equation,
        fine,
        jax.random.PRNGKey(FLAGS.seed),
        num_trajectories=FLAGS.num_trajectories,
        num_times=FLAGS.num_times,
        time_delta=FLAGS.time_delta,
        warmup_time=FLAGS.warmup_time,
        ic_scale=FLAGS.ic_scale,
    )
    data_lib.save_snapshots_h5(FLAGS.output_path, snapshots, equation, fine)
    print(
        f"wrote {FLAGS.num_trajectories}x{FLAGS.num_times}x{FLAGS.fine_size} "
        f"{FLAGS.equation} snapshots to {FLAGS.output_path}"
    )


if __name__ == "__main__":
    app.run(main)
