"""Train a learned discretization model.

≈ pde_superresolution/scripts/run_training.py §main (unverified — see
SURVEY.md): --input_path (HDF5 snapshots), --checkpoint_dir, --hparams
comma-separated overrides -> training_loop. Without --input_path the
snapshots are generated on device from the config (fully on-TPU pipeline).

Example:
  python -m pde_superresolution_tpu.scripts.run_training \
      --checkpoint_dir=/tmp/ckpt \
      --hparams=equation=ks,resample_factor=8,num_time_steps=4
"""

from absl import app, flags

from pde_superresolution_tpu.training import config as config_lib
from pde_superresolution_tpu.training import data as data_lib
from pde_superresolution_tpu.training import loop as loop_lib

FLAGS = flags.FLAGS

flags.DEFINE_string("input_path", None,
                    "HDF5 snapshots (optional; default: generate on device)")
flags.DEFINE_integer("input_num_trajectories", 0,
                     "trajectory count for a 2-D [samples, x] --input_path "
                     "matrix (0 = use the file's num_trajectories attr, or "
                     "treat the matrix as one contiguous trajectory)")
flags.DEFINE_string("checkpoint_dir", None, "checkpoint directory",
                    required=True)
flags.DEFINE_string("metrics_path", None,
                    "JSONL metrics path (default: <checkpoint_dir>/metrics.jsonl)")
flags.DEFINE_string("tensorboard_dir", None,
                    "optional TensorBoard event-file dir (scalars mirrored "
                    "from the JSONL stream)")
flags.DEFINE_string("hparams", "", "comma-separated key=value overrides "
                    "(tuples use ';': learning_rates=1e-3;1e-4)")
flags.DEFINE_integer("data_parallel", 0,
                     "shard training over this many devices (0 = single)")
flags.DEFINE_boolean("large_ensemble", False,
                     "use the trajectory-structured pipeline (chunked "
                     "on-device generation, lazy rollout windows, "
                     "by-trajectory eval split) — for 1k-100k-trajectory "
                     "datasets that the flat pipeline cannot hold")
flags.DEFINE_integer("chunk_trajectories", 1024,
                     "trajectories per generation chunk (large_ensemble)")
flags.DEFINE_enum("host_data", "auto", ["auto", "true", "false"],
                  "stage the large_ensemble dataset in HOST memory and ship "
                  "only each batch to the device (generation still runs on "
                  "device, chunk by chunk). Required for ensembles larger "
                  "than HBM (~40k KS-8x trajectories fill a 16 GB v5e once "
                  "params/rollouts are accounted for); costs per-step "
                  "host->device transfer of one batch. auto = host-stage "
                  "when the estimated dataset exceeds 6 GB")

# auto --host_data threshold: leave headroom on a 16 GB v5e for the fine
# generation chunks, model/optimizer state and unrolled-loss activations
_HOST_DATA_AUTO_BYTES = 6 * 1024**3


def _estimated_dataset_bytes(equation, config) -> int:
    """f32 bytes of the TrajectoryData arrays the config will build."""
    nx_c = config.fine_size // config.resample_factor
    usable = config.num_times - config.num_time_steps
    per_traj = nx_c * (
        config.num_times + (len(equation.derivative_orders) + 1) * usable
    )
    return 4 * config.num_trajectories * per_traj


def main(argv):
    del argv
    config = config_lib.parse_hparams(FLAGS.hparams)
    dataset = None
    if FLAGS.host_data == "true" and not FLAGS.large_ensemble:
        # silently ignoring the flag would let a bigger-than-HBM run OOM
        # despite the user explicitly asking for host staging. An explicit
        # "false" (like the default "auto") is a no-op on the flat pipeline
        # and is accepted.
        raise app.UsageError(
            "--host_data=true applies to the --large_ensemble trajectory "
            "pipeline only (the flat pipeline materializes rollouts and "
            "is not host-stageable); add --large_ensemble"
        )
    if FLAGS.large_ensemble:
        if FLAGS.input_path:
            raise ValueError("--large_ensemble generates on device; drop "
                             "--input_path")
        import jax

        from pde_superresolution_tpu import equations
        from pde_superresolution_tpu.grids import Grid

        equation = equations.from_name(
            config.equation, conservative=config.conservative,
            **config.equation_params,
        )
        fine = Grid(config.fine_size, equation.period)
        if FLAGS.host_data == "auto":
            est = _estimated_dataset_bytes(equation, config)
            host_resident = est > _HOST_DATA_AUTO_BYTES
            if host_resident:
                print(f"host_data=auto: estimated dataset "
                      f"{est / 1024**3:.1f} GB > "
                      f"{_HOST_DATA_AUTO_BYTES / 1024**3:.0f} GB — staging "
                      "on host (per-batch device transfer)")
        else:
            host_resident = FLAGS.host_data == "true"
        dataset = data_lib.build_trajectory_data(
            equation, fine, jax.random.PRNGKey(config.data_seed),
            num_trajectories=config.num_trajectories,
            num_times=config.num_times,
            time_delta=config.time_delta,
            resample_factor=config.resample_factor,
            unroll_steps=config.num_time_steps,
            warmup_time=config.warmup_time,
            ic_scale=config.ic_scale,
            chunk_trajectories=FLAGS.chunk_trajectories,
            host_resident=host_resident,
        )
    if FLAGS.input_path:
        import dataclasses

        from pde_superresolution_tpu import equations

        snapshots, equation, fine = data_lib.load_snapshots_h5(
            FLAGS.input_path,
            num_trajectories=FLAGS.input_num_trajectories or None,
        )
        times = snapshots.times
        time_delta = float(times[1] - times[0]) if times.shape[0] > 1 else config.time_delta
        eq_params = equations.params_dict(equation)
        config = dataclasses.replace(
            config,
            equation=equation.name,
            equation_params=eq_params,  # custom physics (eta, period, ...)
            conservative=equation.conservative,
            fine_size=fine.size,
            time_delta=time_delta,  # the unrolled loss must use the file's
            # actual snapshot spacing, not the default hparam
        )
        dataset = data_lib.build_training_data(
            equation, fine, snapshots, config.resample_factor,
            unroll_steps=config.num_time_steps,
        )
    mesh = None
    if FLAGS.data_parallel:
        from pde_superresolution_tpu import parallel

        mesh = parallel.make_mesh(data=FLAGS.data_parallel)
    metrics_path = FLAGS.metrics_path or f"{FLAGS.checkpoint_dir}/metrics.jsonl"
    _, _, metrics = loop_lib.train(
        config,
        dataset=dataset,
        checkpoint_dir=FLAGS.checkpoint_dir,
        metrics_path=metrics_path,
        mesh=mesh,
        tensorboard_dir=FLAGS.tensorboard_dir,
    )
    print({k: round(v, 4) for k, v in metrics.items() if k.startswith("eval")})


if __name__ == "__main__":
    app.run(main)
