"""Freeze a trained checkpoint into a standalone serving artifact.

The TPU-native counterpart of exporting the reference's frozen TF graph
(restored by ``integrate.py §SavedModelDifferentiator`` — unverified, see
SURVEY.md): the checkpoint's model RHS (and an optional multi-step RK4
advance) is lowered to StableHLO for cpu AND tpu and written to a
directory that ``export.ServedModel`` loads without any model code.

Example:
  python -m pde_superresolution_tpu.scripts.run_export \
      --checkpoint_dir=artifacts/ckpt_ks8_u16s8 --output_dir=/tmp/ks8_export \
      --num_steps=16

Evaluate the frozen artifact exactly like a live checkpoint with
``run_evaluation --exported_dir=/tmp/ks8_export``.
"""

import json

from absl import app, flags

import jax
import jax.numpy as jnp
import numpy as np

from pde_superresolution_tpu import export as export_lib
from pde_superresolution_tpu.training import loop as loop_lib

FLAGS = flags.FLAGS

flags.DEFINE_string("checkpoint_dir", None, "trained model checkpoint",
                    required=True)
flags.DEFINE_string("output_dir", None, "artifact output directory",
                    required=True)
flags.DEFINE_integer(
    "num_steps", 16,
    "RK4 steps fused into the exported advance function (one call = "
    "num_steps steps; 0 exports the per-step RHS only)")
flags.DEFINE_float(
    "dt", 0.0,
    "RK4 step of the advance function; 0 = the equation's stable step on "
    "the model grid (the same default evaluate() subdivides against)")
flags.DEFINE_string(
    "platforms", "cpu,tpu",
    "comma-separated lowering targets baked into the artifact")


def main(argv):
    del argv
    model, params, config = loop_lib.load_model(FLAGS.checkpoint_dir)
    meta = export_lib.export_and_save(
        model,
        params,
        FLAGS.output_dir,
        dt=FLAGS.dt or None,
        num_steps=FLAGS.num_steps,
        platforms=tuple(FLAGS.platforms.split(",")),
        fine_size=config.fine_size,
        resample_factor=config.resample_factor,
        # provenance only: export_model itself serializes the full
        # equation_params from the live equation object (config overrides
        # included), so a library caller gets the same physics-carrying
        # artifact as the CLI
        extra_meta={
            "checkpoint_dir": FLAGS.checkpoint_dir,
            "training_equation_params": config.equation_params,
        },
    )
    # sanity: the frozen graph reproduces the live model on this host
    served = export_lib.load_served_model(FLAGS.output_dir)
    key = jax.random.PRNGKey(0)
    u = model.equation.initial_conditions(key, model.grid, (4,))
    forcing = model.equation.sample_forcing(key, (4,))
    live = model.rhs_fn(params, forcing, use_pallas=False)(u, 0.0)
    frozen = served.rhs_fn(forcing)(u, 0.0)
    err = float(jnp.abs(live - frozen).max())
    if not np.isfinite(err) or err > 1e-5:
        raise RuntimeError(f"exported RHS disagrees with live model: {err}")
    print(json.dumps({"output_dir": FLAGS.output_dir, "max_abs_err": err,
                      **meta}))


if __name__ == "__main__":
    app.run(main)
