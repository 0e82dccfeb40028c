"""Large-ensemble integration with a trained model (BASELINE config #5).

Integrates an ensemble of trajectories (default 10240) with the learned
scheme on the coarse grid, fully batched on device, and reports throughput
plus ensemble statistics (mean/rms fields, energy spectrum). Optionally
writes snapshots to HDF5 via the crash-resumable integrator.

Example:
  python -m pde_superresolution_tpu.scripts.run_ensemble \
      --checkpoint_dir=/tmp/ks_run/ckpt --num_trajectories=10240 \
      --time_max=10
"""

import time

import numpy as np
from absl import app, flags

import jax

from pde_superresolution_tpu import analysis, integrate
from pde_superresolution_tpu.training import loop as loop_lib

FLAGS = flags.FLAGS

flags.DEFINE_string("checkpoint_dir", None,
                    "trained model checkpoint (or use --exported_dir)")
flags.DEFINE_string(
    "exported_dir", None,
    "serving artifact from run_export; integrates the ensemble with the "
    "FROZEN StableHLO graph (no model code or checkpoint needed). The "
    "Mosaic fused path needs live parameters, so this serves via the XLA "
    "scan; --data_parallel still shards the frozen graph (GSPMD partitions "
    "the exported call's symbolic batch dim directly)")
flags.DEFINE_integer("num_trajectories", 10240, "ensemble size")
flags.DEFINE_float("time_max", 10.0, "integration horizon")
flags.DEFINE_float("warmup_time", 0.0,
                   "exact-solver warmup before handing off to the model "
                   "(KS: ~40 to start on the attractor)")
flags.DEFINE_integer("seed", 0, "ensemble seed")
flags.DEFINE_float("ic_scale", 1.0, "initial-condition amplitude")
flags.DEFINE_string("output_path", None,
                    "optional HDF5 store (resumable across restarts)")
flags.DEFINE_integer("num_saves", 10, "snapshots to keep over the horizon")
flags.DEFINE_enum(
    "fused", "auto", ["auto", "true", "false"],
    "whole-interval Mosaic kernel between snapshots; auto = on-TPU when "
    "shapes tile and no HDF5 output is requested (falls back to the XLA "
    "scan if the kernel fails to build or compile)")
flags.DEFINE_integer(
    "domain_factor", 1,
    "integrate the ensemble on a domain this many times LARGER than the "
    "checkpoint was trained on (same dx; the learned discretization is a "
    "local operator, and forcing/IC wavenumber bands scale with the factor "
    "so the physical wavelengths match training — RESULTS.md 'domain "
    "generalization'). Checkpoints only: a frozen --exported_dir artifact "
    "has its grid size baked in. Composes with --fused (the kernel tiles "
    "any nx divisible by 128) and --data_parallel.")
flags.DEFINE_integer(
    "data_parallel", 0,
    "shard the ensemble (warmup + integration) over this many devices of a "
    "('data',) mesh; 0 = single device. Composes with --fused: the Mosaic "
    "kernel is wrapped in shard_map over the data axis (each device runs "
    "the kernel on its local batch; pure DP needs no cross-shard comm). "
    "The XLA-scan fallback runs GSPMD-sharded with the Pallas per-step RHS "
    "disabled (GSPMD cannot partition a Mosaic custom call).")


def main(argv):
    del argv
    if bool(FLAGS.checkpoint_dir) == bool(FLAGS.exported_dir):
        raise app.UsageError(
            "pass exactly one of --checkpoint_dir / --exported_dir")
    served = None
    if FLAGS.exported_dir:
        from pde_superresolution_tpu import export as export_lib

        if FLAGS.fused == "true":
            raise ValueError(
                "--fused=true needs live model parameters (the Mosaic "
                "kernel is built from them); a frozen artifact serves via "
                "the XLA scan — pass --checkpoint_dir or drop --fused"
            )
        if FLAGS.domain_factor > 1:
            raise ValueError(
                "--domain_factor needs a live checkpoint: a frozen "
                "StableHLO artifact's grid size (nx) is baked into the "
                "exported graph"
            )
        served = export_lib.load_served_model(FLAGS.exported_dir)
        equation, _, coarse = export_lib.science_context(served.meta)
    else:
        model, params, config = loop_lib.load_model(FLAGS.checkpoint_dir)
        equation = model.equation
        coarse = model.grid
        if FLAGS.domain_factor > 1:
            # same physics in an N-times larger box, same dx: identical
            # parameters apply (translation-invariant tower, nx-independent
            # constraint layer); integer wavenumber bands scale so the
            # physical forcing/IC wavelengths are unchanged
            import dataclasses

            from pde_superresolution_tpu.grids import Grid
            from pde_superresolution_tpu.models import StencilModel

            nf = FLAGS.domain_factor
            equation = dataclasses.replace(
                equation,
                period=nf * equation.period,
                forcing_k_min=nf * equation.forcing_k_min,
                forcing_k_max=nf * equation.forcing_k_max,
                ic_k_min=nf * equation.ic_k_min,
                ic_k_max=nf * equation.ic_k_max,
            )
            coarse = Grid(nf * config.fine_size, equation.period).resample(
                config.resample_factor, conservative=equation.conservative
            )
            model = StencilModel(equation, coarse, config.model)
    n = FLAGS.num_trajectories

    key, k_f = jax.random.split(jax.random.PRNGKey(FLAGS.seed))
    u0 = FLAGS.ic_scale * equation.initial_conditions(key, coarse, (n,))
    forcing = equation.sample_forcing(k_f, (n,))  # None for unforced eqs
    mesh = None
    if FLAGS.data_parallel:
        # DP over the trajectory axis: GSPMD shards the warmup spectral
        # solve and the XLA-scan integration with zero code changes below
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pde_superresolution_tpu import parallel

        if n % FLAGS.data_parallel:
            raise ValueError(
                f"num_trajectories={n} not divisible by "
                f"data_parallel={FLAGS.data_parallel}"
            )
        mesh = parallel.make_mesh(data=FLAGS.data_parallel)
        sharding = NamedSharding(mesh, P("data"))
        u0 = jax.device_put(u0, sharding)
        if forcing is not None:
            forcing = jax.tree.map(
                lambda leaf: jax.device_put(leaf, sharding), forcing
            )
    t0 = 0.0
    if FLAGS.warmup_time > 0:
        # warm up with the exact solver on the coarse grid (cheap, batched)
        dt_w = 0.2 * coarse.dx
        steps_w = int(np.ceil(FLAGS.warmup_time / dt_w))
        _, warm = integrate.integrate_spectral(
            equation, coarse, u0, dt_w, steps_w, save_every=steps_w,
            forcing=forcing,
        )
        u0 = warm[-1]
        t0 = steps_w * dt_w  # forcing phase must continue, not reset to 0

    # model-aware CFL (wide stencils need tighter dt than the equation
    # bound — StencilModel.stable_time_step). Frozen artifacts carry the
    # bound in meta["stable_dt"] (export_model records it because the live
    # model is gone at serve time); pre-round-4 artifacts without it fall
    # back to the equation bound, which matches what they always ran at.
    if FLAGS.checkpoint_dir:
        dt = model.stable_time_step(u_scale=3.0)
    else:
        dt = served.meta.get("stable_dt")
        if dt is None:  # pre-round-4 artifact: equation bound, as it always ran
            dt = equation.stable_time_step(coarse, u_scale=3.0)
        elif not dt > 0:  # malformed artifact — a silent fallback would
            # integrate a wide-stencil export at an unstable dt
            raise ValueError(
                f"exported artifact carries invalid stable_dt={dt!r} "
                f"(expected a positive float); re-export with run_export"
            )
    num_steps = int(np.ceil(FLAGS.time_max / dt))
    save_every = max(1, num_steps // FLAGS.num_saves)
    num_steps = save_every * FLAGS.num_saves

    if FLAGS.fused == "true" and FLAGS.output_path:
        raise ValueError(
            "--fused=true conflicts with --output_path: the resumable HDF5 "
            "integrator drives single RK4 steps (drop one of the two flags)"
        )
    fused_tiles = []
    if served is None and FLAGS.fused != "false" and not FLAGS.output_path:
        # whole-interval Mosaic kernel: every RK4 step between snapshots
        # stays in VMEM (models.StencilModel.fused_rk4_fn); in-kernel
        # rotated-phase forcing for forced equations. Under --data_parallel
        # the kernel runs per shard via shard_map (fused_rk4_fn(mesh=...)),
        # so the tiles must divide the PER-DEVICE batch. Larger batch tiles
        # are faster; a tile whose VMEM estimate exceeds the physical
        # budget is refused before compiling (pallas_kernels pre-screens —
        # an over-budget Mosaic compile can wedge the chip rather than fail
        # cleanly), and the next one is tried (then the XLA scan, unless
        # --fused=true).
        local_n = n // FLAGS.data_parallel if FLAGS.data_parallel else n
        fused_tiles = [
            tb for tb in (256, 128, 64, 32, 16, 8) if local_n % tb == 0
        ]
        supported = (
            jax.default_backend() == "tpu"
            and fused_tiles
            and coarse.size % 128 == 0
        )
        if not supported:
            if FLAGS.fused == "true":
                raise ValueError(
                    f"--fused=true but shapes ({local_n}, {coarse.size}) "
                    "don't tile or backend is not TPU"
                )
            fused_tiles = []
    # The XLA-scan/resumable paths: under DP the per-step Pallas RHS must be
    # OFF — it would lower a Mosaic custom call inside the GSPMD-sharded
    # jit, which GSPMD cannot partition (the sharded fused path above goes
    # through shard_map instead).
    if served is not None:
        # frozen StableHLO graph; its symbolic batch dim lets GSPMD shard
        # the exported call over the data axis with no special casing
        rhs = served.rhs_fn(forcing)
    else:
        rhs = model.rhs_fn(
            params, forcing, use_pallas=False if FLAGS.data_parallel else None
        )

    # NOTE: t0 is the PHYSICAL start time (warmup end) — the forcing phase
    # must continue across the warmup handoff. Keep the wall-clock timer in
    # a separate variable (a past version clobbered t0 here, feeding
    # perf_counter() seconds into the forcing phase).
    compile_s = 0.0
    advance = None
    if FLAGS.output_path:
        wall_start = time.perf_counter()
        times, traj = integrate.integrate_resumable(
            rhs, u0, dt, num_steps, save_every, FLAGS.output_path, t0=t0
        )
        jax.block_until_ready(traj)
        elapsed = time.perf_counter() - wall_start
    else:
        # AOT-compile outside the timed region: the one-time XLA/Mosaic
        # compile (~0.5-1 min for the fused kernel) would otherwise swamp
        # the throughput of short runs; it is reported separately. Fused
        # build/compile failures (e.g. VMEM overflow at a large tile,
        # DECISIONS.md #15e) fall back: smaller tile, then the XLA scan.
        compiled = None
        wall_start = time.perf_counter()
        for tile in fused_tiles:
            try:
                adv = model.fused_rk4_fn(
                    params, dt, save_every, batch_tile=tile, forcing=forcing,
                    mesh=mesh,
                )
                compiled = jax.jit(
                    lambda u, a=adv: integrate.integrate_fused(
                        a, u, dt, num_steps, save_every, t0=t0
                    )
                ).lower(u0).compile()
                advance = adv
                break
            except Exception as e:  # build or Mosaic-compile failure
                print(
                    f"fused kernel unavailable at batch_tile={tile} "
                    f"({type(e).__name__}: {str(e)[:200]})"
                )
        if compiled is None:
            if FLAGS.fused == "true":
                raise RuntimeError(
                    "--fused=true but the fused kernel failed to build/"
                    "compile at every batch tile"
                )
            compiled = jax.jit(
                lambda u: integrate.integrate(
                    rhs, u, dt, num_steps, save_every, t0=t0
                )
            ).lower(u0).compile()
        compile_s = time.perf_counter() - wall_start
        wall_start = time.perf_counter()
        times, traj = compiled(u0)
        jax.block_until_ready(traj)
        elapsed = time.perf_counter() - wall_start

    final = np.asarray(traj[-1])
    finite = np.isfinite(final).all(axis=-1)
    k, spectrum = analysis.energy_spectrum(final[finite], equation.period)
    path = "fused kernel" if advance is not None else (
        "resumable XLA scan" if FLAGS.output_path else "XLA scan"
    )
    if served is not None:
        path = "frozen artifact, " + path
    if FLAGS.data_parallel:
        path += f", dp={FLAGS.data_parallel}"
    print(
        f"{n} trajectories x {num_steps} RK4 steps (nx={coarse.size}) in "
        f"{elapsed:.1f}s = {n * num_steps / elapsed:,.0f} traj-steps/s/chip "
        f"[{path}, compile {compile_s:.1f}s]"
    )
    print(
        f"physical time window t=[{float(times[0]):.6f}, "
        f"{float(times[-1]):.6f}] (warmup handoff at t0={t0:.6f})"
    )
    print(
        f"finite: {int(finite.sum())}/{n} | final rms "
        f"{np.sqrt((final[finite] ** 2).mean()):.3f} | spectrum peak k="
        f"{k[np.argmax(spectrum[1:]) + 1]:.3f}"
    )


if __name__ == "__main__":
    app.run(main)
