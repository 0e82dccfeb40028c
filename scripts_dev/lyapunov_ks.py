"""Leading Lyapunov exponent of KS (L=64) — put the 32x plateau in physical units.

RESULTS.md establishes that KS at 32x coarsening saturates at ~37 time
units of median valid horizon regardless of training knobs (unroll,
width, accuracy order, scale, training length), while the unrolled eval
loss keeps falling, and that no classical scheme is even stable on that
grid (the spectral-on-coarse-grid control diverges). The claimed
mechanism is chaos: the filtered field's predictability horizon, not the
closure's quality. This probe makes that quantitative by measuring the
attractor's leading Lyapunov exponent lambda_1 with the standard
Benettin renormalization method (two ETDRK4 solutions kept a small
distance apart, renormalized every interval, lambda_1 = mean log growth
rate), entirely on device: the chunk loop, both spectral solves and the
renormalization live in one jitted lax.scan.

The connection: an initial filtered-field error of relative size e0
decorrelates (correlation 0.8 ~ relative L2 error sqrt(2*(1-0.8)) ~ 0.63)
after t ~ ln(0.63/e0)/lambda_1. Inverting at the observed plateau gives
the implied e0 the learned closure achieves; the plateau is "physics" if
that e0 is plausibly the best a 32-point filtered representation can do.

Run (TPU, ~10 s device time):
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts_dev/lyapunov_ks.py
"""

import json

import numpy as np
from absl import app, flags

import jax
import jax.numpy as jnp

from pde_superresolution_tpu import equations, integrate
from pde_superresolution_tpu.grids import Grid

FLAGS = flags.FLAGS

flags.DEFINE_integer("fine_size", 1024, "grid points for the reference solve")
flags.DEFINE_integer("batch", 8, "independent trajectories (ensemble mean)")
flags.DEFINE_float("warmup_time", 44.0, "attractor warmup (matches evals)")
flags.DEFINE_float("align_time", 20.0,
                   "initial chunks discarded while the perturbation aligns "
                   "with the leading Lyapunov vector")
flags.DEFINE_float("total_time", 400.0, "measurement window after alignment")
flags.DEFINE_float("renorm_interval", 1.0, "time between renormalizations")
flags.DEFINE_float("d0", 1e-4,
                   "perturbation size relative to rms(u); must sit well "
                   "above float32 rounding (~1e-7) and well below O(1)")
flags.DEFINE_integer("seed", 0, "ensemble seed")
flags.DEFINE_list("plateaus", ["36.7", "40.25"],
                  "observed KS-32x survival plateaus to express in "
                  "Lyapunov units (sweep-protocol best / ckpt_ks32)")


def main(argv):
    del argv
    eq = equations.from_name("ks")
    grid = Grid(FLAGS.fine_size, eq.period)
    dt = 0.2 * grid.dx  # DECISIONS.md #5 fine-step convention
    steps_per_chunk = max(1, round(FLAGS.renorm_interval / dt))
    chunk_t = steps_per_chunk * dt
    num_chunks = int(np.ceil((FLAGS.align_time + FLAGS.total_time) / chunk_t))
    skip = int(np.ceil(FLAGS.align_time / chunk_t))

    key = jax.random.PRNGKey(FLAGS.seed)
    k_ic, k_d = jax.random.split(key)
    u0 = eq.initial_conditions(k_ic, grid, (FLAGS.batch,))
    steps_w = int(np.ceil(FLAGS.warmup_time / dt))
    _, warm = integrate.integrate_spectral(
        eq, grid, u0, dt, steps_w, save_every=steps_w
    )
    u0 = warm[-1]
    rms = float(jnp.sqrt(jnp.mean(u0**2)))

    stepper = integrate.SpectralETDRK4.create(eq, grid, dt)
    d0_abs = FLAGS.d0 * rms * np.sqrt(grid.size)  # L2-norm target

    @jax.jit
    def benettin(u0, delta0):
        v = jnp.fft.rfft(u0)
        w = jnp.fft.rfft(u0 + delta0)

        def inner(carry, _):
            v, w, t = carry
            return (stepper.step_hat(v, t), stepper.step_hat(w, t), t + dt), None

        def chunk(carry, _):
            (v, w, t), _ = jax.lax.scan(
                inner, carry, None, length=steps_per_chunk
            )
            diff = jnp.fft.irfft(w - v, n=grid.size)
            d = jnp.linalg.norm(diff, axis=-1, keepdims=True)  # [batch, 1]
            growth = jnp.log(d[:, 0] / d0_abs)
            # renormalize the pair back to separation d0 along the current
            # (aligned) direction, exactly in real space
            w = jnp.fft.rfft(
                jnp.fft.irfft(v, n=grid.size) + diff * (d0_abs / d)
            )
            return (v, w, t), growth

        (_, _, _), growths = jax.lax.scan(
            chunk, (v, w, jnp.zeros((), u0.dtype)), None, length=num_chunks
        )
        return growths  # [num_chunks, batch]

    delta0 = jax.random.normal(k_d, u0.shape, u0.dtype)
    delta0 = delta0 * (
        d0_abs / jnp.linalg.norm(delta0, axis=-1, keepdims=True)
    )
    growths = np.asarray(benettin(u0, delta0))
    lam_per_member = growths[skip:].mean(axis=0) / chunk_t  # [batch]
    lam = float(lam_per_member.mean())
    lam_std = float(lam_per_member.std())

    e_dec = np.sqrt(2 * (1 - 0.8))  # relative L2 error at correlation 0.8
    # Unresolved-scale level: the relative rms of what an N-point grid's
    # 2/3-dealiased band cannot represent at all — the floor on any coarse
    # representation's "initial error" for the predictability estimate.
    u_hat = np.fft.rfft(np.asarray(warm[-1], np.float64), axis=-1)
    energy = np.abs(u_hat) ** 2
    energy[..., 1:-1] *= 2  # one-sided counting
    unresolved = {}
    for factor in (8, 16, 32):
        n_c = FLAGS.fine_size // factor
        k_keep = (2 * (n_c // 2)) // 3  # modes a dealiased n_c-grid carries
        frac = energy[..., k_keep + 1:].sum() / energy.sum()
        unresolved[str(factor)] = float(np.sqrt(frac))
    out = {
        "equation": "ks",
        "period": float(eq.period),
        "fine_size": FLAGS.fine_size,
        "lambda1": lam,
        "lambda1_std_over_members": lam_std,
        "lyapunov_time": 1.0 / lam,
        "measurement_time_units": FLAGS.total_time,
        "batch": FLAGS.batch,
        "unresolved_scale_rel_rms_by_factor": unresolved,
        "plateaus": {
            p: {
                "lyapunov_times": float(p) * lam,
                "implied_initial_rel_error": float(
                    e_dec * np.exp(-lam * float(p))
                ),
            }
            for p in FLAGS.plateaus
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    app.run(main)
