"""Benchmark: the north-star metric from BASELINE.md.

Measures coarse-grid RK4 steps/sec/chip for the flagship configuration —
the learned constrained-stencil KS model at 8x coarsening (fine 1024 ->
coarse 128), batched over an ensemble of trajectories — and compares
against the same jitted program on a single CPU device (the reference is a
single-CPU TF1 pipeline; BASELINE.md targets >50x that).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rk4_steps/s/chip", "vs_baseline": N,
   "detail": {...}}
vs_baseline = (best available TPU product path: the fused Mosaic kernel
when it wins, else the XLA scan) / (the same XLA-scan program on one CPU
device — the reference is a single-CPU pipeline). The TPU path in use is
printed on stderr, so the ratio's numerator is always identifiable.

Metrology (round-4 hardening — BENCH_r02→r03 drifted 23% with no code
change and nothing recorded to attribute it):
  * every leg reports its raw per-block samples, median, spread
    (IQR/median) and block duration inside ``detail`` — drift vs regression
    is now decidable from the JSON alone;
  * ``detail.chip_ref_matmul_ms`` times a fixed 4096^2 bf16 matmul — a
    program-independent chip-state marker: if IT moves between rounds, the
    chip/runtime changed, not the program;
  * the batch-256 headline is LATENCY-bound (RESULTS.md ablation: a 4-RHS
    RK4 step costs only ~1.3x one RHS at this batch); ``detail.throughput``
    adds the fused kernel at batch 4096 (tile 256, the measured-optimal
    ladder head), where the chip is filled — that row tracks the machine's
    actual ceiling;
  * the CPU denominator uses >=5 samples (was 3).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pde_superresolution_tpu import equations, integrate
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.models import ModelConfig, StencilModel

BATCH = 256
THROUGHPUT_BATCH = 4096
FINE = 1024
FACTOR = 8
INNER_STEPS = 100  # RK4 steps per timed device call


def build(fused: bool = False, use_pallas: bool | None = None,
          batch: int = BATCH, batch_tile: int | None = None):
    eq = equations.from_name("ks", conservative=True)
    coarse = Grid(FINE, eq.period).resample(FACTOR, conservative=True)
    model = StencilModel(eq, coarse, ModelConfig(stencil_size=6))
    params = model.init_params(jax.random.PRNGKey(0))
    dt = eq.stable_time_step(coarse, u_scale=3.0)
    u0 = eq.initial_conditions(jax.random.PRNGKey(1), coarse, (batch,))

    if fused:
        # whole-batch fused Mosaic kernel: all INNER_STEPS RK4 steps (conv
        # tower + constraint projection + stencil + flux divergence) stay in
        # VMEM (ops/pallas_kernels.make_fused_learned_rk4)
        return model.fused_rk4_fn(
            params, dt, INNER_STEPS, batch_tile=batch_tile or batch
        ), u0

    rhs = model.rhs_fn(params, use_pallas=use_pallas)

    def many_steps(u):
        def body(carry, _):
            u, t = carry
            return (integrate.rk4_step(rhs, u, t, dt), t + dt), None

        (u, _), _ = jax.lax.scan(body, (u, jnp.zeros((), u.dtype)), None,
                                 length=INNER_STEPS)
        return u

    return many_steps, u0


def _timed_blocks(fn, u0, num_samples: int, force_fetch: bool = False):
    """(samples steps/s, block_s, repeats) for a warmed jitted fn.

    ``force_fetch`` synchronizes by fetching a scalar to the host instead
    of ``block_until_ready`` — required for program shapes whose
    fetch-equality has NOT been verified on this stack (axon's
    block_until_ready can return before device completion; DECISIONS.md
    #15/#16). The RK4 legs at batch 256 are verified fetch-equal (12.5 ms
    blocked vs 12.9 ms fetched), so they keep the cheaper sync for
    round-over-round comparability; the batch-4096 throughput leg is a
    different compiled program and forces the fetch.
    """
    if force_fetch:
        sync = lambda a: float(a.ravel()[0])
    else:
        sync = lambda a: a.block_until_ready()
    u = fn(u0)
    sync(u)  # compile + warm up
    t0 = time.perf_counter()
    sync(fn(u0))
    once = time.perf_counter() - t0
    repeats = max(1, int(0.3 / max(once, 1e-4)))
    samples, blocks = [], []
    for _ in range(num_samples):
        t0 = time.perf_counter()
        for _ in range(repeats):
            u = fn(u)
        sync(u)
        wall = time.perf_counter() - t0
        blocks.append(wall)
        samples.append(repeats * INNER_STEPS / wall)
    if not bool(jnp.isfinite(u).all()):
        print("WARNING: non-finite state at end of benchmark", file=sys.stderr)
    return samples, float(np.median(blocks)), repeats


def _detail(samples, block_s, repeats, batch: int = BATCH):
    med = float(np.median(samples))
    q1, q3 = np.percentile(samples, [25, 75])
    return {
        "median": round(med, 1),
        "samples": [round(s, 1) for s in samples],
        "iqr_over_median_pct": round(100.0 * (q3 - q1) / med, 2),
        "block_s": round(block_s, 4),
        "repeats_per_block": repeats,
        "batch": batch,
    }


def steps_per_sec(device, fused: bool = False, num_samples: int = 5,
                  batch: int = BATCH, batch_tile: int | None = None,
                  force_fetch: bool = False):
    """(median steps/s, detail dict) over ``num_samples`` timed blocks.

    A single-sample measurement of the XLA scan swings ~20% run to run on
    this chip while the fused kernel is stable — a one-shot pairing can
    flatter either path by that much. The median of >=5 blocks (each sized
    to ~0.3 s of device time) is reproducible to a few percent, and the
    printed fused/XLA ratio always comes from the SAME invocation.
    """
    # rhs_fn(use_pallas=None) keys off jax.default_backend(), which stays
    # "tpu" even under jax.default_device(cpu) — force pure XLA off-TPU.
    use_pallas = None if device.platform == "tpu" else False
    with jax.default_device(device):
        many_steps, u0 = build(fused=fused, use_pallas=use_pallas,
                               batch=batch, batch_tile=batch_tile)
        fn = jax.jit(many_steps)
        u0 = jax.device_put(u0, device)
        samples, block_s, repeats = _timed_blocks(
            fn, u0, num_samples, force_fetch=force_fetch
        )
    return float(np.median(samples)), _detail(samples, block_s, repeats, batch)


def chip_ref_matmul_ms(device, num_samples: int = 5, length: int = 50):
    """Program-independent chip-state marker: a scan of 4096^2 bf16 matmuls.

    Reported in detail so round-over-round drift in the PROGRAM legs can be
    attributed: if this marker moved too, the chip/runtime changed.

    Two measured-on-this-stack pitfalls shape the design: (a) chained
    per-call dispatches over the axon tunnel pipeline without backpressure,
    so the matmuls live in ONE jitted lax.scan; (b) ``block_until_ready``
    returns BEFORE device completion for this program shape (timed 0.1 ms
    vs the real ~52 ms), so the timing forces a scalar host fetch. (The RK4
    legs are fetch-equal — verified: 12.5 ms blocked vs 12.9 ms fetched —
    so their cheaper sync stands.)
    """
    n = 4096
    a = jax.random.normal(jax.random.PRNGKey(2), (n, n)).astype(jnp.bfloat16)
    a = a * jnp.bfloat16(1.0 / n**0.5)

    @jax.jit
    def marker(x):
        def body(c, _):
            c = c @ c
            # renormalize so the chain neither overflows nor denormalizes
            c = c * jax.lax.rsqrt((c * c).mean().astype(jnp.float32)).astype(
                c.dtype
            )
            return c, None

        c, _ = jax.lax.scan(body, x, None, length=length)
        return (c.astype(jnp.float32) ** 2).mean()

    with jax.default_device(device):
        float(marker(a))  # compile + warm
        samples = []
        for _ in range(num_samples):
            t0 = time.perf_counter()
            float(marker(a))  # the fetch IS the synchronization
            samples.append((time.perf_counter() - t0) / length * 1e3)
    med = float(np.median(samples))
    return {
        "median_ms": round(med, 3),
        "samples_ms": [round(s, 3) for s in samples],
        "tflops": round(2 * n**3 / (med * 1e-3) / 1e12, 1),
    }


def main():
    detail = {}
    tpu = jax.devices()[0]
    if tpu.platform == "tpu":
        detail["chip_ref_matmul"] = chip_ref_matmul_ms(tpu)
        print(f"chip marker: 4096^2 bf16 matmul "
              f"{detail['chip_ref_matmul']['median_ms']} ms", file=sys.stderr)

    tpu_xla, detail["xla"] = steps_per_sec(tpu)
    print(f"TPU ({tpu.device_kind}) XLA scan: {tpu_xla:,.0f} RK4 steps/s "
          f"(batch={BATCH}, nx={FINE//FACTOR}, "
          f"iqr {detail['xla']['iqr_over_median_pct']}%)", file=sys.stderr)
    tpu_sps = tpu_xla
    if tpu.platform == "tpu":
        try:
            tpu_fused, detail["fused"] = steps_per_sec(tpu, fused=True)
            detail["ratio_fused_vs_xla"] = round(tpu_fused / tpu_xla, 3)
            print(f"TPU fused learned-RK4 kernel: {tpu_fused:,.0f} RK4 steps/s "
                  f"({tpu_fused / tpu_xla:.2f}x XLA, "
                  f"iqr {detail['fused']['iqr_over_median_pct']}%)",
                  file=sys.stderr)
            tpu_sps = max(tpu_sps, tpu_fused)
        except Exception as e:
            print(f"fused kernel unavailable ({e}); using XLA path",
                  file=sys.stderr)
        try:
            # throughput-optimal row: batch 4096 fills the latency bubbles
            # the batch-256 headline leaves (RESULTS.md ablation); tile 256
            # is the measured-optimal ladder head (DECISIONS.md #15)
            thr, d = steps_per_sec(
                tpu, fused=True, batch=THROUGHPUT_BATCH, batch_tile=256,
                force_fetch=True,  # fetch-equality unverified at this shape
            )
            d["traj_steps_per_s"] = round(thr * THROUGHPUT_BATCH, 0)
            detail["throughput_fused_b4096"] = d
            print(f"TPU fused batch-{THROUGHPUT_BATCH} throughput: "
                  f"{thr * THROUGHPUT_BATCH:,.0f} traj-steps/s "
                  f"({thr:,.0f} steps/s)", file=sys.stderr)
        except Exception as e:
            print(f"throughput row unavailable ({e})", file=sys.stderr)
    try:
        cpu = jax.devices("cpu")[0]
        cpu_sps, detail["cpu"] = steps_per_sec(cpu, num_samples=5)
        print(f"CPU: {cpu_sps:,.0f} RK4 steps/s "
              f"(iqr {detail['cpu']['iqr_over_median_pct']}%)", file=sys.stderr)
        vs = tpu_sps / cpu_sps
    except Exception as e:  # no CPU backend available
        print(f"CPU baseline unavailable ({e}); vs_baseline=null", file=sys.stderr)
        vs = None
    print(json.dumps({
        "metric": f"KS 8x learned-model coarse RK4 steps/sec/chip (batch {BATCH})",
        "value": round(tpu_sps, 1),
        "unit": "rk4_steps/s/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
