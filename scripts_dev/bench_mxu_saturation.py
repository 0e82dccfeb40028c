"""MXU-saturation probe for the fused learned RK4 kernel.

The flagship (paper-default) tower has 32 channels, which fills only 32 of
the MXU's 128 rows and caps attainable bf16 throughput at ~49 TFLOPS on
v5e (RESULTS.md roofline). This probe benchmarks the SAME kernel with a
128-channel tower — the shape the hardware wants — to show the kernel
itself is not the bottleneck. Not a science config (filters=64 already
gave no accuracy gain, RESULTS.md); purely a hardware-utilization
demonstration.

Run: PYTHONPATH=/root/repo python scripts_dev/bench_mxu_saturation.py [filters...]

WARNING (2026-08-17): run ONE filters value per process, bounded with
`timeout 580`. An early version let the filters=64 tower request ~172 MB
of scoped VMEM (over the 128 MB physical budget); killing that hung Mosaic
compile wedged the chip for ~40 minutes (trivial XLA ops recovered first,
Mosaic compiles stayed hung longer) — the DECISIONS.md #15 wedge pattern.
The per-filters batch tiles below keep every config inside the budget.
filters=128 did NOT finish its Mosaic compile within 10 minutes even at a
VMEM-safe tile (compile cost grows super-linearly with tower width here);
do not attempt it unattended — measured results: 32ch 39 TFLOPS (80%% of
its 49-TFLOPS row cap), 64ch 101 TFLOPS (103%% of its 98-TFLOPS row cap,
i.e. AT the roofline).
"""

import time

import jax
import jax.numpy as jnp

from pde_superresolution_tpu import equations
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.models import ModelConfig, StencilModel

BATCH, FINE, FACTOR, STEPS = 256, 1024, 8, 100


def flops_per_step(model, nx):
    cfg = model.config
    c, k = cfg.filters, cfg.kernel_size
    frees = []
    sizes = []
    for d in sorted(model.constraint_layers):
        layer = model.constraint_layers[d]
        ns = getattr(layer, "nullspace", None)
        frees.append(ns.shape[0] if ns is not None else len(layer.offsets))
        sizes.append(len(layer.offsets))
    f_tot, s_tot = sum(frees), sum(sizes)
    per_lane = (
        2 * c * k
        + 2 * c * c * k * (cfg.num_layers - 1)
        + 2 * f_tot * c
        + 2 * s_tot * f_tot * 6  # HIGHEST projection ~ 6 bf16 passes
        + 2 * s_tot
    )
    return 4 * per_lane * BATCH * nx  # 4 RHS per RK4 step


def bench(filters, batch_tile):
    eq = equations.from_name("ks", conservative=True)
    coarse = Grid(FINE, eq.period).resample(FACTOR, conservative=True)
    model = StencilModel(
        eq, coarse, ModelConfig(stencil_size=6, filters=filters)
    )
    params = model.init_params(jax.random.PRNGKey(0))
    dt = eq.stable_time_step(coarse, u_scale=3.0)
    u0 = eq.initial_conditions(jax.random.PRNGKey(1), coarse, (BATCH,))
    adv = jax.jit(
        model.fused_rk4_fn(params, dt, STEPS, batch_tile=batch_tile)
    )
    adv(u0).block_until_ready()
    t0 = time.perf_counter()
    reps = 0
    u = u0
    while time.perf_counter() - t0 < 2.0:
        u = adv(u)
        reps += 1
    u.block_until_ready()
    sps = reps * STEPS / (time.perf_counter() - t0)
    tflops = sps * flops_per_step(model, coarse.size) / 1e12
    print(
        f"filters={filters:4d}: {sps:8,.0f} RK4 steps/s = {tflops:6.1f} "
        f"TFLOPS effective (bf16 peak ~197, "
        f"row-cap ~{197 * min(filters, 128) / 128:.0f})"
    )


if __name__ == "__main__":
    import sys
    # batch_tile shrinks as the tower grows so the live VMEM tiles
    # (bf16 conv stacks scale with K*filters*n) stay inside the 128 MiB
    # budget; grid programs over the batch serialize on-core, so smaller
    # tiles only cost per-program overhead, not parallelism
    configs = {32: 256, 64: 128, 128: 64}
    wanted = [int(a) for a in sys.argv[1:]] or list(configs)
    for filters in wanted:
        bench(filters, configs[filters])
        sys.stdout.flush()
