"""Minimal repro ladder for the axon Mosaic forcing-input hang.

DECISIONS.md #15: launching ops/pallas_kernels.make_fused_rhs with
``forced=True`` (an extra forcing-field input) hangs DETERMINISTICALLY at
kernel runtime on this environment's axon TPU backend (interpret mode is
fine), and can wedge the chip for minutes. This script isolates the
trigger with a ladder of ever-closer probes, each wrapped in a subprocess
with a hard timeout so a hang cannot wedge the parent or block the ladder.

Run ON the real chip (not under tests/conftest.py):

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts_dev/repro_forcing_hang.py

Each rung prints PASS / HANG / CRASH. The first HANG is the minimal repro.
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PREAMBLE = """
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
B, NX = 16, 128
u = jax.random.normal(jax.random.PRNGKey(0), (B, NX))
f = jax.random.normal(jax.random.PRNGKey(1), (B, NX))
c = jax.random.normal(jax.random.PRNGKey(2), (6, B, NX))
spec = pl.BlockSpec(memory_space=pltpu.VMEM)
"""

RUNGS = {
    # 1: two plain [B, nx] inputs, elementwise add
    "two_inputs_add": """
def k(u_ref, f_ref, o_ref):
    o_ref[...] = u_ref[...] + f_ref[...]
out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((B, NX), jnp.float32),
    in_specs=[spec]*2, out_specs=spec)(u, f)
out.block_until_ready()
""",
    # 2: stacked coeffs + u (the unforced fused-RHS input signature)
    "coeffs_and_u": """
def k(u_ref, c_ref, o_ref):
    acc = None
    for s in range(6):
        t = pltpu.roll(u_ref[...], s % NX, axis=1) * c_ref[s]
        acc = t if acc is None else acc + t
    o_ref[...] = acc
out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((B, NX), jnp.float32),
    in_specs=[spec]*2, out_specs=spec)(u, c)
out.block_until_ready()
""",
    # 3: coeffs + u + forcing (the HANGING signature, minimal body)
    "coeffs_u_and_forcing": """
def k(u_ref, c_ref, f_ref, o_ref):
    acc = f_ref[...]
    for s in range(6):
        acc = acc + pltpu.roll(u_ref[...], s % NX, axis=1) * c_ref[s]
    o_ref[...] = acc
out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((B, NX), jnp.float32),
    in_specs=[spec]*3, out_specs=spec)(u, c, f)
out.block_until_ready()
""",
    # 4: the real library kernel, forced=True (round-1 deterministic hang)
    "library_fused_rhs_forced": """
from pde_superresolution_tpu import equations
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.models import ModelConfig, StencilModel
from pde_superresolution_tpu.ops import pallas_kernels as pk
eq = equations.from_name("burgers", conservative=True)
grid = Grid(NX, eq.period)
model = StencilModel(eq, grid, ModelConfig(stencil_size=6))
params = model.init_params(jax.random.PRNGKey(0))
coeffs = model.coefficients(params, u)
offsets = {d: l.offsets for d, l in model.constraint_layers.items()}
rhs = pk.make_fused_rhs(eq, grid, offsets, model._shift, forced=True)
out = rhs(u, coeffs, f)
out.block_until_ready()
""",
}


def run_rung(name: str, body: str, timeout: int = 120) -> str:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    code = PREAMBLE + textwrap.dedent(body) + "\nprint('RUNG_OK')\n"
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            env=env,
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return "HANG"
    if proc.returncode != 0:
        return f"CRASH rc={proc.returncode}: {proc.stderr[-300:]}"
    return "PASS" if "RUNG_OK" in proc.stdout else f"ODD: {proc.stdout[-200:]}"


def main():
    for name, body in RUNGS.items():
        result = run_rung(name, body)
        print(f"{name}: {result}", flush=True)
        if result == "HANG":
            print(
                "minimal repro found — the chip may be wedged for a few "
                "minutes; later rungs skipped.",
                flush=True,
            )
            break


if __name__ == "__main__":
    main()
