"""Fused Mosaic-TPU (Pallas) kernels for the stencil hot loop.

SURVEY.md §2.2/§7-stage-6: the per-step hot path — patch extract +
coefficient contraction + flux divergence (+ RK4 stage combine) — fused into
hand-written kernels:

  * ``make_fused_rhs``: one kernel per RHS evaluation for *learned*
    (spatially-varying) coefficients: all derivative contractions, the flux
    divergence / equation of motion, and the forcing add happen in VMEM;
    only u, the coefficients and u_t touch HBM.
  * ``make_fused_rk4``: a whole *multi-step* RK4 integration for *fixed*
    (baseline) stencils in ONE kernel: the classic coefficients are baked in
    as immediates and the state lives in VMEM across every stage of every
    step — zero HBM round trips between steps. This is the speed-of-light
    version of the baseline/eval integration path.

Layout notes (pallas_guide.md): the spatial axis is the lane axis (multiples
of 128); the trajectory batch spans the sublane axis. The default tiling is
the WHOLE batch in one program: the TPU executes Pallas grid iterations
sequentially on the core, so splitting the batch across the grid serializes
it (measured: batch_tile=8 runs ~10x slower than whole-batch on v5e).
Measured on v5e (KS 8x, batch 256): the fused multi-step kernel matches the
XLA-fused scan bit-for-bit and runs within ~3%% of it (3.87M vs 3.97M RK4
steps/s) — XLA's elementwise fusion is already near the VPU roofline here,
so the kernels are kept as an equivalence-tested alternative path and for
future fusion work (bf16 stages, multi-equation batching), not as the
default. Periodic shifts are ``pltpu.roll`` on the lane
axis — no gathers, no halos on a single chip. Spatially-varying coefficients
are passed stacked as ``[stencil, batch, nx]`` so every block is a clean
(sublane, lane) tile; the tap loop is unrolled at trace time.

Each kernel has a pure-XLA twin (stencils.apply_stencil / integrate.rk4_step)
and the tests require exact agreement (same op order, same dtype).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pde_superresolution_tpu import stencils
from pde_superresolution_tpu.equations import Equation
from pde_superresolution_tpu.grids import Grid

LANE = 128
SUBLANE = 8


def _roll(u, shift: int, axis: int = 1):
    """jnp.roll semantics on TPU tiles (pltpu.roll wants shift >= 0)."""
    n = u.shape[axis]
    s = shift % n
    if s == 0:
        return u
    return pltpu.roll(u, s, axis=axis)


def _int_taps(offsets: Sequence[float], shift: float) -> list[int]:
    taps = np.asarray(offsets, dtype=np.float64) - shift
    int_taps = np.round(taps).astype(int)
    if not np.allclose(taps, int_taps, atol=1e-9):
        raise ValueError(f"offsets {offsets} with shift {shift} off-grid")
    return [int(t) for t in int_taps]


def kernel_supported(batch: int, nx: int) -> bool:
    """Whether shapes map cleanly onto (sublane, lane) tiles."""
    return batch % SUBLANE == 0 and nx % LANE == 0


def make_fused_rhs(
    equation: Equation,
    grid: Grid,
    offsets_map: Mapping[int, Sequence[float]],
    shift: float,
    forced: bool,
    batch_tile: int | None = None,
    interpret: bool = False,
):
    """Fused RHS for spatially-varying coefficients.

    Returns ``rhs(u, coeffs, f) -> u_t`` where
      u: [batch, nx]
      coeffs: {order: [batch, nx, stencil]} (the model's layout; transposed
        to [stencil, batch, nx] tiles internally)
      f: [batch, nx] precomputed forcing field or None.

    The derivative orders and stencil taps are static; the tap loops unroll
    into VPU multiply-adds on VMEM-resident tiles.
    """
    orders = sorted(offsets_map)
    taps_map = {d: _int_taps(offsets_map[d], shift) for d in orders}
    conservative = equation.conservative
    dx = grid.dx

    def kernel(*refs):
        u_ref = refs[0]
        c_refs = refs[1 : 1 + len(orders)]
        f_ref = refs[1 + len(orders)] if forced else None
        out_ref = refs[-1]
        u = u_ref[...]
        vals = {}
        for d, c_ref in zip(orders, c_refs):
            acc = None
            for s, t in enumerate(taps_map[d]):
                shifted = _roll(u, -t)
                term = c_ref[s] * shifted
                acc = term if acc is None else acc + term
            vals[d] = acc
        if conservative:
            flux = equation.flux(vals)
            u_t = -(flux - _roll(flux, 1)) / dx
        else:
            u_t = equation.equation_of_motion(u, vals)
        if f_ref is not None:
            u_t = u_t + f_ref[...]
        out_ref[...] = u_t

    def rhs(u: jnp.ndarray, coeffs: Mapping[int, jnp.ndarray],
            f: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        batch, nx = u.shape
        if not kernel_supported(batch, nx):
            raise ValueError(
                f"shapes ({batch}, {nx}) not tileable; need batch%{SUBLANE}==0"
                f" and nx%{LANE}==0 (use the XLA path instead)"
            )
        tb = min(batch_tile or batch, batch)
        grid_size = batch // tb
        in_specs = [
            pl.BlockSpec((tb, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        inputs = [u]
        for d in orders:
            s = len(taps_map[d])
            c = jnp.moveaxis(coeffs[d], -1, 0)  # [S, batch, nx]
            inputs.append(c)
            in_specs.append(
                pl.BlockSpec(
                    (s, tb, nx), lambda i: (0, i, 0), memory_space=pltpu.VMEM
                )
            )
        if forced:
            if f is None:
                raise ValueError("forcing field required (forced=True)")
            inputs.append(f.astype(u.dtype))
            in_specs.append(
                pl.BlockSpec((tb, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
            )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
            grid=(grid_size,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (tb, nx), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(*inputs)

    return rhs


def make_fused_rk4(
    equation: Equation,
    grid: Grid,
    dt: float,
    num_steps: int,
    accuracy_order: int = 2,
    stencil_size: int | None = None,
    batch_tile: int | None = None,
    interpret: bool = False,
):
    """Whole multi-step RK4 integration of the FIXED-stencil baseline scheme
    in one kernel: state stays in VMEM for all ``num_steps`` steps.

    Unforced equations only (KdV/KS; the bench target). The classic
    coefficients are compile-time immediates — zero coefficient memory
    traffic. Returns ``advance(u) -> u_after_num_steps``.
    """
    if equation.forced:
        raise ValueError("fused RK4 kernel supports unforced equations only")
    staggered = equation.conservative
    shift = -0.5 if staggered else 0.0
    method = (
        stencils.Method.FINITE_VOLUMES
        if staggered
        else stencils.Method.FINITE_DIFFERENCES
    )
    from pde_superresolution_tpu.integrate import baseline_stencil_size

    taps_map: dict[int, list[int]] = {}
    coef_map: dict[int, list[float]] = {}
    for d in equation.derivative_orders:
        size = stencil_size or baseline_stencil_size(d, accuracy_order, staggered)
        offs = stencils.stencil_offsets(size, staggered=staggered)
        coefs = stencils.coefficients(offs, method, d, None, dx=grid.dx)
        taps_map[d] = _int_taps(offs, shift)
        coef_map[d] = [float(c) for c in coefs]
    dx = grid.dx
    orders = sorted(taps_map)

    def rhs_local(u):
        vals = {}
        for d in orders:
            acc = None
            for c, t in zip(coef_map[d], taps_map[d]):
                shifted = _roll(u, -t)
                term = np.float32(c) * shifted
                acc = term if acc is None else acc + term
            vals[d] = acc
        if equation.conservative:
            flux = equation.flux(vals)
            return -(flux - _roll(flux, 1)) / dx
        return equation.equation_of_motion(u, vals)

    def kernel(u_ref, out_ref):
        def step(_, u):
            k1 = rhs_local(u)
            k2 = rhs_local(u + (0.5 * dt) * k1)
            k3 = rhs_local(u + (0.5 * dt) * k2)
            k4 = rhs_local(u + dt * k3)
            return u + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

        out_ref[...] = jax.lax.fori_loop(0, num_steps, step, u_ref[...])

    def advance(u: jnp.ndarray) -> jnp.ndarray:
        batch, nx = u.shape
        if not kernel_supported(batch, nx):
            raise ValueError(
                f"shapes ({batch}, {nx}) not tileable for the fused kernel"
            )
        tb = min(batch_tile or batch, batch)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
            grid=(batch // tb,),
            in_specs=[
                pl.BlockSpec((tb, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (tb, nx), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(u)

    return advance
