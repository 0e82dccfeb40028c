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
# v5e physical VMEM. A Mosaic compile whose scoped-VMEM request exceeds it
# does NOT fail cleanly: it can hang and wedge the chip for ~40 min
# (DECISIONS.md #15, observed 2026-08-17 with a filters=64 whole-batch
# tile). Kernels must pre-screen their estimate against this budget and
# refuse BEFORE compiling.
PHYSICAL_VMEM_BYTES = 128 * 1024 * 1024


def _roll(u, shift: int, axis: int = 1):
    """jnp.roll semantics on TPU tiles (pltpu.roll wants shift >= 0).

    bf16 goes through jnp.roll: pltpu.roll on a bfloat16 operand crashes
    this environment's Mosaic compiler (tpu_compile_helper exit 1, isolated
    to exactly this op+dtype combination on 2026-08 axon libtpu); jnp.roll
    lowers correctly for every dtype.
    """
    n = u.shape[axis]
    s = shift % n
    if s == 0:
        return u
    if u.dtype == jnp.float32:
        return pltpu.roll(u, s, axis=axis)
    return jnp.roll(u, s, axis=axis)


def _int_taps(offsets: Sequence[float], shift: float) -> list[int]:
    taps = np.asarray(offsets, dtype=np.float64) - shift
    int_taps = np.round(taps).astype(int)
    if not np.allclose(taps, int_taps, atol=1e-9):
        raise ValueError(f"offsets {offsets} with shift {shift} off-grid")
    return [int(t) for t in int_taps]


def kernel_supported(batch: int, nx: int) -> bool:
    """Whether shapes map cleanly onto (sublane, lane) tiles."""
    return batch % SUBLANE == 0 and nx % LANE == 0


def _rhs_vmem_bytes(
    tb: int, nx: int, n_tap_arrays: int, forced: bool, buffers: int,
    itemsize: int,
) -> int:
    """Scoped-VMEM estimate for one fused-RHS grid step at batch tile ``tb``.

    I/O blocks live per step: u, one [tb, nx] row per stencil tap, the
    forcing field, and the output; Mosaic double-buffers pipelined blocks
    (``buffers=2`` when grid > 1). A 1.5x factor covers Mosaic temporaries
    (the tap-shift/accumulate intermediates); it bounded the observed
    Mosaic allocation from above at every shape measured (e.g. batch
    10240, nx 128, 24 taps, forced: estimate 212 MiB single-buffered vs
    Mosaic's reported 111 MiB request; batch 1024 same kernel: estimate
    21 MiB vs the known-fitting <16 MiB actual).
    """
    n_arrays = 1 + n_tap_arrays + (1 if forced else 0) + 1
    io_bytes = buffers * n_arrays * tb * nx * itemsize
    return int(1.5 * io_bytes)


def _auto_rhs_tile(
    batch: int, nx: int, n_tap_arrays: int, forced: bool, itemsize: int,
) -> int | None:
    """Largest batch tile whose fused-RHS VMEM estimate fits the budget.

    Whole-batch (grid=1, single-buffered — the measured-fast layout, grid
    iterations serialize on-core per DECISIONS.md #15) wins whenever it
    fits; otherwise the largest SUBLANE-multiple divisor of ``batch``
    whose double-buffered estimate stays under half the physical VMEM.
    None when even a SUBLANE-row tile cannot fit (refuse before compiling:
    an over-budget Mosaic compile can wedge the chip, DECISIONS.md #15).
    """
    budget = PHYSICAL_VMEM_BYTES // 2
    if _rhs_vmem_bytes(batch, nx, n_tap_arrays, forced, 1, itemsize) <= budget:
        return batch
    per_row = _rhs_vmem_bytes(1, nx, n_tap_arrays, forced, 2, itemsize)
    tb = budget // per_row // SUBLANE * SUBLANE
    tb = min(tb, batch)
    while tb >= SUBLANE:
        if batch % tb == 0:
            return int(tb)
        tb -= SUBLANE
    return None


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

    def kernel_call(u: jnp.ndarray, coeffs: Mapping[int, jnp.ndarray],
                    f: Optional[jnp.ndarray]) -> jnp.ndarray:
        batch, nx = u.shape
        if not kernel_supported(batch, nx):
            raise ValueError(
                f"shapes ({batch}, {nx}) not tileable; need batch%{SUBLANE}==0"
                f" and nx%{LANE}==0 (use the XLA path instead)"
            )
        n_tap_arrays = sum(len(taps_map[d]) for d in orders)
        itemsize = u.dtype.itemsize
        if batch_tile is not None:
            tb = min(batch_tile, batch)
        else:
            # whole-batch when it fits VMEM, else tile the batch (the
            # kernel is elementwise over rows, so tiling is exact); found
            # the hard way at batch 10240: the untiled block wants 141 MiB
            # of scoped VMEM and the Mosaic compile fails (or worse,
            # wedges the chip — DECISIONS.md #15)
            tb = _auto_rhs_tile(batch, nx, n_tap_arrays, forced, itemsize)
            if tb is None:
                raise ValueError(
                    f"fused RHS cannot fit VMEM at any batch tile for "
                    f"shapes ({batch}, {nx}) with {n_tap_arrays} tap "
                    f"arrays; use the XLA path (use_pallas=False)"
                )
        grid_size = batch // tb
        vmem_bytes = _rhs_vmem_bytes(
            tb, nx, n_tap_arrays, forced, 2 if grid_size > 1 else 1, itemsize
        )
        if not interpret and vmem_bytes > PHYSICAL_VMEM_BYTES:
            # refuse BEFORE compiling (explicit batch_tile can overshoot)
            raise ValueError(
                f"fused RHS at batch_tile={tb}, nx={nx} needs "
                f"~{vmem_bytes >> 20} MiB VMEM > "
                f"{PHYSICAL_VMEM_BYTES >> 20} MiB physical; smaller tile"
            )
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
        kwargs = {}
        if vmem_bytes > 16 * 1024 * 1024:
            # the Mosaic scoped-VMEM stack defaults to 16 MiB
            # (DECISIONS.md #15e); raise it to the estimate — shapes whose
            # estimate fits the default compile with an UNCHANGED config
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=min(
                    16 * 1024 * 1024 + vmem_bytes, PHYSICAL_VMEM_BYTES
                )
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
            **kwargs,
        )(*inputs)

    def xla_twin(u, coeffs, f):
        """The same math in plain XLA — the kernel's differentiation twin."""
        derivs = {
            d: stencils.apply_stencil(u, coeffs[d], offsets_map[d], shift)
            for d in orders
        }
        if conservative:
            flux = equation.flux(derivs)
            u_t = -(flux - jnp.roll(flux, 1, axis=-1)) / dx
        else:
            u_t = equation.equation_of_motion(u, derivs)
        if forced:
            u_t = u_t + f
        return u_t

    # Differentiable wrapper (SURVEY §7 stages 4+6: the training rollout is
    # the same hot loop). The Mosaic kernel has no differentiation rule, so
    # the VJP is the XLA twin's: forward runs the kernel, backward
    # linearizes the twin at the same primal point — identical math modulo
    # accumulation order (the two agree to float tolerance), so the
    # gradients match the pure-XLA path's to the same tolerance. Residuals
    # are just the primal inputs; under jax.checkpoint the kernel (not the
    # twin) is what re-runs in the rematerialized forward.
    @jax.custom_vjp
    def rhs_grad(u, coeffs, f):
        return kernel_call(u, coeffs, f)

    def rhs_fwd(u, coeffs, f):
        return kernel_call(u, coeffs, f), (u, coeffs, f)

    def rhs_bwd(res, g):
        _, vjp = jax.vjp(xla_twin, *res)
        return vjp(g)

    rhs_grad.defvjp(rhs_fwd, rhs_bwd)

    def rhs(u: jnp.ndarray, coeffs: Mapping[int, jnp.ndarray],
            f: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        return rhs_grad(u, dict(coeffs), f)

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


def make_fused_learned_rk4(
    equation: Equation,
    grid: Grid,
    kernel_size: int,
    taps_map: Mapping[int, Sequence[int]],
    scale_map: Mapping[int, float],
    c0_map: Mapping[int, np.ndarray],
    nullspace_map: Mapping[int, Optional[np.ndarray]],
    dt: float,
    num_steps: int,
    batch_tile: int = 128,
    interpret: bool = False,
):
    """Whole multi-step RK4 integration of the LEARNED model in one kernel.

    SURVEY.md §7 stage 6: "beating plain XLA fusion requires fusing across
    RK4 stages, not just within one RHS". This kernel keeps the state, every
    conv-tower activation, the constrained coefficients, and all four RK4
    stage vectors in VMEM for all ``num_steps`` steps — the only HBM traffic
    is the initial state, the (tiny) weights, and the final state.

    Layout — X-MAJOR lane flattening. Each (batch_tile, nx) block is one
    lane row ``n = x * batch_tile + b``, so

      * a periodic spatial shift by ``t`` cells is one whole-row lane roll
        by ``t * batch_tile`` (the wrap at the row end wraps x periodically
        with b unchanged — exactly the periodic boundary), and
      * activations are plain 2-D ``[channels, nx*batch_tile]`` tiles and
        every matmul is a clean 2-D MXU ``dot_general``. (The natural
        ``[C, batch, nx]`` 3-D layout lowers, but Mosaic's compile time
        grows ~1.5x PER chained 3-D dot — 84 dots in an RK4 body never
        finishes. 2-D dots compile linearly. Measured on v5e.)

    MXU packing: every conv layer is ONE matmul — the rolled input copies
    are stacked along the contraction axis (``[K*Cin, n]``, K*Cin=160 for
    the paper tower vs 32 unpacked, so the systolic array's contraction
    dimension is actually filled); the per-order heads are merged into one
    ``[sum(free), C]`` matmul and the constraint projections into one
    block-diagonal ``[sum(S), sum(free)]`` matmul (scale folded in).

    The projection runs at Precision.HIGHEST like the XLA twin
    (stencils.PolynomialAccuracy); the tower runs at the TPU default (bf16
    inputs, f32 accumulate) like the XLA twin's convs, so agreement with
    the XLA path is to float tolerance, not bitwise.

    FORCED equations (Burgers): the sum-of-sinusoids forcing
    ``f = sum_m A_m sin(omega_m t + kappa_m x + phi_m)`` is evaluated
    in-kernel with zero per-stage transcendentals — the per-term
    (sin, cos) phase tiles are carried through the ``fori_loop`` and
    advanced by dt/2 per RK4 half-stage with a precomputed planar rotation
    (angle addition: ``sin(th+d) = sin th cos d + cos th sin d``), so each
    stage's forcing is one FMA reduction over the ~20 terms. The rotation
    accumulates ~1 ulp of phase error per half-step (2e-5 relative after
    100 steps) — far below the tower's bf16 rounding. Conservative
    equations get the exact cell-averaged forcing (the sinc amplitude
    factor, equations.forcing_term) baked into the amplitude tile.

    Returns ``advance(u [batch, nx], params, forcing=None, t0=0.0) -> u``
    taking the model's raw params pytree (repacking transposes are traced
    into the same jit); ``forcing`` is an ``equations.ForcingParams`` with
    leading batch dims, required iff the equation is forced.
    """
    if kernel_size % 2 != 1:
        raise ValueError("fused learned RK4 assumes odd conv kernels")
    orders = sorted(taps_map)
    conservative = equation.conservative
    dx = grid.dx
    kh = (kernel_size - 1) // 2
    tb = batch_tile

    # one contiguous shifted-copy stack serves the first conv layer AND the
    # stencil applications: rows = rolls of u by taps [tmin, tmax]
    all_taps = sorted(
        set(range(-kh, kh + 1)).union(*[set(taps_map[d]) for d in orders])
    )
    tmin, tmax = all_taps[0], all_taps[-1]
    if all_taps != list(range(tmin, tmax + 1)):
        raise ValueError(f"tap union {all_taps} is not contiguous")
    n_taps = tmax - tmin + 1
    conv_row0 = -kh - tmin  # row of conv offset -kh in the u-stack
    stencil_rows = {d: taps_map[d][0] - tmin for d in orders}
    if any(
        list(taps_map[d]) != list(range(taps_map[d][0], taps_map[d][0] + len(taps_map[d])))
        for d in orders
    ):
        raise ValueError("per-order taps must be contiguous")

    # static affine projection: c_all = c0_all + PN @ z_all, with the
    # per-order scale folded into the block-diagonal PN
    sizes = [len(taps_map[d]) for d in orders]
    frees = []
    blocks = []
    for d in orders:
        ns = nullspace_map[d]
        if ns is None:  # FixedCoefficients: c = c0 + scale * z
            ns = np.eye(len(taps_map[d]))
        blocks.append(float(scale_map[d]) * np.asarray(ns, np.float64).T)
        frees.append(blocks[-1].shape[1])
    s_tot, f_tot = sum(sizes), sum(frees)
    pn = np.zeros((s_tot, f_tot))
    c_row = {}
    z_row = {}
    r = c = 0
    for d, blk in zip(orders, blocks):
        pn[r : r + blk.shape[0], c : c + blk.shape[1]] = blk
        c_row[d], z_row[d] = r, c
        r += blk.shape[0]
        c += blk.shape[1]
    pn = jnp.asarray(pn, jnp.float32)
    c0_all = jnp.asarray(
        np.concatenate([np.asarray(c0_map[d], np.float64) for d in orders])[:, None],
        jnp.float32,
    )

    forced = equation.forced

    def kernel(*refs):
        # refs: u, (w0 [Co, K]) + (w [K, Co, Cin] per deeper layer) with
        #       biases [Co, 1] interleaved, hw [fT, C], hb [fT, 1],
        #       c0 [sT, 1], pn [sT, fT],
        #       [forced: amp, sin0, cos0, rot_c, rot_s — all [terms, n]], out
        u_ref = refs[0]
        body = refs[1:-1]
        out_ref = refs[-1]
        if forced:
            amp_ref, s0_ref, c0f_ref, rc_ref, rs_ref = body[-5:]
            body = body[:-5]
        n_layers = (len(body) - 4) // 2
        layer_refs = [(body[2 * i], body[2 * i + 1]) for i in range(n_layers)]
        hw_ref, hb_ref, c0_ref, pn_ref = body[-4:]
        kk = 2 * kh + 1

        def rhs(u):  # u: [1, n] f32, x-major
            # shifted-copy stack [n_taps, n]: rows tmin..tmax. Kept f32 for
            # the stencil application; matmul operands are cast to bf16 —
            # the SAME rounding the XLA twin's default-precision convs
            # apply (one bf16 pass, f32 accumulate).
            ustack = jnp.concatenate(
                [_roll(u, -t * tb, axis=1) for t in range(tmin, tmax + 1)], axis=0
            )
            h = None
            for li, (w_ref, b_ref) in enumerate(layer_refs):
                if li == 0:
                    # first layer: the u-stack rows ARE the K input rows
                    acc = jax.lax.dot_general(
                        w_ref[...],
                        ustack[conv_row0 : conv_row0 + kk].astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    # deeper layers: ONE packed matmul against the
                    # concat-of-rolled-copies stack [K*Cin, n] (contraction
                    # 160 actually fills the MXU). Measured alternatives on
                    # v5e, all slower: per-tap dots on rolled copies (-15%),
                    # halo-scratch with slice-operand dots (-30%, Mosaic
                    # materializes the slice loads), 3-D [C, tb, nx] dots
                    # (compile time explodes ~1.5x per chained dot).
                    hb16 = h.astype(jnp.bfloat16)
                    stack = jnp.concatenate(
                        [_roll(hb16, -(j - kh) * tb, axis=1) for j in range(kk)],
                        axis=0,
                    )
                    acc = jax.lax.dot_general(
                        w_ref[...], stack, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                h = jnp.maximum(acc + b_ref[...], 0.0)
            z = (
                jax.lax.dot_general(
                    hw_ref[...], h.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + hb_ref[...]
            )  # [f_tot, n]
            c_all = c0_ref[...] + jax.lax.dot_general(
                pn_ref[...], z, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [s_tot, n]
            vals = {}
            for d, size in zip(orders, sizes):
                r0, u0 = c_row[d], stencil_rows[d]
                vals[d] = jnp.sum(
                    c_all[r0 : r0 + size] * ustack[u0 : u0 + size],
                    axis=0,
                    keepdims=True,
                )
            if conservative:
                flux = equation.flux(vals)
                return -(flux - _roll(flux, tb, axis=1)) / dx
            return equation.equation_of_motion(u, vals)

        if not forced:

            def step(_, u):
                k1 = rhs(u)
                k2 = rhs(u + (0.5 * dt) * k1)
                k3 = rhs(u + (0.5 * dt) * k2)
                k4 = rhs(u + dt * k3)
                return u + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

            out_ref[...] = jax.lax.fori_loop(0, num_steps, step, u_ref[...])
            return

        amp = amp_ref[...]
        rc, rs = rc_ref[...], rs_ref[...]

        def force(s):  # [terms, n] -> [1, n]
            return jnp.sum(amp * s, axis=0, keepdims=True)

        def rotate(s, c):  # advance every term's phase by dt/2
            return s * rc + c * rs, c * rc - s * rs

        def step(_, carry):
            u, s, c = carry
            k1 = rhs(u) + force(s)
            s1, c1 = rotate(s, c)  # t + dt/2
            f_half = force(s1)
            k2 = rhs(u + (0.5 * dt) * k1) + f_half
            k3 = rhs(u + (0.5 * dt) * k2) + f_half
            s2, c2 = rotate(s1, c1)  # t + dt
            k4 = rhs(u + dt * k3) + force(s2)
            u = u + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
            return u, s2, c2

        u_out, _, _ = jax.lax.fori_loop(
            0, num_steps, step, (u_ref[...], s0_ref[...], c0f_ref[...])
        )
        out_ref[...] = u_out

    def pack_params(params: dict) -> list[jnp.ndarray]:
        weights: list[jnp.ndarray] = []
        for w, b in params["tower"]:
            k, cin, co = w.shape
            # [K, Cin, Co] -> [Co, K*Cin], row-major over (k, cin) to match
            # the kernel's concat-over-taps stacking of [Cin, n] blocks;
            # bf16 = the rounding XLA's default-precision conv applies
            weights.append(
                jnp.transpose(w, (2, 0, 1)).reshape(co, k * cin).astype(jnp.bfloat16)
            )
            weights.append(b[:, None])
        hws, hbs = [], []
        for d in orders:
            hw, hb = params["heads"][str(d)]
            hws.append(jnp.transpose(hw[0]))  # [free_d, C]
            hbs.append(hb)
        weights.append(jnp.concatenate(hws, axis=0).astype(jnp.bfloat16))
        weights.append(jnp.concatenate(hbs)[:, None])
        weights.append(c0_all)
        weights.append(pn)
        return weights

    def pack_forcing(forcing, t0, batch: int, nx: int) -> list[jnp.ndarray]:
        """[terms]-per-trajectory sinusoid params -> x-major [tiles, terms, n]
        tiles: amplitude (cell-averaged for conservative schemes), the phase
        state (sin, cos) at t0, and the dt/2 planar rotation (cos, sin)."""
        n_tiles = batch // tb

        def xmajor(arr):  # [batch, terms, nx] -> [tiles, terms, nx*tb]
            return (
                arr.reshape(n_tiles, tb, arr.shape[1], nx)
                .transpose(0, 2, 3, 1)
                .reshape(n_tiles, arr.shape[1], nx * tb)
                .astype(jnp.float32)
            )

        terms = forcing.amplitude.shape[-1]
        shape = (batch, terms)
        amp, omega, k, phi = (
            jnp.broadcast_to(leaf, shape) for leaf in forcing
        )
        kappa = 2 * np.pi * k / equation.period
        if conservative:
            # exact cell average of sin over [x - dx/2, x + dx/2]
            # (equations.forcing_term's sinc factor)
            amp = amp * jnp.sinc(kappa * dx / 2 / np.pi)
        x = jnp.asarray(grid.x, jnp.float32)
        theta0 = (
            omega[:, :, None] * jnp.asarray(t0, jnp.float32)
            + kappa[:, :, None] * x
            + phi[:, :, None]
        )  # [batch, terms, nx]
        half = omega * (dt / 2)
        bcast = lambda a: jnp.broadcast_to(a[:, :, None], theta0.shape)
        return [
            xmajor(bcast(amp)),
            xmajor(jnp.sin(theta0)),
            xmajor(jnp.cos(theta0)),
            xmajor(bcast(jnp.cos(half))),
            xmajor(bcast(jnp.sin(half))),
        ]

    def advance(u: jnp.ndarray, params: dict, forcing=None, t0=0.0) -> jnp.ndarray:
        batch, nx = u.shape
        if batch % tb or not kernel_supported(tb, nx):
            raise ValueError(
                f"shapes ({batch}, {nx}) not tileable: need batch%{tb}==0, "
                f"nx%{LANE}==0"
            )
        if params["tower"][0][0].shape[1] != 1:
            raise ValueError("fused learned RK4 assumes a 1-channel input")
        if forced and forcing is None:
            raise ValueError(f"{equation.name} is forced: forcing required")
        if not forced and forcing is not None:
            # the XLA twin (Equation.time_derivative) applies any forcing it
            # is handed; silently dropping it here would diverge the paths
            raise ValueError(
                f"{equation.name} is unforced but forcing was passed"
            )
        weights = pack_params(params)
        n_tiles = batch // tb
        n = nx * tb
        # x-major flatten: [B, nx] -> [tiles, 1, nx*tb], lane index x*tb + b.
        # (The singleton axis keeps the block's trailing dims equal to the
        # array's — a (1, n) block on a [tiles, n] array is rejected when
        # tiles > 1.)
        v = u.reshape(n_tiles, tb, nx).transpose(0, 2, 1).reshape(n_tiles, 1, n)
        in_specs = [
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ]
        for wgt in weights:
            in_specs.append(
                pl.BlockSpec(
                    wgt.shape,
                    lambda i, _r=len(wgt.shape): (0,) * _r,
                    memory_space=pltpu.VMEM,
                )
            )
        ftiles = []
        if forced:
            ftiles = pack_forcing(forcing, t0, batch, nx)
            for ft in ftiles:
                in_specs.append(
                    pl.BlockSpec(
                        (1,) + ft.shape[1:],
                        lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                )
        n_w = len(weights)
        # The default 16 MiB scoped-VMEM stack is too small for this kernel;
        # size the limit from every live [*, n]-lane tile (they all scale
        # with n = nx * batch_tile): the u-stack, the bf16 packed conv
        # stacks (2 can be live across a dot), f32 activations + head/coeff
        # rows, the five RK4 state/stage vectors, and — forced — the 5
        # forcing tiles plus (sin, cos) carries and rotation temporaries.
        # A 1.5x safety factor covers Mosaic temporaries; 16 MiB floor.
        # 5 input tiles + the (sin, cos) fori_loop carries = 7 [terms, n]
        # forcing tiles live at once
        n_forcing_rows = 7 * int(ftiles[0].shape[1]) if ftiles else 0
        bytes_per_lane = (
            4 * (n_taps + 3 * weights[0].shape[0] + s_tot + f_tot + 8)
            + 2 * (2 * kernel_size * weights[0].shape[0])
            + 4 * n_forcing_rows
        )
        vmem_bytes = int(
            16 * 1024 * 1024 + 1.5 * bytes_per_lane * n
        )
        if not interpret and vmem_bytes > PHYSICAL_VMEM_BYTES:
            # refuse BEFORE compiling: an over-budget Mosaic compile can
            # hang and wedge the chip rather than fail cleanly (the
            # batch-tile fallback ladders rely on this raise to step down)
            raise ValueError(
                f"fused learned RK4 at batch_tile={tb}, nx={nx} needs "
                f"~{vmem_bytes >> 20} MiB VMEM > {PHYSICAL_VMEM_BYTES >> 20}"
                " MiB physical; use a smaller batch_tile"
            )
        out = pl.pallas_call(
            lambda *refs: kernel(
                refs[0].at[0],
                *refs[1 : 1 + n_w],
                *(r.at[0] for r in refs[1 + n_w : -1]),
                refs[-1].at[0],
            ),
            out_shape=jax.ShapeDtypeStruct((n_tiles, 1, n), u.dtype),
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
            interpret=interpret,
        )(v, *weights, *ftiles)
        return (
            out.reshape(n_tiles, nx, tb).transpose(0, 2, 1).reshape(batch, nx)
        )

    return advance
