"""The learned-discretization model: conv net -> constrained stencils -> RHS.

≈ pde_superresolution/model.py §predict_coefficients, §apply_coefficients,
§predict_space_derivatives, §predict_time_derivative, §predict_flux,
§baseline_space_derivatives (unverified citations — see SURVEY.md).

Forward chain (SURVEY.md §3.3, the framework's inner kernel):

    u (coarse, [batch, nx])
    -> conv tower (periodic)                       [batch, nx, filters]
    -> per-derivative heads z_d                    [batch, nx, free_dims]
    -> PolynomialAccuracy: c_d = c0 + scale(z@N)   [batch, nx, stencil]
    -> apply_stencil(u, c_d)                       [batch, nx]  per order d
    -> equation.time_derivative                    u_t [batch, nx]

For conservative equations the "derivatives" are face reconstructions
(staggered stencils, index j = right face x_{j+1/2}) and the RHS is the
conservative flux divergence — discrete conservation by construction.

The constraint layers are biased at the classic stencils, and heads are
zero-initialized, so an untrained model IS the polynomial baseline.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pde_superresolution_tpu import stencils
from pde_superresolution_tpu.equations import Equation, ForcingParams
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.models import conv_net


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model hyperparameters (subset of the reference's hparams; ≈
    training.py §create_hparams names, unverified)."""

    num_layers: int = 3
    filters: int = 32
    kernel_size: int = 5
    stencil_size: int = 7  # taps per derivative (even sizes for staggered)
    polynomial_accuracy_order: int = 2
    polynomial_accuracy_scale: float = 1.0  # multiplier on the default scale
    # 0 disables the constraint layer: coefficients = classic + raw net output
    constrained: bool = True
    # compute dtype of the conv-tower ACTIVATIONS ("float32" | "bfloat16").
    # Params stay float32 (master weights) and head outputs are cast back
    # to float32 before the HIGHEST-precision constraint projection, so
    # only the tower's intermediate activations (and their HBM traffic —
    # roughly half the rollout's memory time) change width. The matmuls
    # already run bf16 on the MXU by default; bfloat16 here additionally
    # halves activation traffic in the unrolled-training rollout
    # (measured 1.18x on the flagship train step at equal trained science
    # — RESULTS.md round-4 delta). Honored by rhs_fn's XLA path AND the
    # spatially-sharded RHS (parallel/sharded.py); the fused Mosaic
    # kernel (fused_rk4_fn) always packs its tower in bf16 regardless, so
    # for bfloat16 models it agrees to accumulation order rather than
    # bit-for-bit.
    tower_dtype: str = "float32"

    def tower(self) -> conv_net.ConvTowerConfig:
        return conv_net.ConvTowerConfig(
            num_layers=self.num_layers,
            filters=self.filters,
            kernel_size=self.kernel_size,
        )


class StencilModel:
    """A learned discretization bound to (equation, coarse grid, config).

    Static configuration (constraint projections, offsets) is built once in
    float64 numpy; ``init_params``/``coefficients``/``derivatives``/``rhs_fn``
    are pure and jit/vmap/shard-compatible.
    """

    def __init__(self, equation: Equation, grid: Grid, config: ModelConfig = ModelConfig()):
        self.equation = equation
        self.grid = grid
        self.config = config
        staggered = equation.conservative
        method = (
            stencils.Method.FINITE_VOLUMES
            if staggered
            else stencils.Method.FINITE_DIFFERENCES
        )
        self._shift = -0.5 if staggered else 0.0
        self.constraint_layers: dict[int, object] = {}
        for d in equation.derivative_orders:
            # shared geometry helper: the model's z=0 scheme and the
            # evaluation baseline can never drift apart
            offsets, classic = stencils.classic_stencil(
                d, staggered, grid.dx, size=config.stencil_size
            )
            if config.constrained and config.polynomial_accuracy_order > 0:
                # bias must satisfy the (grid-unit) constraint system; pass
                # the classic grid-unit solution.
                classic_grid = classic * grid.dx**d
                layer = stencils.PolynomialAccuracy.create(
                    offsets,
                    method,
                    d,
                    config.polynomial_accuracy_order,
                    dx=grid.dx,
                    bias=classic_grid,
                )
                if config.polynomial_accuracy_scale != 1.0:
                    layer = dataclasses.replace(
                        layer, scale=layer.scale * config.polynomial_accuracy_scale
                    )
            else:
                layer = stencils.FixedCoefficients(
                    offsets=tuple(offsets.tolist()),
                    derivative_order=d,
                    c0=classic,
                    scale=config.polynomial_accuracy_scale / grid.dx**d,
                )
            self.constraint_layers[d] = layer

    # -- params ---------------------------------------------------------------
    def init_params(self, key: jax.Array) -> dict:
        head_dims = {
            str(d): layer.free_dims for d, layer in self.constraint_layers.items()
        }
        return conv_net.conv_tower_init(key, self.config.tower(), head_dims)

    # -- forward --------------------------------------------------------------
    def coefficients(self, params: dict, u: jnp.ndarray) -> Mapping[int, jnp.ndarray]:
        """Predicted constrained coefficients per derivative order.

        Returns {order: [..., nx, stencil_size]}.
        """
        dtype = (
            None
            if self.config.tower_dtype == "float32"
            else jnp.dtype(self.config.tower_dtype)
        )
        zs = conv_net.conv_tower_apply(params, u, dtype=dtype)
        return {
            d: layer(zs[str(d)]) for d, layer in self.constraint_layers.items()
        }

    def derivatives(self, params: dict, u: jnp.ndarray) -> Mapping[int, jnp.ndarray]:
        """Predicted spatial derivatives (or face reconstructions)."""
        coeffs = self.coefficients(params, u)
        return {
            d: stencils.apply_stencil(
                u, coeffs[d], self.constraint_layers[d].offsets, self._shift
            )
            for d in coeffs
        }

    def baseline_derivatives(self, u: jnp.ndarray) -> Mapping[int, jnp.ndarray]:
        """Same stencil layout with the classic coefficients (z = 0).

        Used for loss normalization (≈ model.py §baseline_space_derivatives).
        """
        out = {}
        for d, layer in self.constraint_layers.items():
            c0 = jnp.asarray(layer.c0, dtype=u.dtype)
            out[d] = stencils.apply_stencil(u, c0, layer.offsets, self._shift)
        return out

    def time_derivative(
        self,
        params: dict,
        u: jnp.ndarray,
        t: jnp.ndarray = 0.0,
        forcing: Optional[ForcingParams] = None,
    ) -> jnp.ndarray:
        derivs = self.derivatives(params, u)
        return self.equation.time_derivative(u, derivs, self.grid, t, forcing)

    def linear_stability_bound(self) -> float:
        """Exact explicit-RK4 stability limit of this model's z=0 (classic)
        scheme's LINEAR part on its grid.

        The scheme is shift-invariant on a periodic grid, so its
        linearization at u=0 is circulant: ONE jvp with a unit impulse
        gives the first column, whose FFT is the full eigenvalue set. The
        bound is the largest dt with |R(dt λ)| ≤ max(1, |e^{dt λ}|) for
        every eigenvalue λ (R = the RK4 amplification polynomial; the max
        with |e^z| exempts physically unstable modes — KS's +k²−k⁴ band
        grows under ANY integrator and must not force dt→0).
        """
        if getattr(self, "_linear_bound", None) is not None:
            return self._linear_bound
        nx = self.grid.size

        def f(u):
            derivs = self.baseline_derivatives(u[None])
            return self.equation.time_derivative(
                u[None], derivs, self.grid, jnp.zeros(()), None
            )[0]

        e0 = np.zeros(nx, np.float32)
        e0[0] = 1.0
        _, col = jax.jvp(f, (jnp.zeros(nx, jnp.float32),), (jnp.asarray(e0),))
        lam = np.fft.fft(np.asarray(col, np.float64))

        def rk4_amp(z):
            return np.abs(1 + z + z**2 / 2 + z**3 / 6 + z**4 / 24)

        def stable(dt):
            z = dt * lam
            cap = np.maximum(1.0, np.abs(np.exp(z)))
            return bool((rk4_amp(z) <= cap + 1e-9).all())

        lo, hi = 1e-9, 1e3
        for _ in range(60):
            mid = 0.5 * (lo + hi)
            if stable(mid):
                lo = mid
            else:
                hi = mid
        self._linear_bound = float(lo)
        return self._linear_bound

    def stable_time_step(self, u_scale: float = 2.0, safety: float = 0.82) -> float:
        """Stable explicit-RK4 step for THIS model's stencil widths.

        The equation-level ``Equation.stable_time_step`` assumes the narrow
        classic stencils' spectral radii (e.g. 16/dx⁴ for [1,−4,6,−4,1]).
        Wider high-accuracy stencils have strictly LARGER radii — their
        symbols approach the spectral one — and the equation bound becomes
        unsafe as width grows: measured on KS 8× FV, the exact linear
        margin at the equation dt is 1.59× (stencil 6), 1.23× (8), 1.05×
        (10), and 0.95×/0.87× at stencils 12/14 — the last two NaN within
        a few thousand steps at the equation dt
        (tests/test_model.py::TestModelStableStep).
        Returns min(equation bound, safety × exact linear bound): never
        looser than the equation bound, tighter where width demands it.
        ``safety=0.82`` is calibrated so the stencil-8 flagship recipe —
        proven stable across three rounds of committed artifacts at margin
        1.23× ≈ 1/0.82 — sits exactly at the no-change boundary: stencils
        ≤8 keep their historical dt bit-for-bit, stencils ≥10 tighten in
        the regimes (highest-derivative-bound) where the crude bound is
        the unsafe one.
        """
        eq_dt = self.equation.stable_time_step(self.grid, u_scale=u_scale)
        return min(eq_dt, safety * self.linear_stability_bound())

    def rhs_fn(
        self,
        params: dict,
        forcing: Optional[ForcingParams] = None,
        use_pallas: Optional[bool] = None,
    ):
        """(u, t) -> u_t closure matching the Differentiator protocol, so the
        trained model plugs directly into ``integrate.integrate``.

        Args:
          use_pallas: fuse the stencil-apply + flux-divergence (and forcing
            add) into the Mosaic kernel (ops/pallas_kernels.make_fused_rhs)
            for tileable [batch, nx] shapes (batch%8==0, nx%128==0), XLA
            fallback otherwise. Measured ~1.24x faster than XLA on v5e
            (KS 8x, batch 1024), equal to float tolerance. Default (None)
            resolves to True on a TPU backend and False elsewhere.
            Round 1's deterministic axon hang on the forcing-input variant
            no longer reproduces (scripts_dev/repro_forcing_hang.py, all
            rungs PASS on 2026-08-16; stress-tested 30 launches + scan) —
            DECISIONS.md #15 has the history.
            DIFFERENTIABLE (round 3): the fused RHS carries a custom_vjp
            whose backward is the XLA twin's linearization at the same
            primal point (pallas_kernels.make_fused_rhs), so this closure
            is safe under jax.grad — the unrolled training loss uses the
            kernel forward directly.
        """
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if not use_pallas:
            def rhs(u, t):
                return self.time_derivative(params, u, t, forcing)

            rhs.conservative = self.equation.conservative
            return rhs

        from pde_superresolution_tpu.equations import forcing_term
        from pde_superresolution_tpu.ops import pallas_kernels as pk

        offsets_map = {
            d: layer.offsets for d, layer in self.constraint_layers.items()
        }
        forced = forcing is not None
        fused = pk.make_fused_rhs(
            self.equation, self.grid, offsets_map, self._shift, forced=forced
        )
        x = jnp.asarray(self.grid.x, dtype=jnp.float32)

        def rhs(u, t):
            if u.ndim != 2 or not pk.kernel_supported(*u.shape):
                return self.time_derivative(params, u, t, forcing)
            coeffs = self.coefficients(params, u)
            if forced:
                width = self.grid.dx if self.equation.conservative else None
                f = forcing_term(forcing, x, t, self.equation.period, width)
                return fused(u, coeffs, jnp.broadcast_to(f, u.shape))
            return fused(u, coeffs)

        rhs.conservative = self.equation.conservative
        return rhs

    def fused_rk4_fn(
        self,
        params: dict,
        dt: float,
        num_steps: int,
        batch_tile: int = 128,
        interpret: bool = False,
        forcing: Optional[ForcingParams] = None,
        t0: float = 0.0,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        """Whole ``num_steps``-step RK4 advance of the learned model in ONE
        Mosaic kernel (ops/pallas_kernels.make_fused_learned_rk4): conv
        tower, constraint projection, stencil apply, flux divergence and all
        four RK4 stages stay in VMEM across every step.

        Forced equations (Burgers) pass their per-trajectory ``forcing``
        params and the integration start time ``t0``; the sinusoid phases
        are advanced in-kernel by planar rotation (no per-stage
        transcendentals — see make_fused_learned_rk4). Returns
        ``advance(u [batch, nx]) -> u``; batch must be a multiple of
        ``batch_tile`` and nx a multiple of 128. Agreement with the XLA
        ``rhs_fn`` + ``integrate.rk4_step`` path is to float tolerance
        (same math, different op grouping; the constraint projection runs
        HIGHEST precision in both).

        ``mesh`` composes the kernel with DATA PARALLELISM: the advance is
        wrapped in ``jax.shard_map`` over the mesh's "data" axis — each
        shard invokes the Mosaic kernel on its local trajectory batch
        (params and t replicated, forcing batch-sharded), with ZERO
        cross-shard communication (pure DP needs none). This is how the
        fused hot loop runs on a multi-chip ensemble: GSPMD cannot
        partition a Mosaic custom call through a sharded jit, but under
        shard_map the kernel only ever sees its shard. The global batch
        must divide by the data-axis size, and the per-shard batch by
        ``batch_tile``. Any other mesh axis (e.g. "space") is unused and
        must have size 1.
        """
        from pde_superresolution_tpu.ops import pallas_kernels as pk

        if self.equation.forced and forcing is None:
            raise ValueError(
                f"{self.equation.name} is forced: pass forcing params"
            )
        orders = sorted(self.constraint_layers)
        taps_map = {}
        c0_map = {}
        nullspace_map = {}
        scale_map = {}
        for d in orders:
            layer = self.constraint_layers[d]
            taps_map[d] = pk._int_taps(layer.offsets, self._shift)
            c0_map[d] = np.asarray(layer.c0)
            nullspace_map[d] = getattr(layer, "nullspace", None)
            scale_map[d] = float(layer.scale)
        fused = pk.make_fused_learned_rk4(
            self.equation,
            self.grid,
            self.config.kernel_size,
            taps_map,
            scale_map,
            c0_map,
            nullspace_map,
            dt,
            num_steps,
            batch_tile=batch_tile,
            interpret=interpret,
        )

        if mesh is None:

            def advance(u: jnp.ndarray, t=None) -> jnp.ndarray:
                """Advance num_steps RK4 steps from time ``t`` (default: the
                ``t0`` this closure was built with). ``t`` may be traced, so
                the advance can sit inside a lax.scan over trajectory
                segments."""
                return fused(u, params, forcing, t0 if t is None else t)

            return advance

        from jax.sharding import PartitionSpec as P

        from pde_superresolution_tpu.parallel.mesh import DATA_AXIS

        if DATA_AXIS not in mesh.axis_names:
            raise ValueError(
                f"mesh axes {mesh.axis_names} lack a '{DATA_AXIS}' axis"
            )
        other = {
            ax: n for ax, n in mesh.shape.items() if ax != DATA_AXIS and n > 1
        }
        if other:
            raise ValueError(
                "fused-kernel DP shards the trajectory batch only; mesh "
                f"axes {other} must have size 1 (the kernel needs the whole "
                "grid in one shard)"
            )
        # explicit args (not closure capture) so shard_map sees the
        # replicated params / batch-sharded forcing specs. check_vma=False:
        # pallas_call's out_shape carries no varying-mesh-axes annotation,
        # which the replication checker requires; the check buys nothing
        # here — the body is collective-free (pure DP), so every output
        # trivially varies exactly over the data axis as declared.
        sharded = jax.shard_map(
            lambda u, p, f, t: fused(u, p, f, t),
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(), P(DATA_AXIS), P()),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )

        def advance_dp(u: jnp.ndarray, t=None) -> jnp.ndarray:
            return sharded(
                u, params, forcing,
                jnp.asarray(t0 if t is None else t, jnp.float32),
            )

        return advance_dp
