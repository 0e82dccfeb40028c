"""Time integration: method-of-lines RK via lax.scan, ETDRK4 spectral solver.

Rebuilds the capabilities of ``pde_superresolution/integrate.py``
(§Differentiator, §SpectralDifferentiator, §PolynomialDifferentiator,
§integrate, §integrate_exact — unverified citations, see SURVEY.md
provenance warning), redesigned TPU-first:

* The reference wraps a TF session in a numpy callable and hands it to a
  scipy ODE integrator — thousands of host↔device round trips per
  trajectory. Here the ENTIRE solve is one jitted ``lax.scan``: zero host
  round trips, batched over trajectories with ``vmap``/sharding.
* The reference's stiff "exact" solves (fine-grid spectral RHS through an
  adaptive scipy integrator) are replaced by an ETDRK4 exponential
  integrator (Kassam & Trefethen, SISC 2005 — public algorithm): the stiff
  linear part (e.g. KS ``k^2 - k^4``) is integrated *exactly* in Fourier
  space, so the step size is set by the nonlinearity, not the stiffness.
  Coefficients are computed once in float64 numpy via contour integrals and
  baked into the jitted graph.

All integrators are pure functions: they broadcast over arbitrary leading
batch dimensions and compose with jit/vmap/shard_map.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pde_superresolution_tpu import stencils
from pde_superresolution_tpu.equations import Equation, ForcingParams
from pde_superresolution_tpu.grids import Grid
from pde_superresolution_tpu.ops import spectral

# RHS signature: (u, t) -> du/dt. Forcing params are closed over.
RHSFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


# ---------------------------------------------------------------------------
# Differentiators: schemes that turn u into spatial derivatives / an RHS.
# ---------------------------------------------------------------------------


class Differentiator:
    """A spatial discretization scheme bound to (equation, grid).

    Subclasses implement ``derivatives(u)`` returning
    ``{order: array_like_u}`` — point derivatives for direct-form equations,
    right-face reconstructions for conservative ones. ``rhs_fn`` closes over
    optional forcing parameters and returns a jit-able ``(u, t) -> u_t``.

    ≈ integrate.py §Differentiator (unverified), minus the TF-session
    plumbing: here a Differentiator is pure and traceable end to end.
    """

    def __init__(self, equation: Equation, grid: Grid):
        self.equation = equation
        self.grid = grid

    def derivatives(self, u: jnp.ndarray) -> Mapping[int, jnp.ndarray]:
        raise NotImplementedError

    def rhs_fn(self, forcing: Optional[ForcingParams] = None) -> RHSFn:
        def rhs(u, t):
            return self.equation.time_derivative(
                u, self.derivatives(u), self.grid, t, forcing
            )

        # family tag: lets evaluate() warn when a conservative (cell-
        # average) scheme is compared under a point-sample coarse-graining
        # or vice versa (a silent half-cell interpretation mismatch)
        rhs.conservative = self.equation.conservative
        return rhs


class SpectralDifferentiator(Differentiator):
    """Exact (band-limited) derivatives via FFT; the ground-truth scheme.

    Always uses the direct (non-conservative) form of the equation —
    spectral derivatives are exact, so the forms coincide.
    ≈ integrate.py §SpectralDifferentiator (unverified).

    Stiffness caveat: spectral derivatives raise the resolvable
    wavenumber ceiling to pi/dx, so for stiff equations (KS u_xxxx) an
    explicit RK4 step sized for classic stencils — including
    ``evaluate()``'s default ``coarse_dt`` — is unconditionally unstable
    on fine grids (measured: instant blowup at KS 8x). Integrate this
    scheme with ``integrate_spectral`` / ``exact_solve_sampled`` (ETDRK4,
    exact linear part) or pass an explicitly tiny ``coarse_dt``.
    """

    def derivatives(self, u):
        eq = self.equation
        if eq.conservative:
            eq = dataclasses.replace(eq, conservative=False)
        return {
            d: spectral.spectral_derivative(u, d, self.grid.period)
            for d in eq.derivative_orders
        }

    def rhs_fn(self, forcing: Optional[ForcingParams] = None) -> RHSFn:
        equation = self.equation
        if equation.conservative:
            equation = dataclasses.replace(equation, conservative=False)
        grid = self.grid

        def rhs(u, t):
            derivs = {
                d: spectral.spectral_derivative(u, d, grid.period)
                for d in equation.derivative_orders
            }
            return equation.time_derivative(u, derivs, grid, t, forcing)

        # tag with the ORIGINAL equation's family: spectral derivatives are
        # exact so the scheme itself is family-agnostic, but the caller's
        # intended coarse-graining is the original equation's
        rhs.conservative = self.equation.conservative
        return rhs


class PolynomialDifferentiator(Differentiator):
    """Fixed classic polynomial stencils — the baseline scheme.

    For direct-form equations: centered finite differences at points. For
    conservative equations: finite-volume reconstructions at right faces
    (staggered, cell-average interpretation).
    ≈ integrate.py §PolynomialDifferentiator (unverified).
    """

    def __init__(
        self,
        equation: Equation,
        grid: Grid,
        accuracy_order: int = 2,
        stencil_size: int | None = None,
    ):
        super().__init__(equation, grid)
        self.accuracy_order = accuracy_order
        staggered = equation.conservative
        self.coeffs: dict[int, np.ndarray] = {}
        self.offsets: dict[int, np.ndarray] = {}
        for d in equation.derivative_orders:
            self.offsets[d], self.coeffs[d] = stencils.classic_stencil(
                d, staggered, grid.dx, size=stencil_size,
                accuracy_order=accuracy_order,
            )

    def derivatives(self, u):
        shift = -0.5 if self.equation.conservative else 0.0
        return {
            d: stencils.apply_stencil(
                u, jnp.asarray(self.coeffs[d], dtype=u.dtype), self.offsets[d], shift
            )
            for d in self.equation.derivative_orders
        }


# re-exported for backwards compatibility; implementation lives with the
# rest of the stencil geometry in stencils.py
baseline_stencil_size = stencils.baseline_stencil_size


# ---------------------------------------------------------------------------
# Explicit Runge-Kutta method-of-lines via lax.scan.
# ---------------------------------------------------------------------------


def rk4_step(rhs: RHSFn, u: jnp.ndarray, t: jnp.ndarray, dt: float) -> jnp.ndarray:
    """One classic RK4 step (the reference product path's integrator)."""
    k1 = rhs(u, t)
    k2 = rhs(u + 0.5 * dt * k1, t + 0.5 * dt)
    k3 = rhs(u + 0.5 * dt * k2, t + 0.5 * dt)
    k4 = rhs(u + dt * k3, t + dt)
    return u + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def rk3_ssp_step(rhs: RHSFn, u: jnp.ndarray, t: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Strong-stability-preserving RK3 (Shu-Osher) — good with WENO."""
    u1 = u + dt * rhs(u, t)
    u2 = 0.75 * u + 0.25 * (u1 + dt * rhs(u1, t + dt))
    return u / 3.0 + 2.0 / 3.0 * (u2 + dt * rhs(u2, t + 0.5 * dt))


STEP_FUNCS = {"rk4": rk4_step, "rk3_ssp": rk3_ssp_step}


def integrate(
    rhs: RHSFn,
    u0: jnp.ndarray,
    dt: float,
    num_steps: int,
    save_every: int = 1,
    t0: float = 0.0,
    method: str = "rk4",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Integrate ``du/dt = rhs(u, t)`` with a fixed step; save periodically.

    One jitted double ``lax.scan`` (outer over saves, inner over substeps):
    the whole trajectory runs on device with zero host round trips — the
    replacement for the reference's scipy/odeint loop (SURVEY.md §3.1
    "biggest TPU win").

    Returns:
      times: [num_saves + 1] (includes t0),
      trajectory: [num_saves + 1, *u0.shape] (includes u0).
    """
    if num_steps % save_every:
        raise ValueError(f"{num_steps=} not divisible by {save_every=}")
    num_saves = num_steps // save_every
    step = STEP_FUNCS[method]

    def inner(carry, _):
        u, t = carry
        u = step(rhs, u, t, dt)
        return (u, t + dt), None

    def outer(carry, _):
        carry, _ = jax.lax.scan(inner, carry, None, length=save_every)
        return carry, carry[0]

    (_, _), traj = jax.lax.scan(outer, (u0, jnp.asarray(t0, u0.dtype)), None, length=num_saves)
    traj = jnp.concatenate([u0[None], traj], axis=0)
    times = t0 + dt * save_every * jnp.arange(num_saves + 1)
    return times, traj


def integrate_fused(
    advance,
    u0: jnp.ndarray,
    dt: float,
    num_steps: int,
    save_every: int = 1,
    t0: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``integrate``'s contract, but each save interval is ONE ``advance``.

    ``advance(u, t)`` must run exactly ``save_every`` RK4 steps of size
    ``dt`` starting at time ``t`` — e.g. the whole-interval Mosaic kernel
    from ``StencilModel.fused_rk4_fn(params, dt, num_steps=save_every,
    forcing=..., t0=...)``, which keeps the state in VMEM for the entire
    interval. The outer lax.scan only touches HBM once per snapshot.

    Returns (times [num_saves+1], trajectory [num_saves+1, *u0.shape]),
    both including the initial condition, identical to ``integrate``.
    """
    if num_steps % save_every:
        raise ValueError(f"{num_steps=} not divisible by {save_every=}")
    num_saves = num_steps // save_every

    def outer(carry, _):
        u, t = carry
        u = advance(u, t)
        return (u, t + dt * save_every), u

    (_, _), traj = jax.lax.scan(
        outer, (u0, jnp.asarray(t0, u0.dtype)), None, length=num_saves
    )
    traj = jnp.concatenate([u0[None], traj], axis=0)
    times = t0 + dt * save_every * jnp.arange(num_saves + 1)
    return times, traj


# ---------------------------------------------------------------------------
# ETDRK4 spectral solver (exact reference solutions).
# ---------------------------------------------------------------------------


def _etdrk4_coefficients(
    linear_symbol: np.ndarray, dt: float, n_contour: int = 64
) -> dict[str, np.ndarray]:
    """ETDRK4 scalar coefficient arrays via contour-integral averaging.

    Follows Kassam & Trefethen (SISC 2005): evaluate the phi-function
    combinations on a circle |z - L*dt| = 1 to avoid cancellation for small
    |L*dt|. Works for real (dissipative) and imaginary (dispersive) symbols
    by centering the contour at each L*dt value. float64/complex128 numpy,
    computed once at setup.
    """
    z0 = np.asarray(linear_symbol, dtype=np.complex128) * dt
    theta = (np.arange(n_contour) + 0.5) * (2 * np.pi / n_contour)
    r = np.exp(1j * theta)  # contour offsets
    z = z0[..., None] + r  # [modes, n_contour]

    e_full = np.exp(z0)
    e_half = np.exp(z0 / 2)
    q = dt * np.mean((np.exp(z / 2) - 1) / z, axis=-1)
    f1 = dt * np.mean((-4 - z + np.exp(z) * (4 - 3 * z + z**2)) / z**3, axis=-1)
    f2 = dt * np.mean((2 + z + np.exp(z) * (-2 + z)) / z**3, axis=-1)
    f3 = dt * np.mean((-4 - 3 * z - z**2 + np.exp(z) * (4 - z)) / z**3, axis=-1)
    return {"e": e_full, "e2": e_half, "q": q, "f1": f1, "f2": f2, "f3": f3}


@dataclasses.dataclass(frozen=True)
class SpectralETDRK4:
    """Jit-able ETDRK4 stepper for ``u_t = L u + N(u)`` on a periodic grid.

    The linear symbol comes from ``equation.linear_symbol``; the
    nonlinearity from ``equation.nonlinear_term`` evaluated in real space
    with 2/3-rule dealiasing. State is the real field u (FFTs inside the
    step), so it composes directly with ``integrate``-style scans and
    resampling.
    """

    equation: Equation
    grid: Grid
    dt: float
    coeffs: dict[str, np.ndarray]
    dealias_mask: np.ndarray
    k: np.ndarray

    @classmethod
    def create(cls, equation: Equation, grid: Grid, dt: float) -> "SpectralETDRK4":
        k = spectral.wavenumbers(grid.size, grid.period)
        lin = equation.linear_symbol(k)
        coeffs = _etdrk4_coefficients(lin, dt)
        n_modes = k.size
        cutoff = (2 * (grid.size // 2)) // 3  # 2/3 rule on mode index
        mask = (np.arange(n_modes) <= cutoff).astype(np.float64)
        return cls(equation, grid, dt, coeffs, mask, k)

    def _nonlinear_hat(self, v_hat, t, forcing):
        """N(u) in Fourier space with dealiasing, from spectrum v_hat."""
        mask = jnp.asarray(self.dealias_mask, dtype=v_hat.real.dtype)
        v_hat = v_hat * mask
        u = jnp.fft.irfft(v_hat, n=self.grid.size)
        ik = jnp.asarray(1j * self.k, dtype=v_hat.dtype)
        u_x = jnp.fft.irfft(v_hat * ik, n=self.grid.size)
        n = self.equation.nonlinear_term(u, u_x, self.grid, t, forcing)
        return jnp.fft.rfft(n) * mask

    def step_hat(self, v_hat, t, forcing=None):
        """One ETDRK4 step on the spectrum."""
        c = {
            name: jnp.asarray(arr, dtype=v_hat.dtype)
            for name, arr in self.coeffs.items()
        }
        dt = self.dt
        nv = self._nonlinear_hat(v_hat, t, forcing)
        a = c["e2"] * v_hat + c["q"] * nv
        na = self._nonlinear_hat(a, t + dt / 2, forcing)
        b = c["e2"] * v_hat + c["q"] * na
        nb = self._nonlinear_hat(b, t + dt / 2, forcing)
        cc = c["e2"] * a + c["q"] * (2 * nb - nv)
        nc = self._nonlinear_hat(cc, t + dt, forcing)
        return c["e"] * v_hat + c["f1"] * nv + 2 * c["f2"] * (na + nb) + c["f3"] * nc


@functools.lru_cache(maxsize=128)
def _spectral_run(
    equation: Equation, grid: Grid, dt: float, num_steps: int, save_every: int
):
    """Build + cache the jitted full-trajectory ETDRK4 program.

    Everything (initial rfft, the scan of steps, the final irfft) sits in ONE
    jitted computation. Besides performance, this is required for
    correctness on the axon TPU backend, where eager FFTs are UNIMPLEMENTED.
    """
    stepper = SpectralETDRK4.create(equation, grid, dt)
    num_saves = num_steps // save_every

    @jax.jit
    def run(u0, t0, forcing):
        v0 = jnp.fft.rfft(u0)

        def inner(carry, _):
            v, t = carry
            v = stepper.step_hat(v, t, forcing)
            return (v, t + dt), None

        def outer(carry, _):
            carry, _ = jax.lax.scan(inner, carry, None, length=save_every)
            return carry, carry[0]

        (_, _), traj_hat = jax.lax.scan(outer, (v0, t0), None, length=num_saves)
        traj_hat = jnp.concatenate([v0[None], traj_hat], axis=0)
        return jnp.fft.irfft(traj_hat, n=grid.size).astype(u0.dtype)

    return run


def integrate_spectral(
    equation: Equation,
    grid: Grid,
    u0: jnp.ndarray,
    dt: float,
    num_steps: int,
    save_every: int = 1,
    t0: float = 0.0,
    forcing: Optional[ForcingParams] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact reference solve: ETDRK4 in Fourier space, saved in real space.

    Replaces the reference's create_training_data hot loop (spectral RHS
    through scipy's adaptive integrator with one session.run per RHS
    evaluation) with a single jitted on-device scan (cached per
    (equation, grid, dt, steps) configuration).

    Returns (times [S+1], trajectory [S+1, *u0.shape]).
    """
    if num_steps % save_every:
        raise ValueError(f"{num_steps=} not divisible by {save_every=}")
    run = _spectral_run(equation, grid, float(dt), num_steps, save_every)
    u0 = jnp.asarray(u0)
    traj = run(u0, jnp.asarray(t0, u0.dtype), forcing)
    num_saves = num_steps // save_every
    times = t0 + dt * save_every * jnp.arange(num_saves + 1)
    return times, traj


def integrate_resumable(
    rhs: RHSFn,
    u0: jnp.ndarray,
    dt: float,
    num_steps: int,
    save_every: int,
    store_path: str,
    t0: float = 0.0,
    method: str = "rk4",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Long-horizon integration with crash-resumable on-disk progress.

    SURVEY.md §5 "Failure detection / elastic recovery": integration jobs
    checkpoint their carry state every ``save_every`` steps. The snapshot
    trajectory accumulates in an HDF5 store; if the process dies, calling
    again with the same arguments resumes from the last completed chunk
    (verified chunk-bitwise-identical to an uninterrupted run, since the
    carry is saved exactly).

    Returns the same (times, trajectory) as ``integrate``.
    """
    import h5py

    if num_steps % save_every:
        raise ValueError(f"{num_steps=} not divisible by {save_every=}")
    num_saves = num_steps // save_every
    step = STEP_FUNCS[method]

    @jax.jit
    def chunk(u, t):
        def body(carry, _):
            u, t = carry
            return (step(rhs, u, t, dt), t + dt), None

        (u, t), _ = jax.lax.scan(body, (u, t), None, length=save_every)
        return u, t

    u0 = jnp.asarray(u0)
    shape = (num_saves + 1,) + u0.shape
    with h5py.File(store_path, "a") as f:
        if "u" not in f:
            f.create_dataset("u", shape=shape, dtype="float32")
            f.create_dataset("carry_u", shape=u0.shape, dtype="float32")
            f.attrs["next"] = 0
            f.attrs["carry_t"] = float(t0)
            f.attrs["dt"] = float(dt)
            f.attrs["t0"] = float(t0)
            f.attrs["method"] = method
        elif tuple(f["u"].shape) != shape:
            raise ValueError(
                f"existing store {store_path} has shape {f['u'].shape}, "
                f"expected {shape}; delete it to start fresh"
            )
        else:
            # resuming: the integration parameters must match what produced
            # the stored chunks, or the result would be a silent frankenstein
            # of two different integrations with mislabeled times
            for name, val in (("dt", float(dt)), ("t0", float(t0))):
                stored = float(f.attrs.get(name, val))
                if abs(stored - val) > 1e-12 * max(abs(val), 1.0):
                    raise ValueError(
                        f"store {store_path} was written with {name}="
                        f"{stored}, called with {val}; delete it to restart"
                    )
            if f.attrs.get("method", method) != method:
                raise ValueError(
                    f"store {store_path} was written with method="
                    f"{f.attrs['method']!r}, called with {method!r}"
                )
        start = int(f.attrs["next"])
        if start == 0:
            f["u"][0] = np.asarray(u0)
            f["carry_u"][...] = np.asarray(u0)
            f.attrs["next"] = 1
            start = 1
        u = jnp.asarray(f["carry_u"][...])
        t = jnp.asarray(float(f.attrs["carry_t"]), u0.dtype)
        for i in range(start, num_saves + 1):
            u, t = chunk(u, t)
            f["u"][i] = np.asarray(u)
            f["carry_u"][...] = np.asarray(u)
            f.attrs["carry_t"] = float(t)
            f.attrs["next"] = i + 1
            f.flush()
        traj = jnp.asarray(f["u"][...])
    times = t0 + dt * save_every * jnp.arange(num_saves + 1)
    return times, traj


# Version stamp of the exact-solver numerics (ETDRK4 contour coefficients,
# dealiasing rule, step selection). BUMP THIS on any change that alters a
# bit of exact_solve_sampled's output: the evaluation reference cache
# (evaluate._reference_cache_key) keys on it, so stale cached references
# are invalidated automatically instead of silently served.
EXACT_SOLVER_VERSION = 1


def exact_solve_sampled(
    equation: Equation,
    grid: Grid,
    u0: jnp.ndarray,
    time_delta: float,
    num_times: int,
    warmup_time: float = 0.0,
    forcing: Optional[ForcingParams] = None,
    dt_cap: Optional[float] = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ETDRK4 exact solve sampled every ``time_delta``, with optional warmup.

    The single shared implementation behind training-data generation and
    evaluation (they must use the same exact solver). The internal step only
    needs to resolve the nonlinear dynamics (the stiff linear part is exact
    at any step): ``dt_cap`` defaults to ``0.2 * dx`` (Kassam-Trefethen used
    ~0.3 dx for KS). Returns (times [num_times], traj [num_times, ..., nx]);
    the warmup segment is discarded, times start at its end.
    """
    dt_cap = dt_cap or 0.2 * grid.dx
    substeps = max(1, int(np.ceil(time_delta / dt_cap)))
    dt = time_delta / substeps
    t0 = 0.0
    if warmup_time > 0:
        warm_steps = int(np.ceil(warmup_time / dt))
        _, warm = integrate_spectral(
            equation, grid, u0, dt, warm_steps, save_every=warm_steps,
            forcing=forcing,
        )
        u0 = warm[-1]
        t0 = warm_steps * dt
    return integrate_spectral(
        equation,
        grid,
        u0,
        dt,
        (num_times - 1) * substeps,
        save_every=substeps,
        t0=t0,
        forcing=forcing,
    )


def integrate_exact(
    equation: Equation,
    grid: Grid,
    u0: jnp.ndarray,
    dt: float,
    num_steps: int,
    save_every: int = 1,
    **kwargs,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Alias for the exact (spectral ETDRK4) solve — the ground-truth path.

    ≈ integrate.py §integrate_exact (unverified).
    """
    return integrate_spectral(
        equation, grid, u0, dt, num_steps, save_every, **kwargs
    )
