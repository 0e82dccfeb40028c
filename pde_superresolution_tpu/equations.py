"""PDE definitions: Burgers, KdV, Kuramoto-Sivashinsky (+ conservative twins).

≈ pde_superresolution/equations.py §Equation, §BurgersEquation, §KdVEquation,
§KSEquation, conservative/flux variants, §RandomForcing, §EQUATION_TYPES
(unverified citations — see SURVEY.md provenance warning). PDE forms and
parameters follow Bar-Sinai et al., PNAS 2019 (arXiv:1808.04930):

    Burgers:  u_t = -u u_x + eta u_xx + f(x, t)       (periodic, forced)
    KdV:      u_t = -6 u u_x - u_xxx                  (unforced)
    KS:       u_t = -u u_x - u_xx - u_xxxx            (unforced, chaotic)

Each equation also has a conservative (flux) form ``u_t = -d/dx J + f`` used
by finite-volume models, which guarantees discrete conservation when the flux
divergence is a telescoping difference of face fluxes:

    Burgers:  J = u^2/2 - eta u_x
    KdV:      J = 3 u^2 + u_xx
    KS:       J = u^2/2 + u_x + u_xxx

TPU-first design notes:
  * Equation objects are *static* configuration — plain frozen dataclasses
    closed over by jitted functions (compile-time constants, static shapes).
  * Per-trajectory randomness (forcing parameters, initial conditions) lives
    in explicit array pytrees sampled with ``jax.random``, so everything
    vmaps over a trajectory batch and shards over a device mesh.
  * ``time_derivative`` is pure: (u, derivs, t, forcing) -> u_t. The
    *scheme* (spectral / fixed stencils / learned model) is whatever
    produced ``derivs`` — this is the seam the whole framework plugs into.
"""

from __future__ import annotations

import dataclasses
import typing
from typing import Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pde_superresolution_tpu.grids import Grid


class ForcingParams(typing.NamedTuple):
    """Parameters of a sum-of-sinusoids forcing; leading dims = batch.

    f(x, t) = sum_m amplitude[m] * sin(omega[m] t + 2 pi k[m] x / L + phi[m])

    ≈ equations.py §RandomForcing (unverified).
    """

    amplitude: jnp.ndarray  # [..., num_terms]
    omega: jnp.ndarray  # [..., num_terms] temporal frequency
    k: jnp.ndarray  # [..., num_terms] integer spatial wavenumber (as float)
    phi: jnp.ndarray  # [..., num_terms] phase


def forcing_term(
    params: ForcingParams,
    x: jnp.ndarray,
    t: jnp.ndarray,
    period: float,
    cell_width: Optional[float] = None,
) -> jnp.ndarray:
    """Evaluate the forcing on grid ``x`` [nx] at (traced) time ``t``.

    With ``cell_width`` the EXACT cell average over ``[x - w/2, x + w/2]``
    is returned instead of the point value: the average of
    ``sin(κ x + c)`` is ``sinc(κ w / 2) sin(κ x_center + c)``. Conservative
    (finite-volume) schemes evolve cell averages, so their forcing term must
    be the cell-averaged forcing — at 8x coarsening with wavenumbers 3-6 the
    point value overestimates it by up to ~25%.

    Returns shape ``params.batch_shape + [nx]``.
    """
    t = jnp.asarray(t)
    phase = (
        params.omega[..., None] * t[..., None, None]
        + 2 * np.pi * params.k[..., None] * x / period
        + params.phi[..., None]
    )  # [..., num_terms, nx]
    amplitude = params.amplitude
    if cell_width is not None:
        kappa = 2 * np.pi * params.k / period
        z = kappa * cell_width / 2
        amplitude = amplitude * jnp.sinc(z / np.pi)  # jnp.sinc(y)=sin(pi y)/(pi y)
    return jnp.sum(amplitude[..., None] * jnp.sin(phase), axis=-2)


@dataclasses.dataclass(frozen=True)
class Equation:
    """Base class: static PDE configuration.

    Attributes:
      period: spatial period L of the domain.
      conservative: if True, schemes reconstruct face values and
        ``time_derivative`` applies a conservative flux divergence.
    """

    period: float
    conservative: bool = False

    # --- to be overridden -------------------------------------------------
    name: typing.ClassVar[str] = "equation"
    forced: typing.ClassVar[bool] = False

    @property
    def derivative_orders(self) -> tuple[int, ...]:
        """Spatial-derivative orders a scheme must supply.

        Non-conservative: derivatives of u at grid points.
        Conservative: reconstructions at RIGHT faces x_{j+1/2} (order 0 =
        the face value itself).
        """
        raise NotImplementedError

    def equation_of_motion(
        self, u: jnp.ndarray, derivs: Mapping[int, jnp.ndarray]
    ) -> jnp.ndarray:
        """u_t from point derivatives (non-conservative form), without forcing."""
        raise NotImplementedError

    def flux(self, face_values: Mapping[int, jnp.ndarray]) -> jnp.ndarray:
        """Flux J at faces from face reconstructions (conservative form)."""
        raise NotImplementedError

    # --- shared machinery --------------------------------------------------
    def time_derivative(
        self,
        u: jnp.ndarray,
        derivs: Mapping[int, jnp.ndarray],
        grid: Grid,
        t: jnp.ndarray = 0.0,
        forcing: Optional[ForcingParams] = None,
    ) -> jnp.ndarray:
        """Full RHS: equation of motion (or flux divergence) plus forcing.

        ``derivs[k]`` has the same shape as ``u``; for conservative equations
        index j of a face array refers to face x_{j+1/2}, so the divergence
        is ``(J[j] - J[j-1]) / dx`` (periodic roll).
        """
        if self.conservative:
            j = self.flux(derivs)
            u_t = -(j - jnp.roll(j, 1, axis=-1)) / grid.dx
        else:
            u_t = self.equation_of_motion(u, derivs)
        if forcing is not None:
            x = jnp.asarray(grid.x, dtype=u.dtype)
            # conservative schemes evolve cell averages: use the exact
            # cell-averaged forcing (grid.x must be the true cell centers —
            # see Grid.resample(conservative=True))
            width = grid.dx if self.conservative else None
            u_t = u_t + forcing_term(forcing, x, t, self.period, width)
        return u_t

    # --- randomness ---------------------------------------------------------
    # Real dataclass fields (not ClassVars) so they are per-instance
    # configurable through ``from_name(..., forcing_k_min=30, ...)`` /
    # TrainingConfig.equation_params. The key use case is DOMAIN
    # GENERALIZATION (the reference paper's locality claim): deploying a
    # trained model on a domain N-times larger requires scaling the integer
    # wavenumber bands by N to keep the same PHYSICAL forcing/IC wavelengths
    # (k is in cycles per domain; kappa = 2 pi k / period).
    num_forcing_terms: int = 20
    forcing_k_min: int = 3
    forcing_k_max: int = 6

    def sample_forcing(
        self, key: jax.Array, batch_shape: tuple[int, ...] = ()
    ) -> Optional[ForcingParams]:
        """Random forcing parameters (None for unforced equations).

        Defaults ≈ equations.py §RandomForcing (unverified): 20 sinusoids,
        amplitude ~ U(-0.5, 0.5), temporal frequency ~ U(-0.4, 0.4), spatial
        wavenumber |k| ∈ {3..6} with random sign, phase ~ U(0, 2 pi).
        """
        if not self.forced:
            return None
        ka, ko, kk, ks, kp = jax.random.split(key, 5)
        shape = batch_shape + (self.num_forcing_terms,)
        amplitude = jax.random.uniform(ka, shape, minval=-0.5, maxval=0.5)
        omega = jax.random.uniform(ko, shape, minval=-0.4, maxval=0.4)
        k_mag = jax.random.randint(
            kk, shape, self.forcing_k_min, self.forcing_k_max + 1
        ).astype(jnp.float32)
        sign = jnp.where(jax.random.bernoulli(ks, 0.5, shape), 1.0, -1.0)
        phi = jax.random.uniform(kp, shape, minval=0.0, maxval=2 * np.pi)
        return ForcingParams(amplitude, omega, k_mag * sign, phi)

    ic_num_modes: int = 10
    ic_k_min: int = 1
    ic_k_max: int = 3
    ic_amplitude: float = 1.0

    def initial_conditions(
        self, key: jax.Array, grid: Grid, batch_shape: tuple[int, ...] = ()
    ) -> jnp.ndarray:
        """Random smooth initial conditions: a sum of low-wavenumber sinusoids.

        u0(x) = sum_m A_m sin(2 pi k_m x / L + phi_m),  A ~ U(-a, a),
        k ∈ {ic_k_min..ic_k_max}.  ≈ equations.py random initial conditions
        (unverified; the qualitative recipe — random long-wavelength
        superpositions — is from the paper).
        """
        ka, kk, kp = jax.random.split(key, 3)
        shape = batch_shape + (self.ic_num_modes,)
        a = jax.random.uniform(
            ka, shape, minval=-self.ic_amplitude, maxval=self.ic_amplitude
        )
        k = jax.random.randint(kk, shape, self.ic_k_min, self.ic_k_max + 1)
        phi = jax.random.uniform(kp, shape, minval=0.0, maxval=2 * np.pi)
        x = jnp.asarray(grid.x, dtype=jnp.float32)
        phase = 2 * np.pi * k[..., None] * x / self.period + phi[..., None]
        return jnp.sum(a[..., None] * jnp.sin(phase), axis=-2)

    # --- spectral (Fourier-space) form, for exact ETDRK4 solves --------------
    def linear_symbol(self, k: np.ndarray) -> np.ndarray:
        """Diagonal symbol L(k) of the stiff linear part, for rfft modes ``k``
        (angular wavenumbers). Setup-time float64/complex128 numpy.

        The exact reference solver splits u_t = L u + N(u) and integrates L
        exactly (ETDRK4) — the TPU-native replacement for the reference's
        scipy-on-CPU stiff solves (≈ integrate.py §SpectralDifferentiator +
        scipy, unverified).
        """
        raise NotImplementedError

    def nonlinear_term(
        self,
        u: jnp.ndarray,
        u_x: jnp.ndarray,
        grid: Grid,
        t: jnp.ndarray,
        forcing: Optional[ForcingParams],
    ) -> jnp.ndarray:
        """Real-space nonlinear part N(u) (everything except ``linear_symbol``)."""
        raise NotImplementedError

    # --- time-step control ----------------------------------------------------
    def stable_time_step(self, grid: Grid, u_scale: float = 2.0) -> float:
        """Conservative explicit-RK4 stable step for this equation on ``grid``.

        Combines per-term stability limits: advective ``dx/|u|`` and the
        linear term ``C_p * dx^p / a_p`` for each linear derivative term
        ``a_p d^p u/dx^p``, with RK4 stability constants folded into safety
        factors. Chaotic KS at fine resolution should use the ETDRK4 spectral
        integrator instead (integrate.py); this bound is for the coarse
        product path.
        """
        raise NotImplementedError


def _advective_dt(dx: float, u_scale: float) -> float:
    return dx / max(u_scale, 1e-6)


@dataclasses.dataclass(frozen=True)
class BurgersEquation(Equation):
    """Forced viscous Burgers: u_t = -u u_x + eta u_xx + f."""

    eta: float = 0.01
    period: float = 2 * np.pi
    name: typing.ClassVar[str] = "burgers"
    forced: typing.ClassVar[bool] = True

    @property
    def derivative_orders(self) -> tuple[int, ...]:
        return (0, 1) if self.conservative else (1, 2)

    def equation_of_motion(self, u, derivs):
        return -u * derivs[1] + self.eta * derivs[2]

    def flux(self, face_values):
        return 0.5 * face_values[0] ** 2 - self.eta * face_values[1]

    def linear_symbol(self, k):
        return -self.eta * k**2

    def nonlinear_term(self, u, u_x, grid, t, forcing):
        n = -u * u_x
        if forcing is not None:
            x = jnp.asarray(grid.x, dtype=u.dtype)
            n = n + forcing_term(forcing, x, t, self.period)
        return n

    def stable_time_step(self, grid: Grid, u_scale: float = 2.0) -> float:
        dx = grid.dx
        dt_adv = _advective_dt(dx, u_scale)
        dt_diff = 0.5 * dx**2 / max(self.eta, 1e-12)
        return 0.4 * min(dt_adv, dt_diff)


@dataclasses.dataclass(frozen=True)
class KdVEquation(Equation):
    """Korteweg-de Vries: u_t = -6 u u_x - u_xxx."""

    period: float = 32.0
    name: typing.ClassVar[str] = "kdv"

    @property
    def derivative_orders(self) -> tuple[int, ...]:
        return (0, 2) if self.conservative else (1, 3)

    def equation_of_motion(self, u, derivs):
        return -6.0 * u * derivs[1] - derivs[3]

    def flux(self, face_values):
        return 3.0 * face_values[0] ** 2 + face_values[2]

    def linear_symbol(self, k):
        # -u_xxx -> -(ik)^3 = +i k^3 (purely dispersive)
        return 1j * k**3

    def nonlinear_term(self, u, u_x, grid, t, forcing):
        return -6.0 * u * u_x

    def stable_time_step(self, grid: Grid, u_scale: float = 2.0) -> float:
        dx = grid.dx
        dt_adv = _advective_dt(dx, 6.0 * u_scale)
        # centered 3rd-derivative stencil spectral radius ~ 2/dx^3 (imaginary
        # axis); RK4 imaginary-axis stability ~ 2.8.
        dt_disp = 1.4 * dx**3
        return 0.4 * min(dt_adv, dt_disp)


@dataclasses.dataclass(frozen=True)
class KSEquation(Equation):
    """Kuramoto-Sivashinsky: u_t = -u u_x - u_xx - u_xxxx (chaotic)."""

    period: float = 64.0
    name: typing.ClassVar[str] = "ks"

    @property
    def derivative_orders(self) -> tuple[int, ...]:
        return (0, 1, 3) if self.conservative else (1, 2, 4)

    def equation_of_motion(self, u, derivs):
        return -u * derivs[1] - derivs[2] - derivs[4]

    def flux(self, face_values):
        return 0.5 * face_values[0] ** 2 + face_values[1] + face_values[3]

    def linear_symbol(self, k):
        # -u_xx - u_xxxx -> +k^2 - k^4
        return k**2 - k**4

    def nonlinear_term(self, u, u_x, grid, t, forcing):
        return -u * u_x

    def stable_time_step(self, grid: Grid, u_scale: float = 2.0) -> float:
        dx = grid.dx
        dt_adv = _advective_dt(dx, u_scale)
        # 4th-derivative stencil spectral radius 16/dx^4; RK4 real-axis
        # stability 2.79; extra margin for the destabilizing -u_xx term.
        dt_hyper = 2.79 * dx**4 / 16.0
        return 0.4 * min(dt_adv, dt_hyper)


EQUATION_TYPES: dict[str, type[Equation]] = {
    "burgers": BurgersEquation,
    "kdv": KdVEquation,
    "ks": KSEquation,
}


def params_dict(equation: Equation) -> dict:
    """The equation's constructor parameters, minus ``conservative``.

    THE canonical physics-serialization rule, shared by checkpoint-config
    population (run_training), export metadata (export_model), snapshot
    HDF5 attrs (save_snapshots_h5) and the exact-reference cache key
    (evaluate) — one place to update when the Equation schema changes, so
    those four stores can never silently diverge. ``conservative`` is
    excluded because every consumer stores/keys the family separately.
    ``from_name(name, conservative=..., **params_dict(eq))`` rebuilds the
    equation exactly.
    """
    return {
        k: v
        for k, v in dataclasses.asdict(equation).items()
        if k != "conservative"
    }


def from_name(name: str, conservative: bool = False, **kwargs) -> Equation:
    """Build an equation from its registry name (≈ §EQUATION_TYPES).

    Also accepts the explicit conservative registry aliases
    ``conservative_burgers`` etc.
    """
    key = name.lower()
    if key.startswith("conservative_"):
        key = key[len("conservative_") :]
        conservative = True
    if key not in EQUATION_TYPES:
        raise ValueError(
            f"unknown equation {name!r}; options: {sorted(EQUATION_TYPES)}"
        )
    return EQUATION_TYPES[key](conservative=conservative, **kwargs)
