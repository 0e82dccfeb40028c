"""Polynomial-accuracy stencil mathematics.

Rebuilds the capabilities of ``pde_superresolution/polynomials.py``
(§Method, §constraints, §coefficients, §PolynomialAccuracy — unverified
citations, see SURVEY.md provenance warning): constraint systems forcing
finite-difference / finite-volume stencil coefficients to exactly reproduce
derivatives of polynomials up to a chosen accuracy order, classic
maximal-accuracy stencils, and the null-space parameterization that lets a
neural network emit *constrained* coefficients ``c = c0 + z @ N``.

TPU-first design: all linear algebra here (solves, SVD) happens **once at
setup time in float64 numpy**; the results are constants baked into the jitted
graph. The only on-device ops are the tiny affine map ``c = c0 + z @ N`` (an
MXU-friendly matmul) and the stencil application einsum.

Mathematical conventions
------------------------
A stencil is a set of offsets ``o_i`` (in units of the grid spacing ``dx``;
integers for collocated points, half-integers for staggered evaluation) and
coefficients ``c_i`` such that

    sum_i c_i * u(x + o_i * dx)  ≈  d^k u / dx^k (x).

* FINITE_DIFFERENCES: inputs are point values ``u(x + o_i dx)``. Taylor
  expansion gives the constraint rows ``A[m, i] = o_i**m / m!`` and the target
  ``b[m] = δ_{m,k}`` (working in dx units; the solved coefficients are then
  scaled by ``dx**-k``).

* FINITE_VOLUMES: inputs are *cell averages* over cells ``[o_i - 1/2,
  o_i + 1/2]`` (dx units). The cell average of ``x**m / m!`` is
  ``((o+1/2)**(m+1) - (o-1/2)**(m+1)) / (m+1)!``, which replaces the FD row.

``m`` ranges over ``0 .. num_constraints-1`` with
``num_constraints = derivative_order + accuracy_order`` (matching the
reference's convention, where e.g. the classic 3-point second-derivative
stencil [1, -2, 1]/dx² is produced by ``accuracy_order=1``; symmetric stencils
pick up one extra order for free).
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


class Method(enum.Enum):
    """How stencil inputs are interpreted (≈ polynomials.py §Method)."""

    FINITE_DIFFERENCES = 1  # inputs are point values
    FINITE_VOLUMES = 2  # inputs are cell averages


def stencil_offsets(size: int, staggered: bool = False) -> np.ndarray:
    """Grid offsets (in dx units) for a stencil of ``size`` inputs.

    * ``staggered=False``: inputs collocated with the evaluation point.
      Odd sizes are symmetric (e.g. size 5 → [-2,-1,0,1,2]); even sizes are
      left-heavy (size 4 → [-2,-1,0,1]).
    * ``staggered=True``: evaluation at a cell face, inputs at cell centers:
      half-integer offsets (size 4 → [-1.5,-0.5,0.5,1.5]). Used by
      conservative (flux-form) models, where fluxes live at faces x_{j+1/2}.
    """
    if size < 1:
        raise ValueError(f"stencil size must be >= 1, got {size}")
    if staggered:
        return np.arange(size) - size / 2 + 0.5
    return np.arange(size, dtype=np.float64) - size // 2


def constraints(
    offsets: Sequence[float],
    method: Method,
    derivative_order: int,
    accuracy_order: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Build the linear system ``A @ c_grid = b`` for polynomial exactness.

    ``c_grid`` are coefficients in *grid units*; physical coefficients are
    ``c = c_grid / dx**derivative_order``. Returns float64 ``(A, b)`` with
    ``A.shape == (derivative_order + accuracy_order, len(offsets))``.

    ≈ polynomials.py §constraints (unverified).
    """
    if derivative_order < 0:
        raise ValueError(f"derivative_order must be >= 0: {derivative_order}")
    if accuracy_order < 1:
        raise ValueError(f"accuracy_order must be >= 1: {accuracy_order}")
    offsets = np.asarray(offsets, dtype=np.float64)
    num_constraints = derivative_order + accuracy_order
    if num_constraints > offsets.size and accuracy_order > 0:
        raise ValueError(
            f"{num_constraints} constraints > {offsets.size} stencil points: "
            "the system is overdetermined; enlarge the stencil or lower "
            "accuracy_order"
        )
    rows = []
    for m in range(num_constraints):
        if method is Method.FINITE_DIFFERENCES:
            row = offsets**m / math.factorial(m)
        elif method is Method.FINITE_VOLUMES:
            upper = (offsets + 0.5) ** (m + 1)
            lower = (offsets - 0.5) ** (m + 1)
            row = (upper - lower) / math.factorial(m + 1)
        else:
            raise TypeError(f"unknown method: {method}")
        rows.append(row)
    a = np.stack(rows)
    b = np.zeros(num_constraints)
    b[derivative_order] = 1.0
    return a, b


def coefficients(
    offsets: Sequence[float],
    method: Method,
    derivative_order: int,
    accuracy_order: int | None = None,
    dx: float = 1.0,
) -> np.ndarray:
    """Classic maximal-accuracy stencil coefficients (physical units).

    With ``accuracy_order=None`` (default) the system is made square —
    ``accuracy_order = len(offsets) - derivative_order`` — recovering the
    textbook stencils, e.g.::

        coefficients([-1, 0, 1], FD, derivative_order=2)  ->  [1, -2, 1] / dx²
        coefficients([-1, 0, 1], FD, derivative_order=1)  ->  [-1/2, 0, 1/2] / dx

    ≈ polynomials.py §coefficients (unverified).
    """
    offsets = np.asarray(offsets, dtype=np.float64)
    if accuracy_order is None:
        accuracy_order = offsets.size - derivative_order
        if accuracy_order < 1:
            raise ValueError(
                f"stencil of {offsets.size} points cannot represent "
                f"derivative order {derivative_order}"
            )
    a, b = constraints(offsets, method, derivative_order, accuracy_order)
    if a.shape[0] == a.shape[1]:
        c_grid = np.linalg.solve(a, b)
    else:
        # Underdetermined: minimum-norm solution.
        c_grid, *_ = np.linalg.lstsq(a, b, rcond=None)
    return c_grid / dx**derivative_order


def baseline_stencil_size(
    derivative_order: int, accuracy_order: int, staggered: bool
) -> int:
    """Smallest stencil achieving ``accuracy_order`` with the right parity.

    Collocated stencils must be odd-sized (symmetric around the point);
    staggered ones even-sized (symmetric around the face).
    """
    size = max(derivative_order + accuracy_order, derivative_order + 1)
    if staggered:
        return size + (size % 2)
    return size if size % 2 else size + 1


def classic_stencil(
    derivative_order: int,
    staggered: bool,
    dx: float,
    size: int | None = None,
    accuracy_order: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, classic maximal-accuracy coefficients) for one derivative.

    The ONE place that chooses stencil geometry for a derivative order:
    parity-corrects ``size`` (collocated odd / staggered even), picks FD vs
    FV by ``staggered``, and solves the square system. Shared by the
    baseline differentiator and the learned model so their z=0 schemes can
    never drift apart.
    """
    size = size or baseline_stencil_size(derivative_order, accuracy_order, staggered)
    if staggered and size % 2:
        size += 1
    if not staggered and size % 2 == 0:
        size += 1
    offsets = stencil_offsets(size, staggered=staggered)
    method = Method.FINITE_VOLUMES if staggered else Method.FINITE_DIFFERENCES
    coeffs = coefficients(offsets, method, derivative_order, None, dx=dx)
    return offsets, coeffs


@dataclasses.dataclass(frozen=True)
class PolynomialAccuracy:
    """Null-space parameterization of polynomial-accurate stencils.

    The affine subspace ``{c : A c = b}`` of coefficient vectors that exactly
    differentiate polynomials up to the requested order is parameterized as

        c(z) = c0 + scale * (z @ nullspace)

    where ``c0`` is the minimum-norm particular solution and ``nullspace``
    (shape ``[free_dims, stencil_size]``) is an orthonormal basis of
    ``ker(A)`` from the SVD. ANY network output ``z`` therefore yields a
    scheme that is at least ``accuracy_order`` accurate *by construction* —
    the reference's central trick (≈ polynomials.py §PolynomialAccuracy,
    unverified; paper eq. for constrained coefficients).

    Setup runs in float64 numpy; ``c0``/``nullspace`` become jnp constants.
    """

    offsets: tuple[float, ...]
    method: Method
    derivative_order: int
    accuracy_order: int
    dx: float
    scale: float
    c0: np.ndarray  # [stencil_size], physical units
    nullspace: np.ndarray  # [free_dims, stencil_size], physical units

    @classmethod
    def create(
        cls,
        offsets: Sequence[float],
        method: Method,
        derivative_order: int,
        accuracy_order: int,
        dx: float = 1.0,
        scale: float | None = None,
        bias: np.ndarray | None = None,
    ) -> "PolynomialAccuracy":
        """Build the projection for the given constraint system.

        Args:
          bias: optional particular solution to use instead of the
            minimum-norm one (must satisfy the constraints in *grid units*);
            e.g. the classic maximal-accuracy stencil, so that ``z = 0``
            reproduces the baseline scheme exactly.
          scale: multiplier on the null-space component. Default: RMS of the
            *grid-unit* particular solution, so unit-scale network outputs
            perturb coefficients by roughly the magnitude of the baseline
            stencil (the null-space basis is orthonormal in grid units, so
            after the common ``dx**-d`` scaling both terms stay commensurate).
        """
        offsets = np.asarray(offsets, dtype=np.float64)
        a, b = constraints(offsets, method, derivative_order, accuracy_order)
        _, sing, vt = np.linalg.svd(a)
        rank = int(np.sum(sing > max(a.shape) * np.finfo(np.float64).eps * sing[0]))
        nullspace_grid = vt[rank:]  # [free, size], orthonormal rows
        if nullspace_grid.shape[0] == 0:
            raise ValueError(
                "constraint system leaves no degrees of freedom; enlarge the "
                "stencil or lower accuracy_order"
            )
        if bias is not None:
            c0_grid = np.asarray(bias, dtype=np.float64)
            residual = a @ c0_grid - b
            if not np.allclose(residual, 0.0, atol=1e-8):
                raise ValueError(f"bias violates constraints: |r|={np.abs(residual).max()}")
        else:
            c0_grid, *_ = np.linalg.lstsq(a, b, rcond=None)
        dx_scale = dx ** (-derivative_order)
        c0 = c0_grid * dx_scale
        nullspace = nullspace_grid * dx_scale
        if scale is None:
            scale = float(np.sqrt(np.mean(c0_grid**2)))
        return cls(
            offsets=tuple(offsets.tolist()),
            method=method,
            derivative_order=derivative_order,
            accuracy_order=accuracy_order,
            dx=dx,
            scale=scale,
            c0=c0,
            nullspace=nullspace,
        )

    @property
    def stencil_size(self) -> int:
        return self.c0.shape[-1]

    @property
    def free_dims(self) -> int:
        """Number of unconstrained degrees of freedom the network controls."""
        return self.nullspace.shape[0]

    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        """Map network outputs ``z[..., free_dims]`` → coefficients ``[..., stencil_size]``.

        The projection matmul runs at Precision.HIGHEST: on TPU the default
        matmul precision is bfloat16, which costs ~3 decimal digits in the
        coefficients and directly destroys the numerical accuracy of the
        resulting scheme (verified empirically: 0.2 vs 5e-7 derivative error
        on sin at n=256). This matmul is tiny, so full precision is free.
        """
        c0 = jnp.asarray(self.c0, dtype=z.dtype)
        nullspace = jnp.asarray(self.nullspace, dtype=z.dtype)
        proj = jnp.einsum(
            "...f,fs->...s", z, nullspace, precision=jax.lax.Precision.HIGHEST
        )
        return c0 + self.scale * proj


@dataclasses.dataclass(frozen=True)
class FixedCoefficients:
    """Degenerate 'constraint layer' that ignores the network: c(z) = c0.

    Used for baseline differentiators and for ``polynomial_accuracy_order=0``
    ablations where the model adds an unconstrained perturbation to the
    classic stencil instead of projecting onto the constraint null space
    (≈ the reference's bias-only / unconstrained path, unverified).
    """

    offsets: tuple[float, ...]
    derivative_order: int
    c0: np.ndarray
    scale: float = 1.0

    @property
    def stencil_size(self) -> int:
        return self.c0.shape[-1]

    @property
    def free_dims(self) -> int:
        return self.c0.shape[-1]  # unconstrained: one dof per tap

    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        c0 = jnp.asarray(self.c0, dtype=z.dtype)
        return c0 + self.scale * z


# ≈ the reference's bias-only coefficient layer (polynomials.py
# §PolynomialBias, unverified — mount empty): coefficients = classic-stencil
# bias + the raw (unconstrained) network output, no null-space projection.
# Selected via ModelConfig(polynomial_accuracy_order=0). If the mount
# returns and the real PolynomialBias differs (e.g. projects onto a
# LOWER-order constraint set instead of none), adjust here.
PolynomialBias = FixedCoefficients


def apply_stencil(
    u: jnp.ndarray,
    coeffs: jnp.ndarray,
    offsets: Sequence[float],
    shift: float = 0.0,
) -> jnp.ndarray:
    """Apply per-point stencil coefficients to a periodic 1-D field.

    Computes ``out[..., j] = sum_i coeffs[..., j, i] * u[..., j + int(offsets[i] - shift)]``
    with periodic wraparound on the last axis.

    Args:
      u: field, shape ``[..., nx]``.
      coeffs: per-point coefficients, shape ``[..., nx, stencil_size]``
        (broadcastable against ``u``'s batch dims; a bare ``[stencil_size]``
        or ``[nx, stencil_size]`` array also works).
      offsets: stencil offsets in dx units. For staggered (half-integer)
        offsets pass ``shift=-0.5``: output index j then corresponds to the
        RIGHT face x_{j+1/2} of cell j, and offset o reads input cell
        ``j + o + 0.5`` (so o=-0.5 → cell j, o=+0.5 → cell j+1). The
        conservative divergence is then ``u_t[j] = -(F[j] - F[j-1]) / dx``.
      shift: subtracted from offsets before rounding to integer taps; must
        make every ``offset - shift`` an integer.

    This is the pure-XLA reference implementation (gather-free: one
    ``jnp.roll`` per tap, which XLA fuses into the surrounding elementwise
    graph). The Pallas fused kernel in ``ops/pallas_kernels.py`` must match it
    bit-for-bit in tests.
    """
    offsets = np.asarray(offsets, dtype=np.float64)
    taps = offsets - shift
    int_taps = np.round(taps).astype(int)
    if not np.allclose(taps, int_taps, atol=1e-9):
        raise ValueError(
            f"offsets {offsets} with shift {shift} do not land on grid points"
        )
    shifted = jnp.stack(
        [jnp.roll(u, -int(t), axis=-1) for t in int_taps], axis=-1
    )  # [..., nx, stencil]
    return jnp.sum(coeffs * shifted, axis=-1)
