"""Periodic 1-D grid geometry (fine/coarse pairs related by a resample factor).

≈ the grid fields on ``pde_superresolution/equations.py §Grid`` (unverified —
see SURVEY.md provenance warning): solution_num_points, resample_factor,
period, dx, x.

Grids are static configuration (plain frozen dataclasses, not pytrees): under
``jit`` they are compile-time constants, which keeps every shape static — a
hard requirement for XLA/TPU.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class Grid:
    """A uniform periodic grid on ``[0, period)`` with ``size`` points.

    Point ``j`` sits at ``x_j = j * dx`` (equivalently: cell ``j`` spans
    ``[x_j - dx/2, x_j + dx/2)`` for finite-volume interpretations; the
    reference uses the same point set for both).
    """

    size: int
    period: float

    def __post_init__(self):
        if self.size < 1:
            raise ValueError(f"grid size must be >= 1, got {self.size}")
        if self.period <= 0:
            raise ValueError(f"period must be > 0, got {self.period}")

    @property
    def dx(self) -> float:
        return self.period / self.size

    @property
    def x(self) -> np.ndarray:
        """Point locations, shape [size], float64 (cast at use sites)."""
        return np.arange(self.size) * self.dx

    def resample(self, factor: int) -> "Grid":
        """The coarse grid obtained by resampling this grid by ``factor``.

        Convention (matching block-mean / strided coarse-graining): coarse
        point ``j`` corresponds to fine points ``j*factor .. (j+1)*factor-1``;
        for subsampling, coarse point j is fine point ``j*factor``.
        """
        if factor < 1 or self.size % factor:
            raise ValueError(
                f"resample factor {factor} must divide grid size {self.size}"
            )
        return Grid(self.size // factor, self.period)
