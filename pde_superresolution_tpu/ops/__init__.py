"""Low-level array ops: resampling, spectral derivatives (≈ duckarray.py).

Unlike the reference's duck-typed numpy/TF1 dual implementations, everything
here is a single pure-JAX implementation — ``jnp`` ops work on numpy inputs
and trace under jit, so no polymorphism layer is needed.
"""

from pde_superresolution_tpu.ops.resample import (  # noqa: F401
    RESAMPLE_FUNCS,
    resample_mean,
    subsample,
)
from pde_superresolution_tpu.ops.spectral import (  # noqa: F401
    smoothing_filter,
    spectral_derivative,
    wavenumbers,
)
