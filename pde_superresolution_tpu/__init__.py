"""TPU-native framework for learning data-driven discretizations of 1-D PDEs.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
google/data-driven-discretization-1d (Python package ``pde_superresolution``,
companion code to Bar-Sinai, Hoyer, Hickey & Brenner, PNAS 116(31):15344, 2019;
arXiv:1808.04930).

NOTE ON CITATIONS: the reference mount at /root/reference was empty during this
build (see SURVEY.md "PROVENANCE WARNING"), so reference citations throughout
this package use the form ``pde_superresolution/<file>.py §<symbol>`` and are
reconstructed from knowledge of the public repo + the paper, not verified
against a mounted tree.

Architecture (TPU-first, not a port):
  * everything is a pure function over arrays; jit-compiled, vmapped over
    trajectories, sharded over a ``jax.sharding.Mesh``;
  * time integration is ``lax.scan`` over fixed-step RK3/RK4 (method of lines),
    with an ETDRK4 exponential integrator for stiff spectral reference solves;
  * the stencil-apply + PDE right-hand-side hot loop has fused Pallas (Mosaic
    TPU) kernels in ``ops/pallas_kernels.py``;
  * data generation (high-res spectral solve + coarse-graining) runs on-device
    end to end — no scipy/HDF5 round trip in the hot path.

Layer map (mirrors SURVEY.md §1):
  L0 ops/        resampling, spectral derivatives (≈ duckarray.py)
  L1 stencils/   polynomial constraint math       (≈ polynomials.py)
  L2 equations/  Burgers/KdV/KS + forcing + grids (≈ equations.py)
  L3 models/     constrained conv-net             (≈ model.py)
  L4 training/, integrate/                        (≈ training.py, integrate.py)
  L5 scripts/    CLI entry points                 (≈ scripts/*.py)
  +  parallel/   mesh/sharding/halo exchange      (new; reference is single-CPU)
  +  ops/pallas_kernels.py                        (new; fused TPU kernels)
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    # Honor the standard cache env var even on JAX builds that don't read
    # it themselves (this environment's 0.9 build doesn't): the test suite
    # and CLI smoke tests re-compile identical tiny programs dozens of
    # times; a persistent cache cuts the suite's wall time severalfold.
    import jax as _jax

    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:  # unknown config name on some other JAX version
        pass
