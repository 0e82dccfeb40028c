"""Parallelism: device meshes, halo exchange, sharded schemes (all new).

The reference is single-process single-device (SURVEY.md §2: parallelism
inventory EMPTY); this package is the TPU-native scaling layer added on top:

  * ``mesh.py`` — mesh construction + canonical shardings. Axes:
      "data": trajectory/ensemble batch (pure DP; the primary axis),
      "space": the periodic spatial grid (this library's sequence/context
      parallelism analogue — stencil halos ride ICI via lax.ppermute).
  * ``halo.py`` — ring halo exchange + halo-padded local stencil apply.
  * ``sharded.py`` — shard_map'd RHS builders (baseline + learned model)
    for spatially sharded integration.

Training DP lives in training/loop.py (sharded jit over the sample axis).
"""

from pde_superresolution_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    SPACE_AXIS,
    initialize_multihost,
    make_mesh,
)
from pde_superresolution_tpu.parallel.halo import (  # noqa: F401
    apply_stencil_local,
    halo_exchange,
)
from pde_superresolution_tpu.parallel.sharded import (  # noqa: F401
    sharded_baseline_rhs,
    sharded_model_rhs,
)
