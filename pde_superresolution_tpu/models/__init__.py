"""Learned discretization models (≈ pde_superresolution/model.py)."""

from pde_superresolution_tpu.models.conv_net import (  # noqa: F401
    ConvTowerConfig,
    conv_tower_apply,
    conv_tower_init,
)
from pde_superresolution_tpu.models.stencil_net import (  # noqa: F401
    ModelConfig,
    StencilModel,
)
