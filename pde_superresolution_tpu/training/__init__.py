"""Training subsystem: data generation, losses, training loop, config."""

from pde_superresolution_tpu.training.config import (  # noqa: F401
    TrainingConfig,
    parse_hparams,
)
from pde_superresolution_tpu.training.data import (  # noqa: F401
    Snapshots,
    TrainingData,
    TrajectoryData,
    build_training_data,
    build_trajectory_data,
    generate_snapshots,
    load_snapshots_h5,
    sample_training_batch,
    save_snapshots_h5,
)
from pde_superresolution_tpu.training.losses import (  # noqa: F401
    LossNorms,
    LossWeights,
    compute_loss,
    compute_loss_norms,
)
from pde_superresolution_tpu.training.loop import TrainState, train  # noqa: F401
from pde_superresolution_tpu.training.selection import (  # noqa: F401
    SelectionResult,
    protocol_score,
    select_checkpoint,
)
