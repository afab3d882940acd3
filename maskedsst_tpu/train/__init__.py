from maskedsst_tpu.train.optim import (  # noqa: F401
    build_optimizer,
    CosineAnnealingLR,
    ReduceLROnPlateau,
)
from maskedsst_tpu.train.train_state import TrainState  # noqa: F401
