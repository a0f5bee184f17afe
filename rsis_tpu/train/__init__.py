"""Training runtime: jitted step, optimizers, checkpointing, driver loop."""

from .checkpoint import (  # noqa: F401
    checkpoint_exists,
    load_checkpoint,
    load_torch_reference,
    model_dir,
    save_checkpoint,
)
from .loop import Trainer, init_dataloaders, train  # noqa: F401
from .optim import make_optimizer, merge_params, split_params  # noqa: F401
from .step import (  # noqa: F401
    StepFlags,
    TrainState,
    create_train_state,
    make_train_step,
)
