from .optim import make_optimizer, multistep_schedule
from .state import (TrainState, load_checkpoint_meta, restore_checkpoint,
                    save_checkpoint)
from .loop import Trainer
from .autoregressive import autoregressive_rollout, rollout_starts

__all__ = [
    "make_optimizer",
    "multistep_schedule",
    "TrainState",
    "save_checkpoint",
    "restore_checkpoint",
    "load_checkpoint_meta",
    "Trainer",
    "autoregressive_rollout",
    "rollout_starts",
]
