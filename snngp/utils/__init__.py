"""Training utilities: optimizers, schedulers, loaders, checkpointing."""

from snngp.utils.optim import Adam, SGD, name_mask
from snngp.utils.training import DataLoader, ReduceLROnPlateau, Logger, get_context_summary
from snngp.utils.checkpoint import (Checkpointer, save_params, load_named,
    save_training_state, load_training_state)

__all__ = [
    "Adam", "SGD", "name_mask",
    "DataLoader", "ReduceLROnPlateau", "Logger", "get_context_summary",
    "Checkpointer", "save_params", "load_named",
    "save_training_state", "load_training_state",
]
