from .checkpoint import (load_metamodel, load_weights, save_metamodel,
                         save_weights)
from .trainer import Trainer, TrainingCallback, TrainState

__all__ = ["Trainer", "TrainingCallback", "TrainState", "save_weights",
           "load_weights", "save_metamodel", "load_metamodel"]
