from .checkpoint import (load_metamodel, load_weights, save_metamodel,
                         save_weights)
from .ensemble import VmapEnsemble
from .experimenter import Experimenter, SisuaExperimenter
from .scoreboard import ScoreBoard
from .trainer import Trainer, TrainingCallback, TrainState

__all__ = ["Trainer", "TrainingCallback", "TrainState", "VmapEnsemble",
           "ScoreBoard", "Experimenter", "SisuaExperimenter",
           "save_weights", "load_weights", "save_metamodel",
           "load_metamodel"]
