"""SingleCellOMIC — the user-facing multi-omic dataset container.

Final class of the mixin chain (reference
``/root/reference/sisua/data/single_cell_dataset.py``): adds ``copy`` and the
deterministic permutation ``split`` (:43-81).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .const import UNIVERSAL_RANDOM_SEED
from .visualizer import _OMICvisualizer

__all__ = ["SingleCellOMIC"]


class SingleCellOMIC(_OMICvisualizer):
  """Multi-omic single-cell dataset (see _OMICbase for the full API)."""

  def split(self,
            train_percent: float = 0.8,
            seed: int = UNIVERSAL_RANDOM_SEED
            ) -> Tuple["SingleCellOMIC", "SingleCellOMIC"]:
    """Deterministic train/test split via seeded permutation (ref :43-81)."""
    assert 0.0 < train_percent < 1.0
    n = self.n_obs
    rng = np.random.RandomState(seed)
    ids = rng.permutation(n)
    n_train = int(np.ceil(train_percent * n))
    train = self[ids[:n_train]]
    test = self[ids[n_train:]]
    train._name = f"{self._name}_train"
    test._name = f"{self._name}_test"
    return train, test
