"""FACS-sorted gene+protein datasets (2/5/7 proteins).

Capability parity with ``/root/reference/sisua/data/data_loader/
facs_gene_protein.py:26-204``: bone-marrow cells with FACS-measured surface
protein levels next to the RNA counts; the 2/5/7-protein variants select
increasing protein panels. The source is the author's preprocessed bucket
(unavailable offline); the loader consumes a pre-placed cache in the same
(X, y) folder format and otherwise raises an actionable error.
"""

from __future__ import annotations

import os

import numpy as np

from ..const import OMIC
from ..dataset import SingleCellOMIC
from ..path import DATA_DIR
from ..utils import load_from_dataset

__all__ = ["read_FACS", "read_full_FACS"]

_PANELS = {
    2: ("CD4", "CD8"),
    5: ("CD20", "CD45", "CD34", "CD10", "CD19"),
    7: ("CD10", "CD135", "CD34", "CD38", "CD45RA", "CD49F", "CD90"),
}


def read_FACS(n_protein: int = 5, override: bool = False,
              verbose: bool = True) -> SingleCellOMIC:
  assert n_protein in _PANELS, f"n_protein must be one of {list(_PANELS)}"
  cache = os.path.join(DATA_DIR, f"facs_{n_protein}_preprocessed")
  if not os.path.isdir(cache):
    full = os.path.join(DATA_DIR, "facs_full_preprocessed")
    if not os.path.isdir(full):
      raise RuntimeError(
          f"FACS data requires a pre-placed cache at {full} or {cache} "
          "(the upstream bucket is not publicly addressable); folder format: "
          "save_to_dataset(X, X_col, y, y_col).")
    X, X_col, X_row, y, y_col = load_from_dataset(full)
    panel = [p for p in _PANELS[n_protein]]
    idx = [i for i, c in enumerate(np.asarray(y_col, str)) if c in panel]
    from ..utils import save_to_dataset
    save_to_dataset(cache, X, X_col, y=y[:, idx],
                    y_col=np.asarray(y_col, str)[idx], rowname=X_row,
                    print_log=verbose)
  X, X_col, X_row, y, y_col = load_from_dataset(cache)
  sco = SingleCellOMIC(X, cell_id=X_row, gene_id=X_col,
                       omic=OMIC.transcriptomic, name=f"facs_{n_protein}")
  sco.add_omic(OMIC.proteomic, y, y_col)
  return sco


def read_full_FACS(override: bool = False, verbose: bool = True
                   ) -> SingleCellOMIC:
  """All FACS proteins (the 7-panel superset)."""
  return read_FACS(7, override=override, verbose=verbose)
