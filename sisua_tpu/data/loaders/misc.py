"""Miscellaneous loaders: human embryos, centenarian, melanoma cisTopic,
SCALE ATAC sets, mouse ATAC atlas.

Capability parity with the reference loaders
(``/root/reference/sisua/data/data_loader/``: human_preimplantation_embryos.py,
centenarian.py, cisTopic_data.py, scale_datasets.py, mouse_atlas.py). These
sources are GEO/author-bucket supplements needing either R conversion or
large downloads; each loader consumes the standard (X, y) cache folder and
raises an actionable message when it is absent (offline environment).
"""

from __future__ import annotations

import os

import numpy as np

from ..const import OMIC
from ..dataset import SingleCellOMIC
from ..path import DATA_DIR
from ..utils import load_from_dataset

__all__ = [
    "read_human_embryos", "read_centenarian", "read_melanoma_cisTopicData",
    "read_scale_dataset", "read_mouse_ATLAS",
]


def _from_cache(cache_name: str, ds_name: str, main_omic: OMIC,
                label_omic: OMIC, source_hint: str) -> SingleCellOMIC:
  cache = os.path.join(DATA_DIR, cache_name)
  if not os.path.isdir(cache):
    raise RuntimeError(
        f"Dataset '{ds_name}' requires a pre-placed cache at {cache} "
        f"(source: {source_hint}); folder format: save_to_dataset "
        "(X.sparse.npz/X.npz, X_col.npz, X_row.npz[, y, y_col]).")
  X, X_col, X_row, y, y_col = load_from_dataset(cache)
  sco = SingleCellOMIC(X, cell_id=X_row, gene_id=X_col, omic=main_omic,
                       name=ds_name)
  if y is not None:
    sco.add_omic(label_omic, y, y_col)
  return sco


def read_human_embryos(filtered_genes: bool = True, override: bool = False,
                       verbose: bool = True) -> SingleCellOMIC:
  """Human preimplantation embryos (Petropoulos 2016, E-MTAB-3929)."""
  return _from_cache(
      f"embryos{'' if filtered_genes else 'all'}_preprocessed", "embryos",
      OMIC.transcriptomic, OMIC.celltype,
      "ArrayExpress E-MTAB-3929 rpkm.txt + sample sheet")


def read_centenarian(override: bool = False, verbose: bool = True
                     ) -> SingleCellOMIC:
  """Supercentenarian blood single cells (Hashimoto 2019, PBMC)."""
  return _from_cache("centenarian_preprocessed", "centenarian",
                     OMIC.transcriptomic, OMIC.celltype,
                     "GSE136722 supplementary matrices")


def read_melanoma_cisTopicData(filtered_genes: bool = True,
                               override: bool = False,
                               verbose: bool = True) -> SingleCellOMIC:
  """Melanoma scATAC from the cisTopic study (Bravo González-Blas 2019)."""
  return _from_cache(
      f"melanoma_atac{'' if filtered_genes else 'all'}_preprocessed",
      "melanoma_atac", OMIC.atac, OMIC.celltype,
      "cisTopic melanoma counts (GSE114557) — .rds needing R conversion")


def read_scale_dataset(name: str = "forebrain", override: bool = False,
                       verbose: bool = True) -> SingleCellOMIC:
  """SCALE-paper scATAC benchmark sets (Xiong 2019): forebrain, splenocyte,
  mouse_atlas subsets, etc."""
  return _from_cache(f"scale_{name}_preprocessed", f"scale_{name}",
                     OMIC.atac, OMIC.celltype,
                     "SCALE paper data (github.com/jsxlei/SCALE)")


def read_mouse_ATLAS(filtered_genes: bool = True, override: bool = False,
                     verbose: bool = True) -> SingleCellOMIC:
  """Mouse sci-ATAC atlas (Cusanovich 2018)."""
  return _from_cache(
      f"mouse_atlas{'' if filtered_genes else 'all'}_preprocessed",
      "mouse_atlas", OMIC.atac, OMIC.celltype,
      "atlas.gs.washington.edu/mouse-atac matrices")
