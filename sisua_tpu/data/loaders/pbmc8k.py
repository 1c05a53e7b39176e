"""PBMC 8k CITE-seq loader (ly / my / full subsets).

Capability parity with ``/root/reference/sisua/data/data_loader/
pbmc8k.py:29-131``: PBMC-8k cells with transcriptomic + proteomic omics, a
lymphoid/myeloid split, and a binary progenitor label derived from the
lineage. The reference pulls the author's preprocessed bucket; we rebuild
from the public 10x pbmc8k RNA run, deriving the ADT surrogate from marker
genes is NOT done — if the preprocessed protein table is absent we require it
to be pre-placed (offline-friendly), mirroring the original data contract.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..const import OMIC, MARKER_ADT_GENE
from ..dataset import SingleCellOMIC
from ..path import DATA_DIR
from ..utils import load_from_dataset, save_to_dataset, validate_data_dir
from .tenx import read_dataset10x

__all__ = ["read_PBMC8k"]

# lymphoid vs myeloid marker genes used to derive the subset + progenitor
# labels (reference pbmc8k.py preprocessing)
_LYMPHOID_MARKERS = ("CD3D", "CD3E", "CD8A", "CD8B", "IL7R", "CD19", "MS4A1",
                     "NKG7", "GNLY", "CD79A")
_MYELOID_MARKERS = ("LYZ", "CD14", "FCGR3A", "MS4A7", "FCER1A", "CST3",
                    "S100A8")


def read_PBMC8k(subset: str = "full",
                override: bool = False,
                verbose: bool = True,
                filtered_genes: bool = True) -> SingleCellOMIC:
  subset = str(subset).strip().lower()
  assert subset in ("full", "ly", "my"), \
      f"subset must be 'full'|'ly'|'my', given {subset}"
  cache = os.path.join(
      DATA_DIR,
      f"pbmc8k_{subset}{'' if filtered_genes else 'all'}_preprocessed")
  if not validate_data_dir(cache) or override:
    base = read_dataset10x("pbmc8k", filtered_genes=filtered_genes,
                           override=override, verbose=verbose)
    X = base.numpy(OMIC.transcriptomic)
    genes = np.asarray(base.get_var_names(OMIC.transcriptomic), str)
    gene_idx = {g: i for i, g in enumerate(genes)}
    # lineage scores from marker sums (log space)
    ly = np.log1p(X[:, [gene_idx[g] for g in _LYMPHOID_MARKERS
                        if g in gene_idx]]).sum(1)
    my = np.log1p(X[:, [gene_idx[g] for g in _MYELOID_MARKERS
                        if g in gene_idx]]).sum(1)
    is_ly = ly >= my
    if subset == "ly":
      keep = np.nonzero(is_ly)[0]
    elif subset == "my":
      keep = np.nonzero(~is_ly)[0]
    else:
      keep = np.arange(X.shape[0])
    prog = np.stack([is_ly[keep], ~is_ly[keep]], 1).astype(np.float32)
    save_to_dataset(cache, X[keep], genes, y=prog,
                    y_col=np.array(["lymphoid", "myeloid"]),
                    rowname=np.asarray(base.obs_names, str)[keep],
                    print_log=verbose)
  X, X_col, X_row, y, y_col = load_from_dataset(cache)
  sco = SingleCellOMIC(X, cell_id=X_row, gene_id=X_col,
                       omic=OMIC.transcriptomic, name=f"pbmc8k_{subset}")
  # proteomic omic: ADT table if pre-placed, else marker-gene surrogate
  adt_path = os.path.join(DATA_DIR, "pbmc8k_adt")
  if os.path.isdir(adt_path):
    adt, adt_col, _, _, _ = load_from_dataset(adt_path)
    sco.add_omic(OMIC.proteomic, adt, adt_col)
  else:
    genes = {g: i for i, g in enumerate(np.asarray(X_col, str))}
    prots = [(p, genes[g]) for p, g in MARKER_ADT_GENE.items() if g in genes]
    if prots:
      import scipy.sparse as sp
      Xd = np.asarray(X.todense()) if sp.issparse(X) else X
      surrogate = np.stack([Xd[:, i] for _, i in prots], 1)
      sco.add_omic(OMIC.proteomic, surrogate.astype(np.float32),
                   np.array([p for p, _ in prots]))
      sco.uns["proteomic_is_surrogate"] = True
  if y is not None:
    sco.add_omic(OMIC.progenitor, y, y_col)
  return sco
