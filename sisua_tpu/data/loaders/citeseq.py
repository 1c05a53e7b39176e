"""CITE-seq PBMC / CBMC loaders (GSE100866, Stoeckius et al. 2017).

Capability parity with ``/root/reference/sisua/data/data_loader/
pbmc_CITEseq.py:46-137`` and ``cbmc_CITEseq.py:26``: paired RNA + ADT count
matrices from the original CITE-seq study, downloaded from GEO, filtered to
human cells (the study spikes in mouse cells), cached as (X=RNA, y=ADT).
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import pandas as pd

from ..const import OMIC
from ..dataset import SingleCellOMIC
from ..path import DATA_DIR, DOWNLOAD_DIR
from ..utils import (download_file, load_from_dataset, save_to_dataset,
                     standardize_protein_name, validate_data_dir)

__all__ = ["read_CITEseq_PBMC", "read_CITEseq_CBMC"]

_GEO = "https://www.ncbi.nlm.nih.gov/geo/download/?acc=GSE100866&format=file&file="
_FILES = {
    "cbmc": {
        "rna": "GSE100866%5FCBMC%5F8K%5F13AB%5F10X%2DRNA%5Fumi%2Ecsv%2Egz",
        "adt": "GSE100866%5FCBMC%5F8K%5F13AB%5F10X%2DADT%5Fumi%2Ecsv%2Egz",
    },
    "pbmc": {
        "rna": "GSE100866%5FPBMC%5Fvs%5Fflow%5F10X%2DRNA%5Fumi%2Ecsv%2Egz",
        "adt": "GSE100866%5FPBMC%5Fvs%5Fflow%5F10X%2DADT%5Fumi%2Ecsv%2Egz",
    },
}


def _read_csv_matrix(path: str) -> pd.DataFrame:
  with gzip.open(path, "rt") as f:
    return pd.read_csv(f, index_col=0)


def _load_citeseq(which: str, filtered_genes: bool, override: bool,
                  verbose: bool) -> SingleCellOMIC:
  cache = os.path.join(
      DATA_DIR,
      f"{which}_citeseq{'' if filtered_genes else 'all'}_preprocessed")
  if not validate_data_dir(cache) or override:
    files = {}
    for kind, fname in _FILES[which].items():
      out = os.path.join(DOWNLOAD_DIR, f"{which}_{kind}.csv.gz")
      download_file(_GEO + fname, out)
      files[kind] = out
    rna = _read_csv_matrix(files["rna"])  # genes × cells
    adt = _read_csv_matrix(files["adt"])
    # keep human cells: study prefixes genes HUMAN_/MOUSE_
    human_genes = [g for g in rna.index if str(g).startswith("HUMAN_")]
    if human_genes:
      human_counts = rna.loc[human_genes].sum(axis=0)
      total_counts = rna.sum(axis=0)
      keep_cells = (human_counts / total_counts) > 0.9
      rna = rna.loc[human_genes, keep_cells]
      adt = adt.loc[:, keep_cells]
      rna.index = [g[len("HUMAN_"):] for g in rna.index]
    X = rna.values.T.astype(np.float32)  # cells × genes
    Y = adt.values.T.astype(np.float32)
    gene_names = np.asarray(rna.index, str)
    prot_names = np.asarray(standardize_protein_name(list(adt.index)), str)
    if filtered_genes:  # drop near-silent genes
      keep = (X > 0).sum(0) >= max(1, int(0.01 * X.shape[0]))
      X, gene_names = X[:, keep], gene_names[keep]
    from scipy import sparse
    save_to_dataset(cache, sparse.csr_matrix(X), gene_names, y=Y,
                    y_col=prot_names,
                    rowname=np.asarray(rna.columns, str),
                    print_log=verbose)
  X, X_col, X_row, y, y_col = load_from_dataset(cache)
  sco = SingleCellOMIC(X, cell_id=X_row, gene_id=X_col,
                       omic=OMIC.transcriptomic, name=f"{which}_citeseq")
  sco.add_omic(OMIC.proteomic, y, y_col)
  return sco


def read_CITEseq_PBMC(override: bool = False, verbose: bool = True,
                      filtered_genes: bool = True) -> SingleCellOMIC:
  return _load_citeseq("pbmc", filtered_genes, override, verbose)


def read_CITEseq_CBMC(override: bool = False, verbose: bool = True,
                      filtered_genes: bool = True) -> SingleCellOMIC:
  return _load_citeseq("cbmc", filtered_genes, override, verbose)
