"""Generic 10x Genomics repository reader.

Capability parity with ``/root/reference/sisua/data/data_loader/
dataset10x.py:199-432``: download a dataset from the public 10x catalog
(cell-exp / cell-vdj / cell-atac releases), read the matrix-market triplet
(matrix.mtx, barcodes, features/genes), convert to CSR, cache, and wrap as a
SingleCellOMIC. 60+ catalog names are exposed through the registry aliases
('vdj1'-'vdj4', 'neuron10k', 'heart10k', '4k', '5k', '10k', '18k', …).
"""

from __future__ import annotations

import gzip
import os
import shutil
import tarfile
from typing import Optional

import numpy as np
from scipy import io as sp_io
from scipy import sparse

from ..const import OMIC
from ..dataset import SingleCellOMIC
from ..path import DATA_DIR, DOWNLOAD_DIR
from ..utils import (download_file, save_to_dataset, load_from_dataset,
                     validate_data_dir)

__all__ = ["read_dataset10x", "read_10x_mtx", "read_10x_h5", "TENX_CATALOG"]

_BASE = "http://cf.10xgenomics.com/samples"

# name → (release kind, version, 10x sample id)
TENX_CATALOG = {
    # cell-exp
    "pbmc4k": ("cell-exp", "2.1.0", "pbmc4k"),
    "pbmc8k": ("cell-exp", "2.1.0", "pbmc8k"),
    "pbmc_10k_protein_v3": ("cell-exp", "3.0.0", "pbmc_10k_protein_v3"),
    "5k_pbmc_protein_v3": ("cell-exp", "3.0.0", "5k_pbmc_protein_v3"),
    "pbmc_1k_protein_v3": ("cell-exp", "3.0.0", "pbmc_1k_protein_v3"),
    "malt_10k_protein_v3": ("cell-exp", "3.0.0", "malt_10k_protein_v3"),
    "neuron_10k_v3": ("cell-exp", "3.0.0", "neuron_10k_v3"),
    "heart_10k_v3": ("cell-exp", "3.0.0", "heart_10k_v3"),
    "neurons_900": ("cell-exp", "2.1.0", "neurons_900"),
    "pbmc33k": ("cell-exp", "1.1.0", "pbmc33k"),
    "pbmc3k": ("cell-exp", "1.1.0", "pbmc3k"),
    "pbmc6k": ("cell-exp", "1.1.0", "pbmc6k"),
    "pbmc68k": ("cell-exp", "1.1.0", "fresh_68k_pbmc_donor_a"),
    "t_3k": ("cell-exp", "2.1.0", "t_3k"),
    "t_4k": ("cell-exp", "2.1.0", "t_4k"),
    # reference registry alias: '18k' resolves to the pbmc8k run
    # (/root/reference/sisua/data/__init__.py:210)
    "18k": ("cell-exp", "2.1.0", "pbmc8k"),
    # cell-vdj (5' + feature barcode)
    "vdj_v1_hs_aggregated_donor1": ("cell-vdj", "3.1.0",
                                    "vdj_v1_hs_aggregated_donor1"),
    "vdj_v1_hs_aggregated_donor2": ("cell-vdj", "3.1.0",
                                    "vdj_v1_hs_aggregated_donor2"),
    "vdj_v1_hs_aggregated_donor3": ("cell-vdj", "3.1.0",
                                    "vdj_v1_hs_aggregated_donor3"),
    "vdj_v1_hs_aggregated_donor4": ("cell-vdj", "3.1.0",
                                    "vdj_v1_hs_aggregated_donor4"),
    # cell-atac
    "atac_v1_pbmc_5k": ("cell-atac", "1.1.0", "atac_v1_pbmc_5k"),
    "atac_v1_pbmc_10k": ("cell-atac", "1.1.0", "atac_v1_pbmc_10k"),
}


def _matrix_url(kind: str, version: str, sample: str, filtered: bool) -> str:
  tag = "filtered" if filtered else "raw"
  if kind == "cell-atac":
    fname = f"{sample}_{tag}_peak_bc_matrix.tar.gz"
  else:
    # v3 chemistry uses *_feature_bc_matrix, v2 uses *_gene_bc_matrices
    if version.startswith("3"):
      fname = f"{sample}_{tag}_feature_bc_matrix.tar.gz"
    else:
      fname = f"{sample}_{tag}_gene_bc_matrices.tar.gz"
  return f"{_BASE}/{kind}/{version}/{sample}/{fname}"


def _find(root: str, candidates) -> Optional[str]:
  for dirpath, _, files in os.walk(root):
    for f in files:
      if f in candidates:
        return os.path.join(dirpath, f)
  return None


def _read_text(path: str):
  op = gzip.open if path.endswith(".gz") else open
  with op(path, "rt") as f:
    return [line.rstrip("\n").split("\t") for line in f]


def _parse_10x_dir(dirpath: str, atac: bool = False):
  """Parse a CellRanger matrix directory (matrix.mtx[.gz] + barcodes +
  features/genes/peaks) → (X csr cells×features, cell_ids, feat_names,
  feat_types). Shared by the catalog reader and :func:`read_10x_mtx`."""
  mtx = _find(dirpath, {"matrix.mtx", "matrix.mtx.gz"})
  barcodes = _find(dirpath, {"barcodes.tsv", "barcodes.tsv.gz"})
  feats = _find(dirpath, {"features.tsv", "features.tsv.gz",
                          "genes.tsv", "genes.tsv.gz",
                          "peaks.bed", "peaks.bed.gz"})
  assert mtx and barcodes and feats, (
      f"Incomplete 10x matrix directory in {dirpath}: need matrix.mtx[.gz], "
      "barcodes.tsv[.gz] and features/genes.tsv[.gz] (or peaks.bed)")
  X = sp_io.mmread(mtx).T.tocsr().astype(np.float32)  # cells × features
  cell_ids = [r[0] for r in _read_text(barcodes)]
  feat_rows = _read_text(feats)
  if feats.endswith((".bed", ".bed.gz")) or (atac and len(feat_rows[0]) == 3
                                             and feat_rows[0][1].isdigit()):
    feat_names = [f"{r[0]}:{r[1]}:{r[2]}" for r in feat_rows]
    feat_types = ["Peaks"] * len(feat_names)
  else:
    feat_names = [r[1] if len(r) > 1 else r[0] for r in feat_rows]
    feat_types = [r[2] if len(r) > 2 else "Gene Expression"
                  for r in feat_rows]
  return X, cell_ids, np.asarray(feat_names), np.asarray(feat_types)


def _sco_from_parsed(X, cell_ids, feat_names, feat_types, name: str,
                     filtered_genes: bool = False) -> SingleCellOMIC:
  """Split Antibody Capture columns into a proteomic omic and wrap the rest
  as the main omic (Peaks → atac); optional all-zero feature drop."""
  is_adt = feat_types == "Antibody Capture"
  is_peaks = (feat_types == "Peaks").all() if len(feat_types) else False
  X_main = X[:, ~is_adt] if is_adt.any() else X
  names_main = feat_names[~is_adt] if is_adt.any() else feat_names
  if filtered_genes:
    keep = np.asarray((X_main > 0).sum(0)).ravel() > 0
    X_main, names_main = X_main[:, keep], names_main[keep]
  sco = SingleCellOMIC(X_main, cell_id=cell_ids, gene_id=names_main,
                       omic=OMIC.atac if is_peaks else OMIC.transcriptomic,
                       name=name)
  if is_adt.any():
    adt = X[:, is_adt]
    adt = np.asarray(adt.todense() if sparse.issparse(adt) else adt,
                     np.float32)
    sco.add_omic(OMIC.proteomic, adt, feat_names[is_adt])
  return sco


def read_10x_mtx(path: str, name: Optional[str] = None,
                 filtered_genes: bool = False) -> SingleCellOMIC:
  """Read a user-local CellRanger matrix directory (``matrix.mtx[.gz]`` +
  ``barcodes.tsv[.gz]`` + ``features/genes.tsv[.gz]`` or ``peaks.bed``)
  straight into a :class:`SingleCellOMIC` — the scanpy ``read_10x_mtx``
  onboarding surface, no download/cache involved. CITE-seq feature matrices
  split into transcriptomic + proteomic omics ('Antibody Capture' rows);
  peak features become the atac omic. ``filtered_genes=True`` drops
  all-zero features (reference dataset10x.py:199-432 semantics)."""
  path = os.path.abspath(os.path.expanduser(path))
  assert os.path.isdir(path), f"Not a directory: {path}"
  X, cell_ids, feat_names, feat_types = _parse_10x_dir(path)
  return _sco_from_parsed(X, cell_ids, feat_names, feat_types,
                          name or os.path.basename(path.rstrip("/")),
                          filtered_genes)


def read_10x_h5(path: str, name: Optional[str] = None,
                filtered_genes: bool = False) -> SingleCellOMIC:
  """Read a CellRanger ``.h5`` feature-barcode matrix (v3 ``/matrix`` group,
  or the legacy v2 per-genome layout) into a :class:`SingleCellOMIC` —
  the scanpy ``read_10x_h5`` onboarding surface. Antibody Capture features
  split into the proteomic omic; Peaks → atac."""
  import h5py
  path = os.path.abspath(os.path.expanduser(path))
  with h5py.File(path, "r") as f:
    if "matrix" in f:  # CellRanger v3+
      g = f["matrix"]
      feat_names = g["features/name"][:].astype(str)
      feat_types = (g["features/feature_type"][:].astype(str)
                    if "features/feature_type" in g
                    else np.asarray(["Gene Expression"] * len(feat_names)))
    else:  # legacy v2: one group per genome
      genomes = list(f.keys())
      assert len(genomes) >= 1, f"Empty 10x h5 file: {path}"
      g = f[genomes[0]]
      feat_names = g["gene_names"][:].astype(str)
      feat_types = np.asarray(["Gene Expression"] * len(feat_names))
    n_feat, n_cells = (int(x) for x in g["shape"][:])
    X = sparse.csc_matrix(
        (g["data"][:].astype(np.float32), g["indices"][:], g["indptr"][:]),
        shape=(n_feat, n_cells)).T.tocsr()
    cell_ids = [b for b in g["barcodes"][:].astype(str)]
  return _sco_from_parsed(X, cell_ids, feat_names, np.asarray(feat_types),
                          name or os.path.splitext(os.path.basename(path))[0],
                          filtered_genes)


def read_dataset10x(name: str,
                    filtered_cells: bool = True,
                    filtered_genes: bool = True,
                    override: bool = False,
                    verbose: bool = True) -> SingleCellOMIC:
  """Load a 10x catalog dataset by name → SingleCellOMIC (transcriptomic or
  atac omic; CITE-seq feature matrices split into RNA + ADT omics)."""
  if name not in TENX_CATALOG:
    raise KeyError(f"Unknown 10x dataset '{name}'; "
                   f"known: {sorted(TENX_CATALOG)}")
  kind, version, sample = TENX_CATALOG[name]
  cache = os.path.join(
      DATA_DIR, f"10x_{name}_{'filtered' if filtered_cells else 'raw'}"
      f"{'' if filtered_genes else 'all'}_preprocessed")
  if validate_data_dir(cache) and not override:
    return _from_cache(cache, name, kind)

  url = _matrix_url(kind, version, sample, filtered_cells)
  tar_path = os.path.join(DOWNLOAD_DIR, os.path.basename(url))
  download_file(url, tar_path)
  # per-variant dir (filtered vs raw archives must not share), and a
  # completion marker so a crash mid-extraction re-extracts
  variant = "filtered" if filtered_cells else "raw"
  extract_dir = os.path.join(DOWNLOAD_DIR, f"10x_{name}_{variant}")
  done_marker = os.path.join(extract_dir, ".extracted")
  if not os.path.isfile(done_marker):
    os.makedirs(extract_dir, exist_ok=True)
    with tarfile.open(tar_path) as t:
      t.extractall(extract_dir, filter="data")
    with open(done_marker, "w") as f:
      f.write(os.path.basename(url))

  X, cell_ids, feat_names, feat_types = _parse_10x_dir(
      extract_dir, atac=(kind == "cell-atac"))
  is_adt = feat_types == "Antibody Capture"
  main_omic = OMIC.atac if kind == "cell-atac" else OMIC.transcriptomic
  X_main = X[:, ~is_adt] if is_adt.any() else X
  names_main = feat_names[~is_adt] if is_adt.any() else feat_names
  if not filtered_genes:
    keep = slice(None)
  else:  # drop all-zero features
    keep = np.asarray((X_main > 0).sum(0)).ravel() > 0
    X_main, names_main = X_main[:, keep], names_main[keep]

  y = y_col = None
  if is_adt.any():
    y = np.asarray(X[:, is_adt].todense(), np.float32)
    y_col = feat_names[is_adt]
  save_to_dataset(cache, X_main, names_main, y=y, y_col=y_col,
                  rowname=cell_ids, print_log=verbose)
  return _from_cache(cache, name, kind)


def _from_cache(cache: str, name: str, kind: str) -> SingleCellOMIC:
  X, X_col, X_row, y, y_col = load_from_dataset(cache)
  omic = OMIC.atac if kind == "cell-atac" else OMIC.transcriptomic
  sco = SingleCellOMIC(X, cell_id=X_row, gene_id=X_col, omic=omic,
                       name=f"10x_{name}")
  if y is not None:
    sco.add_omic(OMIC.proteomic, y, y_col)
  return sco
