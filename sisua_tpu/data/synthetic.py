"""Synthetic single-cell datasets (in-memory, no network).

The reference's tests download real datasets; this environment has zero
network egress, so the test/bench path uses seeded synthetic data with the
same structure: clustered ZINB transcriptomic counts + NB protein counts tied
to cell type + one-hot celltype labels. The generative recipe mirrors the
scVI simulation protocol (per-cluster gene programs, per-cell library size,
zero inflation), giving data where imputation/correlation metrics behave like
the real thing.

Also implements the *scalability protocol* sizes from the reference
(``/root/reference/tests/test_scalability.py:22-28``: cells ∈ {200 … 1M} ×
500 genes × 10 proteins).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from scipy import sparse

from .const import OMIC
from .dataset import SingleCellOMIC

__all__ = ["generate_synthetic", "read_synthetic"]


def generate_synthetic(n_cells: int = 3000,
                       n_genes: int = 558,
                       n_proteins: int = 10,
                       n_celltypes: int = 7,
                       zero_inflation: float = 0.3,
                       library_loc: float = 7.0,
                       library_scale: float = 0.4,
                       sparse_format: bool = True,
                       seed: int = 5218,
                       name: str = "synthetic") -> SingleCellOMIC:
  """Clustered multi-omic counts → SingleCellOMIC with 3 omics."""
  rng = np.random.default_rng(seed)
  # per-celltype gene programs (log-space archetypes)
  archetypes = rng.normal(0.0, 1.0, size=(n_celltypes, n_genes)
                          ).astype(np.float32)
  celltype = rng.integers(0, n_celltypes, size=n_cells)
  theta = 2.0  # typical NB over-dispersion
  # Generate in row chunks of float32: at 1M cells the straightforward
  # whole-matrix float64 pipeline allocates a chain of multi-GB temporaries
  # whose huge-page zeroing dominates wall-clock on virtualized hosts.
  X = np.empty((n_cells, n_genes), np.float32)
  Y = np.empty((n_cells, n_proteins), np.float32)
  prot_arch = np.abs(rng.normal(2.0, 1.0, size=(n_celltypes, n_proteins))
                     ).astype(np.float32)
  chunk = max(1, min(n_cells, 100_000))
  for lo in range(0, n_cells, chunk):
    hi = min(lo + chunk, n_cells)
    ct = celltype[lo:hi]
    logits = archetypes[ct] + rng.normal(
        0, 0.3, (hi - lo, n_genes)).astype(np.float32)
    props = np.exp(logits, out=logits)  # reuse the buffer
    props /= props.sum(1, keepdims=True)
    lib = np.exp(rng.normal(library_loc, library_scale,
                            size=(hi - lo, 1))).astype(np.float32)
    rate = props * lib
    g = rng.gamma(theta, rate / theta).astype(np.float32)
    Xc = rng.poisson(g).astype(np.float32)
    Xc *= (rng.random((hi - lo, n_genes)) > zero_inflation)
    X[lo:hi] = Xc
    prot_rate = prot_arch[ct] * np.exp(
        rng.normal(0, 0.2, (hi - lo, n_proteins)).astype(np.float32)) * 20.0
    gp = rng.gamma(theta, prot_rate / theta).astype(np.float32)
    Y[lo:hi] = rng.poisson(gp).astype(np.float32)

  # use real marker names so marker-based metrics (gene↔protein correlation,
  # importance, marker pairs) are exercised end-to-end on synthetic data
  from .const import MARKER_ADT_GENE, MARKER_ADTS
  prot_names = np.array(
      (MARKER_ADTS + [f"Protein{i:02d}" for i in range(n_proteins)])
      [:n_proteins])
  paired_genes = [MARKER_ADT_GENE[p] for p in prot_names
                  if p in MARKER_ADT_GENE]
  gene_names = np.array([f"Gene{i:04d}" for i in range(n_genes)], dtype=object)
  seen = set()
  gi = 0
  for g in paired_genes:
    if g not in seen and gi < n_genes:
      gene_names[gi] = g
      seen.add(g)
      gi += 1
  gene_names = gene_names.astype(str)
  # tie each marker gene's counts to its protein so correlations are real
  for j, p in enumerate(prot_names):
    g = MARKER_ADT_GENE.get(str(p))
    if g is not None:
      k = int(np.nonzero(gene_names == g)[0][0])
      lam = Y[:, j] * 0.05 + 0.5
      X[:, k] = rng.poisson(lam).astype(np.float32)
  ct_names = np.array([f"CellType{i}" for i in range(n_celltypes)])

  Xmat = sparse.csr_matrix(X) if sparse_format else X
  sco = SingleCellOMIC(Xmat,
                       cell_id=[f"Cell{i:06d}" for i in range(n_cells)],
                       gene_id=gene_names,
                       omic=OMIC.transcriptomic,
                       name=name)
  sco.add_omic(OMIC.proteomic, Y, prot_names)
  onehot = np.eye(n_celltypes, dtype=np.float32)[celltype]
  sco.add_omic(OMIC.celltype, onehot, ct_names)
  return sco


def read_synthetic(spec: str = "", **kwargs) -> SingleCellOMIC:
  """Registry entry: 'synthetic' or 'synthetic<k>' with k cells in
  {200, 500, 1k, 2k, 5k, 10k, 40k, 100k, 1m} (scalability protocol)."""
  sizes = {"200": 200, "500": 500, "1k": 1000, "2k": 2000, "5k": 5000,
           "10k": 10000, "40k": 40000, "100k": 100000, "1m": 1000000}
  spec = spec.lower().replace("synthetic", "").strip("_")
  if spec in sizes:
    return generate_synthetic(n_cells=sizes[spec], n_genes=500,
                              n_proteins=10,
                              name=f"synthetic{spec}", **kwargs)
  return generate_synthetic(name="synthetic", **kwargs)
