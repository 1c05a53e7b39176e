"""Atlas-scale out-of-core benchmark: full-transcriptome data LARGER than HBM.

200k cells × 33k genes at 7% density (realistic 10x full-transcriptome
sparsity) is ~13 GB dense int16 — beyond the device budget of one v5e, so
`fit(device_cache=True)` engages the out-of-core path with the REAL
detected HBM budget (no forced override): HBM-sized chunks, pinned
residency for the fraction that fits, sparse CSR-triplet uploads for the
streamed remainder.

The dataset is synthesized directly in CSR in row blocks (a dense 26 GB
float intermediate would not fit host RAM comfortably and Poisson over
6.6e9 entries is minutes of work).

Usage:  python benchmarks/atlas_scale.py [--cells 200000] [--epochs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp


def make_sparse_counts(n_cells: int, n_genes: int, nnz_per_row: int,
                       seed: int = 0, block: int = 20_000) -> sp.csr_matrix:
  """Row-block CSR synthesis: per row, ~nnz_per_row unique sorted columns
  with small integer counts (duplicates dropped — the triplet scatter-add
  and the CSR row-gather must agree on semantics, so rows keep unique
  column indices)."""
  rng = np.random.default_rng(seed)
  parts = []
  for lo in range(0, n_cells, block):
    b = min(block, n_cells - lo)
    cols = rng.integers(0, n_genes, size=(b, nnz_per_row), dtype=np.int32)
    cols.sort(axis=1)
    keep = np.ones_like(cols, bool)
    keep[:, 1:] = cols[:, 1:] != cols[:, :-1]  # drop duplicate columns
    lens = keep.sum(1).astype(np.int64)
    data = (1.0 + rng.poisson(1.0, size=int(lens.sum()))).astype(np.float32)
    indptr = np.zeros(b + 1, np.int64)
    np.cumsum(lens, out=indptr[1:])
    parts.append(sp.csr_matrix((data, cols[keep].astype(np.int32), indptr),
                               shape=(b, n_genes)))
  return sp.vstack(parts).tocsr()


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--cells", type=int, default=200_000)
  ap.add_argument("--genes", type=int, default=33_000)
  ap.add_argument("--nnz-per-row", type=int, default=2_310)  # ~7%
  ap.add_argument("--epochs", type=int, default=3)
  ap.add_argument("--batch", type=int, default=256)
  ap.add_argument("--budget-mb", type=int, default=0,
                  help="0 = use the real detected HBM budget")
  args = ap.parse_args()

  t0 = time.time()
  X = make_sparse_counts(args.cells, args.genes, args.nnz_per_row)
  gb = (X.data.nbytes + X.indices.nbytes + X.indptr.nbytes) / 1e9
  dense_gb = args.cells * args.genes * 2 / 1e9
  print(f"[{time.time()-t0:6.1f}s] dataset: {args.cells:,} × "
        f"{args.genes:,}, density {X.nnz/(args.cells*args.genes):.3f}, "
        f"{gb:.1f} GB CSR host / {dense_gb:.1f} GB dense int16",
        flush=True)

  from sisua_tpu.models import VAE, RVmeta
  from sisua_tpu.nn import NetConf

  m = VAE(RVmeta(args.genes, "zinb", name="rna"), seed=1,
          encoder=NetConf((128,)), decoder=NetConf((128,)))
  m.fit(X, epochs=args.epochs, batch_size=args.batch,
        device_cache=True, device_dtype="int16",
        hbm_budget_bytes=(args.budget_mb * 1024 ** 2 or None),
        verbose=True)
  times = m.history["epoch_time"][1:]
  cps = args.cells / float(np.median(times)) if times else float("nan")
  print(json.dumps({
      "metric": "atlas_scale_oc_cells_per_sec", "value": round(cps, 1),
      "cells": args.cells, "genes": args.genes,
      "dense_gb": round(dense_gb, 1),
      "final_loss": round(float(m.history["loss"][-1]), 2),
  }), flush=True)


if __name__ == "__main__":
  main()
