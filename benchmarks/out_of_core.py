"""Out-of-core training benchmark — the >HBM regime.

Protocol: N cells × 500 genes synthetic counts (the scalability protocol's
gene width), batch 128, SCVI-class VAE. The HBM budget is capped via
``hbm_budget_bytes`` so the dataset exceeds it by a controlled factor, and
three data paths train the identical model:

  * streaming      — the pre-round fallback for >HBM data: per-step host
                     batches (scan_steps-chunked, int16 transfer compression)
  * out-of-core    — chunk partition, pinned residency + double-buffered
                     streamed uploads (this round's path)
  * resident       — unlimited budget (ceiling; only possible when the data
                     really fits)

Prints one JSON line per path: {"path", "cells_per_sec", "epochs", ...}.

Usage:  python benchmarks/out_of_core.py [--cells 200000] [--budget-mb 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--cells", type=int, default=200_000)
  ap.add_argument("--genes", type=int, default=500)
  ap.add_argument("--budget-mb", type=int, default=64)
  ap.add_argument("--epochs", type=int, default=4)
  ap.add_argument("--batch", type=int, default=128)
  ap.add_argument("--paths", default="streaming,out_of_core,resident")
  ap.add_argument("--gamma-shape", type=float, default=0.3,
                  help="rate~Gamma(shape,1.5): 0.3→~24%% density, "
                       "0.1→~10%% (realistic 10x)")
  args = ap.parse_args()

  from sisua_tpu.models import VAE, RVmeta
  from sisua_tpu.nn import NetConf

  import scipy.sparse as sp

  rng = np.random.default_rng(0)
  # realistic scRNA-seq sparsity (~88% zeros): most genes silent per cell,
  # a heavy tail of expressed ones; int16-compressible integer counts
  rate = rng.gamma(args.gamma_shape, 1.5,
                   size=(args.cells, args.genes)).astype(np.float32)
  X = sp.csr_matrix(rng.poisson(rate).astype(np.float32))
  del rate
  print(f"density: {X.nnz / (args.cells * args.genes):.3f}", flush=True)
  budget = args.budget_mb * 1024 * 1024

  def make():
    return VAE(RVmeta(args.genes, "zinb", name="rna"), seed=1,
               encoder=NetConf((64, 64)), decoder=NetConf((64, 64)))

  def steady(hist):
    # skip epoch 0 (compile); median of the rest
    times = hist["epoch_time"][1:]
    return args.cells / float(np.median(times)) if times else float("nan")

  for path in args.paths.split(","):
    m = make()
    t0 = time.time()
    if path == "streaming":
      m.fit(X, epochs=args.epochs, batch_size=args.batch,
            scan_steps=32, transfer_dtype="auto", verbose=False)
    elif path == "out_of_core":
      m.fit(X, epochs=args.epochs, batch_size=args.batch,
            device_cache=True, device_dtype="int16",
            hbm_budget_bytes=budget, verbose=True)
    elif path == "resident":
      m.fit(X, epochs=args.epochs, batch_size=args.batch,
            device_cache=True, device_dtype="int16", verbose=False)
    else:
      raise ValueError(path)
    print(json.dumps({
        "path": path,
        "cells_per_sec": round(steady(m.history), 1),
        "final_loss": round(float(m.history["loss"][-1]), 2),
        "wall_s": round(time.time() - t0, 1),
        "cells": args.cells, "budget_mb": args.budget_mb,
    }), flush=True)


if __name__ == "__main__":
  main()
