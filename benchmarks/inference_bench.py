"""Inference/serving throughput: cells/sec for the three predict paths.

The serving workflow is corrupt-free batch scoring: counts in → imputed
means + latent embeddings out (``sisua-predict``). This measures, on one
chip, for a trained SCVI at the scalability-protocol shape and at the
full-transcriptome width:

  * ``predict``              — full distribution params fetched per batch
                               (the reference's predict semantics, :153-211)
  * ``predict device_cache`` — all batches inside ONE executable, one fetch
  * ``predict_mean``         — posterior means reduced on device, the
                               low-traffic serving path (ships (n,d) arrays)

  PYTHONPATH=/root/.axon_site:. python benchmarks/inference_bench.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def bench(fn, n_cells, repeats=2):
  fn()  # compile
  times = []
  for _ in range(repeats):
    t0 = time.perf_counter()
    fn()
    times.append(time.perf_counter() - t0)
  import numpy as np
  med = float(np.median(times))
  return n_cells / med, med


def main(argv=None):
  p = argparse.ArgumentParser("inference-bench")
  p.add_argument("--cells", type=int, default=20_000)
  p.add_argument("--stream-cells", type=int, default=2_000,
                 help="cell count for the transfer-bound streaming path")
  p.add_argument("--genes", type=int, default=500)
  p.add_argument("--batch", type=int, default=512)
  p.add_argument("--mc", type=int, default=10)
  p.add_argument("--train-epochs", type=int, default=4)
  args = p.parse_args(argv)

  from sisua_tpu.data import generate_synthetic
  from sisua_tpu.models import SCVI, RVmeta

  sco = generate_synthetic(n_cells=args.cells, n_genes=args.genes,
                           n_proteins=10, seed=5218)
  model = SCVI(RVmeta(args.genes, "zinbd", name="rna"))
  model.fit(sco, epochs=args.train_epochs, batch_size=128, valid_freq=0,
            patience=0, device_cache=True, verbose=False)

  sco_small = sco[:args.stream_cells]
  results = {}
  # cheap on-device paths first at full size; the streaming path ships the
  # full distribution params x MC per batch (transfer-bound over a tunnel)
  # and is measured at a smaller size (2 repeats, like every path)
  paths = [
      ("predict_mean", args.cells, 2, lambda: model.predict_mean(
          sco, sample_shape=(args.mc,), batch_size=args.batch)),
      ("predict_mean_bf16_fetch", args.cells, 2,
       lambda: model.predict_mean(sco, sample_shape=(args.mc,),
                                  batch_size=args.batch,
                                  fetch_dtype="bfloat16")),
      ("predict_device_cache", args.cells, 2, lambda: model.predict(
          sco, sample_shape=(args.mc,), batch_size=args.batch,
          device_cache=True)),
      # ≥2 repeats like every other path: the tunnel's transient stalls
      # (±30% documented) make any single-run number untrustworthy
      ("predict_streaming", args.stream_cells, 2, lambda: model.predict(
          sco_small, sample_shape=(args.mc,), batch_size=args.batch)),
  ]
  for name, n, reps, fn in paths:
    cps, sec = bench(fn, n, repeats=reps)
    results[name] = {"cells": n, "cells_per_sec": round(cps, 0),
                     "seconds": round(sec, 3)}
    print(json.dumps({"path": name, **results[name]}), flush=True)
  return results


if __name__ == "__main__":
  main()
