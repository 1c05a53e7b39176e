"""Scalability protocol: fit/predict wall-clock over a cell-count grid.

The reference's measurement script (``/root/reference/tests/
test_scalability.py:22-28,61-96``): cells ∈ {200, 500, 1k, 2k, 5k, 10k, 40k,
100k, 1M} × 500 genes × 10 proteins, batch 128, models scVAE vs SISUA —
wall-clock to CSV. This version runs both the unsupervised VAE and SISUA
with device-resident training and records steady-state cells/sec as well.

  PYTHONPATH=/root/.axon_site:. python benchmarks/scalability.py \
      --sizes 1k,10k,100k --epochs 10 --out /tmp/scalability.csv
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

# single source of truth for the protocol sizes: the synthetic registry
from sisua_tpu.data.synthetic import SYNTHETIC_SIZES as SIZES  # noqa: E402
from sisua_tpu.utils import steady_window_rates  # noqa: E402


def main(argv=None):
  p = argparse.ArgumentParser("scalability")
  p.add_argument("--sizes", default="1k,10k,40k")
  p.add_argument("--epochs", type=int, default=10)
  p.add_argument("--batch", type=int, default=128)
  p.add_argument("--metrics-interval", type=int, default=4,
                 help="epochs per executable window (multi-epoch scan)")
  p.add_argument("--out", default="/tmp/sisua_scalability.csv")
  args = p.parse_args(argv)

  import numpy as np
  from sisua_tpu.data import generate_synthetic
  from sisua_tpu.models import SISUA, VAE, NetConf, RVmeta

  rows = []
  for size_name in args.sizes.split(","):
    n = SIZES[size_name.strip().lower()]
    sco = generate_synthetic(n_cells=n, n_genes=500, n_proteins=10,
                             seed=5218)
    for model_name in ("vae", "sisua"):
      if model_name == "vae":
        model = VAE(RVmeta(500, "zinb", name="rna"),
                    encoder=NetConf((64, 64), batchnorm=True),
                    decoder=NetConf((64, 64), batchnorm=True))
      else:
        model = SISUA([RVmeta(500, "zinb", name="rna"),
                       RVmeta(10, "nb", name="adt")],
                      encoder=NetConf((64, 64), batchnorm=True),
                      decoder=NetConf((64, 64), batchnorm=True))
      t0 = time.perf_counter()
      model.fit(sco, epochs=args.epochs, batch_size=args.batch,
                labels_percent=0.5, valid_freq=0, patience=0,
                device_cache=True, metrics_interval=args.metrics_interval)
      fit_s = time.perf_counter() - t0
      # one rate per steady measurement unit (full window, or per epoch
      # when epochs < interval and the trainer ran per-epoch executables),
      # compile unit dropped — bench.py's protocol; a flat rates[1:] mean
      # would be dominated by compile-tainted epochs
      rates = steady_window_rates(model.history["cells_per_sec"],
                                  args.epochs, args.metrics_interval)
      # predict on a capped subset (compile + serving time, not a full
      # dataset scan); the cap is recorded so predict throughput can be
      # computed from the row
      n_predict = min(n, 10000)
      t0 = time.perf_counter()
      model.predict(sco[np.arange(n_predict)], batch_size=1024)
      predict_s = time.perf_counter() - t0
      row = dict(model=model_name, n_cells=n, epochs=args.epochs,
                 batch=args.batch, fit_seconds=round(fit_s, 3),
                 steady_cells_per_sec=round(float(np.median(rates)), 1),
                 predict_cells=n_predict,
                 predict_seconds=round(predict_s, 3))
      rows.append(row)
      print(row)
  os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
  with open(args.out, "w", newline="") as f:
    w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
    w.writeheader()
    w.writerows(rows)
  print("→", args.out)


if __name__ == "__main__":
  main()
