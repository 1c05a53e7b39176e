"""Model-zoo quality sweep on real hardware: train every family on the same
synthetic benchmark dataset and tabulate test metrics.

Produces the RESULTS.md table: per model — final train loss, test imputation
scores, marker spearman, protein F1, latent ARI — plus training throughput.

  PYTHONPATH=/root/.axon_site:. python benchmarks/zoo_quality.py \
      --epochs 30 --out benchmarks/results_v5e.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main(argv=None):
  p = argparse.ArgumentParser("zoo-quality")
  p.add_argument("--cells", type=int, default=5000)
  p.add_argument("--genes", type=int, default=558)
  p.add_argument("--proteins", type=int, default=10)
  p.add_argument("--epochs", type=int, default=30)
  p.add_argument("--batch", type=int, default=64)
  p.add_argument("--out", default="/tmp/zoo_quality.md")
  args = p.parse_args(argv)

  import numpy as np
  from sisua_tpu.data import generate_synthetic
  from sisua_tpu.models import (FVAE, MISA, SCALAR, SCALE, SCVI, SISUA,
                                TotalVI, VAE, DeepCountAutoencoder, NetConf,
                                RVmeta)

  sco = generate_synthetic(n_cells=args.cells, n_genes=args.genes,
                           n_proteins=args.proteins, seed=5218)
  train, test = sco.split(0.8)
  G, P = args.genes, args.proteins
  nets = dict(encoder=NetConf((64, 64), batchnorm=True, input_dropout=0.3),
              decoder=NetConf((64, 64), batchnorm=True))
  rna_zinb = lambda: RVmeta(G, "zinb", name="rna")  # noqa: E731
  adt_nb = lambda: RVmeta(P, "nb", name="adt")      # noqa: E731

  zoo = {
      "vae": lambda: VAE(rna_zinb(), **nets),
      "dca": lambda: DeepCountAutoencoder(rna_zinb(), latent_dim=10, **nets),
      "scvi": lambda: SCVI(RVmeta(G, "zinbd", name="rna")),
      "sisua": lambda: SISUA([rna_zinb(), adt_nb()], **nets),
      "misa": lambda: MISA([rna_zinb(), RVmeta(P, "nbd", name="adt")],
                           **nets),
      "scale": lambda: SCALE(rna_zinb(), n_components=5, **nets),
      "scalar": lambda: SCALAR([rna_zinb(), adt_nb()], n_components=5,
                               **nets),
      "fvae": lambda: FVAE(rna_zinb(), gamma=4.0, **nets),
      "totalvi": lambda: TotalVI([RVmeta(G, "nbd", name="rna"),
                                  RVmeta(P, "nbd", name="adt")]),
  }
  rows = []
  for name, ctor in zoo.items():
    print(f"=== {name} ===", flush=True)
    model = ctor()
    t0 = time.perf_counter()
    model.fit(train, epochs=args.epochs, batch_size=args.batch,
              labels_percent=0.5, valid_freq=0, patience=0,
              device_cache=True, metrics_interval=max(1, args.epochs // 4))
    fit_s = time.perf_counter() - t0
    post = model.create_posterior(test, sample_shape=5)
    scores = {}
    scores.update(post.cal_imputation_scores())
    scores.update({k: v for k, v in post.cal_spearman().items()
                   if k == "spearman_mean"})
    f1 = post.cal_protein_classification()
    if "f1_F1macro" in f1:
      scores["f1_macro"] = f1["f1_F1macro"]
    try:
      cs = post.criticizers["celltype"].cal_clustering_scores()
      scores["latent_ARI"] = cs["ARI"]
    except Exception:
      pass
    rates = model.history["cells_per_sec"]
    row = {"model": name,
           "train_loss": round(float(model.history["loss"][-1]), 1),
           "fit_seconds": round(fit_s, 1),
           "cells_per_sec": round(float(np.max(rates)), 0),
           **{k: round(float(v), 4) for k, v in scores.items()}}
    rows.append(row)
    print(json.dumps(row), flush=True)

  cols = ["model", "train_loss", "imputation_med", "imputation_mean",
          "spearman_mean", "f1_macro", "latent_ARI", "fit_seconds",
          "cells_per_sec"]
  lines = ["| " + " | ".join(cols) + " |",
           "|" + "---|" * len(cols)]
  for r in rows:
    lines.append("| " + " | ".join(str(r.get(c, "—")) for c in cols) + " |")
  os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
  with open(args.out, "w") as f:
    f.write("\n".join(lines) + "\n")
  print("→", args.out)


if __name__ == "__main__":
  main()
