"""Multiome model rows: PEAKVI / MULTIVI / SCVI / SCALE on the paired
RNA+ATAC simulator (VERDICT r4 next-round 1: "SCANVI/PEAKVI/MULTIVI rows
added to the zoo sweep where the simulators permit — generate_multiome
exists").

The CITE-seq zoo's protein metrics don't apply to chromatin models, so
this sweep scores what multiome models are for:

  * ``atac_auc`` — per-cell ROC-AUC of the model's accessibility
    estimates against the held-out binarized peak matrix (PeakVI's
    depth-free estimator; chance = 0.5);
  * ``latent_ARI`` / ``latent_NMI`` — KMeans on the latent means vs the
    simulator's true cell types (the annotation-free latent quality
    metric shared with the CITE-seq zoo);
  * ``rna_spearman`` — per-cell Spearman of the RNA posterior mean vs
    held-out counts (RNA-capable models only);
  * mosaic rows: MULTIVI re-trained with 30% unpaired cells — the
    mosaic-integration capability no single-modality model has.

  PYTHONPATH=/root/.axon_site:. python benchmarks/multiome_zoo.py \
      --epochs 30 --seeds 3 --out benchmarks/results_multiome_zoo.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

METRIC_COLS = ["atac_auc", "rna_spearman", "latent_ARI", "latent_NMI"]


def _latents(model, sco):
  import numpy as np
  _, qZ = model.predict(sco)
  qs = qZ if isinstance(qZ, (tuple, list)) else (qZ,)
  return np.asarray(qs[0].mean())


def _cluster_scores(z, y, seed):
  import numpy as np
  from sklearn.cluster import KMeans
  from sklearn.metrics import (adjusted_rand_score,
                               normalized_mutual_info_score)
  k = len(np.unique(y))
  pred = KMeans(n_clusters=k, n_init=10, random_state=seed).fit_predict(z)
  return (float(adjusted_rand_score(y, pred)),
          float(normalized_mutual_info_score(y, pred)))


def _atac_auc(est, A_bin):
  """Mean per-cell ROC-AUC, cells with both classes present."""
  import numpy as np
  from sklearn.metrics import roc_auc_score
  aucs = []
  for i in range(est.shape[0]):
    yi = A_bin[i]
    if 0 < yi.sum() < len(yi):
      aucs.append(roc_auc_score(yi, est[i]))
  return float(np.mean(aucs)) if aucs else float("nan")


def _rna_spearman(mean_counts, X):
  import numpy as np
  from scipy import stats as sp_stats
  rho = [sp_stats.spearmanr(X[i], mean_counts[i]).statistic
         for i in range(min(len(X), 400))]
  rho = [r for r in rho if np.isfinite(r)]
  return float(np.mean(rho)) if rho else float("nan")


def run_seed(seed, args):
  import numpy as np

  from sisua_tpu.data import generate_multiome
  from sisua_tpu.models import MULTIVI, PEAKVI, SCALE, SCVI, NetConf, RVmeta

  G, R = args.genes, args.regions
  nets1 = dict(encoder=NetConf((64, 64), batchnorm=True),
               decoder=NetConf((64, 64), batchnorm=True))
  nets2 = dict(encoder=(NetConf((64, 64), name="encoder_rna"),
                        NetConf((64, 64), name="encoder_atac")),
               decoder=(NetConf((64, 64), name="decoder_rna"),
                        NetConf((64, 64), name="decoder_atac")))
  zoo = {
      # RNA-only baseline
      "scvi(rna)": (lambda: SCVI(RVmeta(G, "zinbd", name="transcriptomic"),
                                 seed=seed), "rna"),
      # ATAC-only: the reference's SCALE treats peaks as ZINB counts
      "scale(atac)": (lambda: SCALE(RVmeta(R, "zinb", name="atac"),
                                    n_components=5, seed=seed, **nets1),
                      "atac"),
      "peakvi(atac)": (lambda: PEAKVI(RVmeta(R, "bernoulli", name="atac"),
                                      seed=seed), "atac"),
      "multivi": (lambda: MULTIVI(
          [RVmeta(G, "nbd", name="transcriptomic"),
           RVmeta(R, "bernoulli", name="atac")],
          latents=RVmeta(16, "diag", name="latents"), seed=seed, **nets2),
          "joint"),
  }

  rows = []
  for mosaic in (0.0, args.unpaired):
    sco = generate_multiome(n_cells=args.cells, n_genes=G, n_regions=R,
                            unpaired_frac=mosaic, seed=5218 + seed)
    train, test = sco.split(0.8, seed=seed)
    y_te = np.asarray(test.numpy("celltype")).argmax(-1)
    X_te = np.asarray(test.numpy("transcriptomic"))
    A_te = (np.asarray(test.numpy("atac")) > 0).astype(np.float64)
    # mosaic evaluation: only paired test cells (both modalities observed)
    paired = (X_te.sum(1) > 0) & (A_te.sum(1) > 0)
    for name, (ctor, kind) in zoo.items():
      if mosaic > 0 and kind != "joint":
        continue  # only MULTIVI consumes mosaic data
      tag = f"{name}+mosaic{int(mosaic*100)}%" if mosaic else name
      print(f"=== {tag} (seed {seed}) ===", flush=True)
      try:
        model = ctor()
        t0 = time.perf_counter()
        # output RVs are NAMED after omics, so fit/predict select the
        # right modality from the multi-omic container by name;
        # device_cache: one-executable epochs (per-step streaming pays a
        # tunnel RPC per batch on remote-attached chips)
        model.fit(train, epochs=args.epochs, batch_size=args.batch,
                  valid_freq=0, patience=0, device_cache=True)
        fit_s = time.perf_counter() - t0
        row = {"model": tag, "seed": seed,
               "train_loss": round(float(model.history["loss"][-1]), 1),
               "fit_seconds": round(fit_s, 1)}
        te = test
        z = _latents(model, te)
        sel = paired if mosaic else np.ones(len(y_te), bool)
        ari, nmi = _cluster_scores(z[sel], y_te[sel], seed)
        row["latent_ARI"], row["latent_NMI"] = round(ari, 4), round(nmi, 4)
        if hasattr(model, "get_accessibility_estimates"):
          est = np.asarray(model.get_accessibility_estimates(te))
          row["atac_auc"] = round(_atac_auc(est[sel], A_te[sel]), 4)
        if kind in ("rna", "joint"):
          pX, _ = model.predict(te)
          mean = np.asarray((pX[0] if isinstance(pX, (tuple, list))
                             else pX).mean())
          if mean.ndim == 3:
            mean = mean.mean(0)
          row["rna_spearman"] = round(
              _rna_spearman(mean[sel], X_te[sel]), 4)
      except Exception as e:  # noqa: BLE001 — fault-isolated per model
        row = {"model": tag, "seed": seed,
               "error": f"{type(e).__name__}: {e}"}
      rows.append(row)
      print(json.dumps(row), flush=True)
  return rows


def main(argv=None):
  p = argparse.ArgumentParser("multiome-zoo")
  p.add_argument("--cells", type=int, default=4000)
  p.add_argument("--genes", type=int, default=400)
  p.add_argument("--regions", type=int, default=600)
  p.add_argument("--epochs", type=int, default=30)
  p.add_argument("--batch", type=int, default=64)
  p.add_argument("--seeds", type=int, default=3)
  p.add_argument("--unpaired", type=float, default=0.3)
  p.add_argument("--out", default="/tmp/multiome_zoo.md")
  args = p.parse_args(argv)

  import numpy as np
  rows = []
  for seed in range(args.seeds):
    rows.extend(run_seed(seed, args))

  models = list(dict.fromkeys(r["model"] for r in rows))
  cols = ["model", "train_loss"] + METRIC_COLS + ["fit_seconds"]
  lines = [f"dataset=multiome cells={args.cells} genes={args.genes} "
           f"regions={args.regions} epochs={args.epochs} "
           f"seeds={args.seeds} unpaired={args.unpaired}", "",
           "| " + " | ".join(cols) + " |", "|" + "---|" * len(cols)]
  for m in models:
    sub = [r for r in rows if r["model"] == m]
    cells = [m]
    for c in cols[1:]:
      vals = [r[c] for r in sub if c in r]
      if not vals:
        cells.append("—")
      elif len(vals) == 1:
        cells.append(f"{vals[0]:g}")
      else:
        cells.append(f"{np.mean(vals):.3f}±{np.std(vals):.3f}")
    lines.append("| " + " | ".join(cells) + " |")
  os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
  with open(args.out, "w") as f:
    f.write("\n".join(lines) + "\n")
  with open(args.out + ".jsonl", "w") as f:
    for r in rows:
      f.write(json.dumps(r) + "\n")
  print("\n".join(lines))
  print("→", args.out)


if __name__ == "__main__":
  main()
