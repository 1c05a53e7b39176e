"""SCANVI cell-type annotation: label-efficiency protocol.

The annotation analogue of the low-label zoo protocol (RESULTS.md): at each
label budget, SCANVI's amortized classifier (trained with unlabeled-cell
marginalization) is compared against the natural two-stage baseline — an
UNSUPERVISED SCVI latent + logistic regression fitted on the same-sized
labeled subset — and against the majority class. Reports held-out accuracy
and macro-F1, mean ± std over seeds, plus per-seed win counts.

  PYTHONPATH=/root/.axon_site:. python benchmarks/scanvi_annotation.py \
      --epochs 30 --seeds 5 --budgets 0.02,0.1,0.5 \
      --out benchmarks/results_scanvi_annotation.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def run_one(seed: int, budget: float, args):
  import numpy as np
  from sklearn.linear_model import LogisticRegression
  from sklearn.metrics import f1_score

  from sisua_tpu.data import generate_citeseq
  from sisua_tpu.models import SCANVI, SCVI
  from sisua_tpu.nn import NetConf
  from sisua_tpu.rv import RVmeta

  sco = generate_citeseq(n_cells=args.cells, n_genes=args.genes,
                         n_proteins=args.proteins, seed=args.data_seed,
                         weak_factors=args.weak_factors,
                         n_nuisance=3 * args.weak_factors)
  C = sco.numpy("celltype").shape[1]
  train, test = sco.split(0.8, seed=args.data_seed)
  y_te = test.numpy("celltype").argmax(-1)
  nets = dict(encoder=NetConf((64, 64), batchnorm=True, dropout=0.1),
              decoder=NetConf((64, 64), batchnorm=True))

  # SCANVI: amortized classifier + unlabeled marginalization
  m = SCANVI([RVmeta(args.genes, "zinbd", name="transcriptomic"),
              RVmeta(C, "onehot", name="celltype")], seed=seed, **nets)
  # device_cache: whole-dataset-resident epochs in one executable — the
  # per-step host→device streaming path pays a full tunnel RPC per batch
  # on remote-attached chips (measured ~13 min/row vs ~1)
  m.fit(train, epochs=args.epochs, batch_size=args.batch,
        labels_percent=budget, valid_freq=0, patience=0,
        device_cache=True, verbose=False)
  probs = m.predict_labels(test)
  y_hat = probs.argmax(-1)
  row = {
      "seed": seed, "labels_percent": budget,
      "scanvi_acc": float((y_hat == y_te).mean()),
      "scanvi_f1": float(f1_score(y_te, y_hat, average="macro")),
  }

  # baseline: unsupervised SCVI latent -> logistic regression on the same
  # label fraction (the zoo's downstream-classifier protocol)
  b = SCVI(RVmeta(args.genes, "zinbd", name="transcriptomic"), seed=seed)
  b.fit(train, epochs=args.epochs, batch_size=args.batch, valid_freq=0,
        patience=0, device_cache=True, verbose=False)
  def _latent(model, data):
    _, qZ = model.predict(data)
    qs = qZ if isinstance(qZ, (tuple, list)) else (qZ,)
    return np.asarray(qs[0].mean())
  z_tr, z_te = _latent(b, train), _latent(b, test)
  y_tr = train.numpy("celltype").argmax(-1)
  rng = np.random.RandomState(seed)
  k = max(C, int(round(budget * len(z_tr))))
  idx = rng.permutation(len(z_tr))[:k]
  # guarantee every class appears at least once so the classifier is defined
  if len(np.unique(y_tr[idx])) < C:
    extra = [np.flatnonzero(y_tr == c)[0]
             for c in range(C) if c not in y_tr[idx]]
    idx = np.concatenate([idx, np.asarray(extra, np.int64)])
  clf = LogisticRegression(max_iter=2000).fit(z_tr[idx], y_tr[idx])
  y_dc = clf.predict(z_te)
  row["scvi_lr_acc"] = float((y_dc == y_te).mean())
  row["scvi_lr_f1"] = float(f1_score(y_te, y_dc, average="macro"))
  row["majority"] = float(np.bincount(y_te).max() / len(y_te))
  return row


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument("--cells", type=int, default=5000)
  p.add_argument("--genes", type=int, default=500)
  p.add_argument("--proteins", type=int, default=10)
  p.add_argument("--epochs", type=int, default=30)
  p.add_argument("--batch", type=int, default=64)
  p.add_argument("--seeds", type=int, default=5)
  p.add_argument("--data-seed", type=int, default=0)
  p.add_argument("--budgets", default="0.02,0.1,0.5")
  p.add_argument("--weak-factors", type=int, default=0,
                 help="celltype factors expressed only at weak_gene_scale "
                      "with 3× nuisance factors — the weak-regime simulator "
                      "of the zoo sweep (results_zoo_weak_*)")
  p.add_argument("--out", default="/tmp/scanvi_annotation.md")
  args = p.parse_args(argv)

  import numpy as np
  budgets = [float(b) for b in args.budgets.split(",")]
  rows = []
  jsonl = open(args.out + ".jsonl", "w")
  for budget in budgets:
    for seed in range(args.seeds):
      row = run_one(seed, budget, args)
      rows.append(row)
      print(json.dumps(row), flush=True)
      jsonl.write(json.dumps(row) + "\n")
      jsonl.flush()
  jsonl.close()

  with open(args.out, "w") as f:
    f.write(f"dataset=citeseq cells={args.cells} genes={args.genes} "
            f"epochs={args.epochs} seeds={args.seeds} "
            f"budgets={args.budgets}"
            + (f" weak_factors={args.weak_factors}"
               if args.weak_factors else "") + "\n\n")
    f.write("| labels | scanvi_acc | scvi+LR acc | scanvi_f1 | scvi+LR f1 "
            "| majority | scanvi acc wins |\n|---|---|---|---|---|---|---|\n")
    for budget in budgets:
      sub = [r for r in rows if r["labels_percent"] == budget]
      def ms(key):
        vals = np.asarray([r[key] for r in sub])
        return f"{vals.mean():.3f}±{vals.std():.3f}"
      wins = sum(r["scanvi_acc"] > r["scvi_lr_acc"] for r in sub)
      f.write(f"| {budget:.0%} | {ms('scanvi_acc')} | {ms('scvi_lr_acc')} | "
              f"{ms('scanvi_f1')} | {ms('scvi_lr_f1')} | {ms('majority')} | "
              f"{wins}/{len(sub)} |\n")
  print(f"wrote {args.out}")


if __name__ == "__main__":
  main()
