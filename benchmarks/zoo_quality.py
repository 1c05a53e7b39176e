"""Model-zoo quality sweep: train every family on the same benchmark
dataset and tabulate test metrics.

Round-2 protocol (VERDICT r1 #1/#6): the default dataset is the
benchmark-grade CITE-seq simulator (``generate_citeseq`` — hierarchical cell
types, ambient ADT background, capture efficiency, batch effects, proteins
sampled INDEPENDENTLY of RNA from the shared latent state), so

  * gene↔protein marker correlation measures real cross-modality denoising
    (not the circular gene↔gene surrogate of round 1), and
  * scores spread across model families instead of saturating.

``--dataset`` also accepts any registry name (e.g. ``pbmcciteseq`` /
``cbmcciteseq`` with a pre-placed cache → REAL antibody counts) or
``synthetic`` (the round-1 easy set, kept as a smoke tier). ``--seeds N``
repeats training over N seeds and reports mean ± std.

Reference protocol: corruption + posterior evaluation per
``/root/reference/sisua/analysis/posterior.py:111-117``; metrics per
``imputation_benchmarks.py:34-127`` and ``latent_benchmarks.py:48-218``.

  PYTHONPATH=/root/.axon_site:. python benchmarks/zoo_quality.py \
      --epochs 40 --seeds 3 --out benchmarks/results_zoo.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

METRIC_COLS = ["imputation_med", "spearman_mean", "pearson_mean",
               "protein_spearman_mean", "protein_spearman_dc", "f1_macro",
               "celltype_acc", "latent_ARI", "latent_NMI"]

# families whose protein prediction is semi-supervised (head-predicted);
# everything else sees proteins only through the downstream baseline.
# totalvi models ADT as a FULLY observed modality (no masking — real-totalVI
# semantics); totalvi_semi is the masked extension that honors the label
# budget (mask_protein=True: masked likelihood + zeroed encoder slice).
# scanvi supervises CELLTYPE (not proteins): its label-efficiency protocol
# lives in benchmarks/scanvi_annotation.py; here it contributes
# celltype_acc + the shared unsupervised metrics
SEMI_FAMILIES = ("sisua", "misa", "scalar", "totalvi", "totalvi_semi",
                 "scanvi")


def build_zoo(G, P, nets, seed=0, n_batch=0, mask_renorm=False, alpha=10.0,
              C=0):
  from sisua_tpu.models import (AUTOZI, FVAE, LDVAE, MISA, SCALAR, SCALE,
                                SCANVI, SCVI, SISUA, SCScope, TotalVI, VAE,
                                DeepCountAutoencoder, NetConf, RVmeta)
  rna_zinb = lambda: RVmeta(G, "zinb", name="rna")  # noqa: E731
  adt_nb = lambda: RVmeta(P, "nb", name="adt")      # noqa: E731
  # α=10: the reference's shipped label-LLK weight for the semi-supervised
  # families (configs/base.yaml:6 `alpha: 10.`, the paper's setting) — the
  # library ctor default of 1 underweights supervision 10× vs the protocol
  zoo = {
      "vae": lambda: VAE(rna_zinb(), seed=seed, n_batch=n_batch, **nets),
      "dca": lambda: DeepCountAutoencoder(rna_zinb(), latent_dim=10,
                                          seed=seed, **nets),
      "scvi": lambda: SCVI(RVmeta(G, "zinbd", name="rna"), seed=seed,
                           n_batch=n_batch),
      "ldvae": lambda: LDVAE(RVmeta(G, "nbd", name="rna"), seed=seed,
                             n_batch=n_batch),
      # SCVI engine + per-gene spike-and-slab ZI detection (round 5);
      # generic rows match scvi's protocol, plus its own q(ZI) accessors
      "autozi": lambda: AUTOZI(RVmeta(G, "zinbd", name="rna"), seed=seed,
                               n_batch=n_batch),
      "sisua": lambda: SISUA([rna_zinb(), adt_nb()], alpha=alpha, seed=seed,
                             mask_renorm=mask_renorm, **nets),
      "misa": lambda: MISA([rna_zinb(), RVmeta(P, "nbd", name="adt")],
                           alpha=alpha, seed=seed, mask_renorm=mask_renorm,
                           **nets),
      "scale": lambda: SCALE(rna_zinb(), n_components=5, seed=seed, **nets),
      "scalar": lambda: SCALAR([rna_zinb(), adt_nb()], n_components=5,
                               alpha=alpha, seed=seed,
                               mask_renorm=mask_renorm, **nets),
      "fvae": lambda: FVAE(rna_zinb(), gamma=4.0, seed=seed, **nets),
      "scscope": lambda: SCScope(RVmeta(G, "nzmse", name="rna"),
                                 latent_dim=10, t_steps=2, seed=seed, **nets),
      "totalvi": lambda: TotalVI([RVmeta(G, "nbd", name="rna"),
                                  RVmeta(P, "nbd", name="adt")], seed=seed),
      "totalvi_semi": lambda: TotalVI([RVmeta(G, "nbd", name="rna"),
                                       RVmeta(P, "nbd", name="adt")],
                                      seed=seed, mask_protein=True,
                                      mask_renorm=mask_renorm),
  }
  if C > 0:
    # semi-supervised annotation over celltype labels (VERDICT r4
    # next-round 1: SCANVI rows in the zoo where the simulator permits).
    # Output names MUST be omic names here: with non-omic names ("rna")
    # the feeder falls back to positional omic selection, which for
    # (rna, celltype) outputs silently trains the label head on the
    # PROTEOMIC matrix (10-dim, shape-compatible — loss 24k, acc at
    # chance; caught by this sweep's first run)
    zoo["scanvi"] = lambda: SCANVI(
        [RVmeta(G, "zinbd", name="transcriptomic"),
         RVmeta(C, "onehot", name="celltype")], seed=seed)
  if P <= 0:
    # RNA-only dataset (e.g. cortex): the semi-supervised families need a
    # protein omic to supervise on — drop them instead of building a
    # 0-dim ADT head that crashes the sweep
    for name in ("sisua", "misa", "scalar", "totalvi", "totalvi_semi"):
      zoo.pop(name)
  return zoo


def _latent_means(model, sco):
  """Reduced latent means for a dataset (the Posterior's latent protocol)."""
  import numpy as np
  _, qZ = model.predict(sco)
  qs = qZ if isinstance(qZ, (tuple, list)) else (qZ,)
  return np.concatenate([np.asarray(q.mean()) for q in qs], axis=-1)


def downstream_protein_spearman(model, train, test, labels_percent, seed):
  """Unsupervised + downstream-regressor protein baseline (VERDICT r2 #2):
  ridge from train latents → log1p(protein) fitted on the SAME labeled
  fraction the semi-supervised families trained with, evaluated as mean
  per-protein Spearman on held-out cells. Comparable information budget:
  head-predicting families see labels_percent of train labels in the loss;
  this baseline's regressor sees labels_percent of train labels."""
  import numpy as np
  from scipy import stats as sp_stats
  from sklearn.linear_model import Ridge
  z_tr = _latent_means(model, train)
  z_te = _latent_means(model, test)
  y_tr = np.log1p(np.asarray(train.numpy("proteomic"), np.float64))
  y_te = np.asarray(test.numpy("proteomic"), np.float64)
  rng = np.random.RandomState(seed)
  k = max(10, int(round(labels_percent * len(z_tr))))
  idx = rng.permutation(len(z_tr))[:k]
  reg = Ridge(alpha=1.0).fit(z_tr[idx], y_tr[idx])
  y_hat = reg.predict(z_te)
  rho = [sp_stats.spearmanr(y_te[:, j], y_hat[:, j]).statistic
         for j in range(y_te.shape[1]) if np.std(y_te[:, j]) > 0]
  return float(np.mean(rho)) if rho else float("nan")


def evaluate(model, test, train=None, labels_percent=0.5, seed=0):
  import numpy as np
  post = model.create_posterior(test, sample_shape=5)
  scores = {}
  scores.update(post.cal_imputation_scores())
  for k, v in {**post.cal_spearman(), **post.cal_pearson()}.items():
    if k.endswith("_mean"):
      scores[k] = v
  pp = post.cal_protein_prediction()
  if "protein_spearman_mean" in pp:
    scores["protein_spearman_mean"] = pp["protein_spearman_mean"]
  f1 = post.cal_protein_classification()
  if "f1_F1macro" in f1:
    scores["f1_macro"] = f1["f1_F1macro"]
  try:
    cs = post.criticizers["celltype"].cal_clustering_scores()
    scores["latent_ARI"] = cs["ARI"]
    scores["latent_NMI"] = cs["NMI"]
  except Exception:
    pass
  if hasattr(model, "predict_labels") and "celltype" in test.omics:
    probs = model.predict_labels(test)
    y = np.asarray(test.numpy("celltype")).argmax(-1)
    scores["celltype_acc"] = float((probs.argmax(-1) == y).mean())
  if train is not None and "proteomic" in test.omics:
    try:
      scores["protein_spearman_dc"] = downstream_protein_spearman(
          model, train, test, labels_percent, seed)
    except Exception:
      pass
  return {k: float(v) for k, v in scores.items() if np.isfinite(v)}


def main(argv=None):
  p = argparse.ArgumentParser("zoo-quality")
  p.add_argument("--dataset", default="citeseq",
                 help="citeseq (simulator) | synthetic (easy smoke tier) | "
                      "any registry name (real data when cached)")
  p.add_argument("--cells", type=int, default=5000)
  p.add_argument("--genes", type=int, default=500)
  p.add_argument("--proteins", type=int, default=10)
  p.add_argument("--epochs", type=int, default=40)
  p.add_argument("--batch", type=int, default=64)
  p.add_argument("--seeds", type=int, default=1)
  p.add_argument("--labels-percent", type=float, default=0.5,
                 help="semi-supervised label fraction (the low-label "
                      "protocol uses 0.02 / 0.1)")
  p.add_argument("--models", default="",
                 help="comma-separated subset (default: all)")
  p.add_argument("--mask-renorm", action="store_true",
                 help="build the semi-supervised families with the "
                      "label-budget-invariant supervision weighting "
                      "(objective.elbo_terms mask_renorm extension)")
  p.add_argument("--weak-factors", type=int, default=0,
                 help="label-efficiency regime: latent factors with full "
                      "protein loadings but near-silent gene loadings "
                      "(the CD4 effect; see generate_citeseq)")
  p.add_argument("--n-batch", type=int, default=0,
                 help="train SCVI/VAE with batch-covariate conditioning "
                      "(needs obs['batch'], e.g. the citeseq simulator)")
  p.add_argument("--alpha", type=float, default=10.0,
                 help="label-LLK supervision weight for the multitask "
                      "families (reference configs/base.yaml alpha=10; "
                      "sweep it to test whether the weak-regime loss is a "
                      "tuning artifact)")
  p.add_argument("--hidden", default="64,64",
                 help="comma-separated encoder/decoder hidden widths "
                      "(head-capacity axis of the weak-regime sweep)")
  p.add_argument("--out", default="/tmp/zoo_quality.md")
  args = p.parse_args(argv)

  import numpy as np
  from sisua_tpu.data import (generate_citeseq, generate_synthetic,
                              get_dataset)
  from sisua_tpu.models import NetConf
  from sisua_tpu.utils import steady_window_rates

  def load(seed):
    if args.dataset == "citeseq":
      return generate_citeseq(n_cells=args.cells, n_genes=args.genes,
                              n_proteins=args.proteins,
                              weak_factors=args.weak_factors,
                              n_nuisance=3 * args.weak_factors,
                              seed=5218 + seed)
    if args.dataset == "synthetic":
      return generate_synthetic(n_cells=args.cells, n_genes=args.genes,
                                n_proteins=args.proteins, seed=5218 + seed)
    return get_dataset(args.dataset)

  hidden = tuple(int(h) for h in args.hidden.split(","))
  nets = dict(encoder=NetConf(hidden, batchnorm=True, input_dropout=0.3),
              decoder=NetConf(hidden, batchnorm=True))
  rows = []
  for seed in range(args.seeds):
    sco = load(seed)
    train, test = sco.split(0.8, seed=seed)
    G = train.n_vars
    P = train.get_dim("proteomic") if "proteomic" in train.omics else 0
    C = train.get_dim("celltype") if "celltype" in train.omics else 0
    zoo = build_zoo(G, P, nets, seed=seed, n_batch=args.n_batch,
                    mask_renorm=args.mask_renorm, alpha=args.alpha, C=C)
    if args.models:
      keep = set(args.models.split(","))
      zoo = {k: v for k, v in zoo.items() if k in keep}
    mi = max(1, args.epochs // 4)
    for name, ctor in zoo.items():
      print(f"=== {name} (seed {seed}) ===", flush=True)
      # fault-isolated per model: one family failing must not lose the
      # rows of the families that already trained for this sweep
      try:
        model = ctor()
        t0 = time.perf_counter()
        model.fit(train, epochs=args.epochs, batch_size=args.batch,
                  labels_percent=args.labels_percent, valid_freq=0,
                  patience=0, device_cache=True, metrics_interval=mi)
        fit_s = time.perf_counter() - t0
        scores = evaluate(model, test, train=train,
                          labels_percent=args.labels_percent, seed=seed)
        rates = steady_window_rates(model.history["cells_per_sec"],
                                    args.epochs, mi)
        row = {"model": name, "seed": seed,
               "train_loss": round(float(model.history["loss"][-1]), 1),
               "fit_seconds": round(fit_s, 1),
               "cells_per_sec": round(float(np.median(rates)), 0),
               **{k: round(v, 4) for k, v in scores.items()}}
      except Exception as e:  # noqa: BLE001
        row = {"model": name, "seed": seed, "error": f"{type(e).__name__}: {e}"}
      rows.append(row)
      print(json.dumps(row), flush=True)

  # aggregate over seeds: mean ± std per model
  models = list(dict.fromkeys(r["model"] for r in rows))
  cols = (["model", "train_loss"] + METRIC_COLS
          + ["fit_seconds", "cells_per_sec"])
  lines = ["| " + " | ".join(cols) + " |", "|" + "---|" * len(cols)]
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
  table = "\n".join(lines) + "\n"

  # per-seed win counts of each semi-supervised family's head-predicted
  # protein Spearman vs the unsupervised-vae + downstream-regressor baseline
  # (same seed, same label budget), and of f1_macro vs vae's f1_macro
  wins = []
  by = {(r["model"], r["seed"]): r for r in rows}
  for m in models:
    if m not in SEMI_FAMILIES:
      continue
    w_sp = n_sp = w_f1 = n_f1 = 0
    for s in range(args.seeds):
      r, base = by.get((m, s), {}), by.get(("vae", s), {})
      if "protein_spearman_mean" in r and "protein_spearman_dc" in base:
        n_sp += 1
        w_sp += r["protein_spearman_mean"] > base["protein_spearman_dc"]
      if "f1_macro" in r and "f1_macro" in base:
        n_f1 += 1
        w_f1 += r["f1_macro"] > base["f1_macro"]
    if n_sp or n_f1:
      wins.append(f"| {m} | {w_sp}/{n_sp} | {w_f1}/{n_f1} |")
  win_table = ""
  if wins:
    win_table = ("\nPer-seed wins vs unsupervised vae baseline "
                 "(head protein ρ > vae latent→ridge ρ; f1 > vae f1):\n\n"
                 "| model | protein_spearman wins | f1_macro wins |\n"
                 "|---|---|---|\n" + "\n".join(wins) + "\n")

  os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
  with open(args.out, "w") as f:
    f.write(f"dataset={args.dataset} cells={args.cells} genes={args.genes} "
            f"proteins={args.proteins} epochs={args.epochs} "
            f"seeds={args.seeds} labels_percent={args.labels_percent}"
            + (f" weak_factors={args.weak_factors}"
               if args.weak_factors else "")
            + (f" models={args.models}" if args.models else "")
            + (" mask_renorm=True" if args.mask_renorm else "")
            + (f" alpha={args.alpha:g}" if args.alpha != 10.0 else "")
            + (f" hidden={args.hidden}" if args.hidden != "64,64" else "")
            + "\n\n")
    f.write(table)
    f.write(win_table)
  with open(args.out + ".jsonl", "w") as f:
    for r in rows:
      f.write(json.dumps(r) + "\n")
  print(table)
  if win_table:
    print(win_table)
  print("→", args.out)


if __name__ == "__main__":
  main()
