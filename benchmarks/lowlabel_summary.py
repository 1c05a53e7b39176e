"""Label-efficiency summary across zoo sweeps (VERDICT r2 #2).

Reads the per-seed rows of several ``zoo_quality.py`` runs (one per
``labels_percent``) and emits the comparison the reference's README claim
lives on (`/root/reference/README.rst:11-20`): head-predicted protein
Spearman of each semi-supervised family vs the unsupervised-vae +
downstream-ridge baseline at the SAME label budget, with per-seed win
counts and paired mean deltas.

  python benchmarks/lowlabel_summary.py \
      benchmarks/results_zoo_lowlabel_p02.md.jsonl \
      benchmarks/results_zoo_lowlabel_p10.md.jsonl \
      benchmarks/results_zoo_lowlabel_p50.md.jsonl
"""

from __future__ import annotations

import json
import re
import sys

import numpy as np

SEMI = ("sisua", "misa", "scalar", "totalvi", "totalvi_semi")


def load(path):
  rows = [json.loads(l) for l in open(path) if l.strip()]
  m = re.search(r"_p(\d+)", path)
  budget = (int(m.group(1)) / 100.0) if m else float("nan")
  return budget, {(r["model"], r["seed"]): r for r in rows}


def main(paths):
  sweeps = [load(p) for p in paths]
  sweeps.sort(key=lambda t: t[0])
  # two readouts of the semi-supervised advantage:
  #   * head ρ      — the model's own protein decoder vs true held-out ADT;
  #   * latent ρ    — ridge on the model's OWN latents (protein_spearman_dc)
  #                   vs the same ridge on the unsupervised vae's latents:
  #                   does supervision improve the representation itself?
  print("| labels | family | head ρ | own-latent+ridge ρ | vae+ridge ρ "
        "| head−vae Δ | latent−vae Δ | head wins | latent wins | f1 wins |")
  print("|---|---|---|---|---|---|---|---|---|---|")
  for budget, by in sweeps:
    seeds = sorted({s for (_, s) in by})
    for fam in SEMI:
      head, own, base, df1 = [], [], [], []
      for s in seeds:
        r, b = by.get((fam, s), {}), by.get(("vae", s), {})
        if ("protein_spearman_mean" in r and "protein_spearman_dc" in r
            and "protein_spearman_dc" in b):
          head.append(r["protein_spearman_mean"])
          own.append(r["protein_spearman_dc"])
          base.append(b["protein_spearman_dc"])
        if "f1_macro" in r and "f1_macro" in b:
          df1.append(r["f1_macro"] - b["f1_macro"])
      if not head:
        continue
      head, own, base = np.array(head), np.array(own), np.array(base)
      dh, dl = head - base, own - base
      f1w = int((np.array(df1) > 0).sum()) if df1 else 0
      tag = " (full ADT)" if fam == "totalvi" else ""
      print(f"| {budget:g} | {fam}{tag} | {head.mean():.3f}±{head.std():.3f}"
            f" | {own.mean():.3f}±{own.std():.3f}"
            f" | {base.mean():.3f}±{base.std():.3f}"
            f" | {dh.mean():+.3f} | {dl.mean():+.3f}"
            f" | {int((dh > 0).sum())}/{len(dh)}"
            f" | {int((dl > 0).sum())}/{len(dl)} | {f1w}/{len(df1)} |")


if __name__ == "__main__":
  main(sys.argv[1:] or [
      "benchmarks/results_zoo_lowlabel_p02.md.jsonl",
      "benchmarks/results_zoo_lowlabel_p10.md.jsonl",
      "benchmarks/results_zoo_lowlabel_p50.md.jsonl",
  ])
