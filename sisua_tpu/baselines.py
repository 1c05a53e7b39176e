"""Classical baselines: linear latent models + shallow predictors.

Capability parity with ``/root/reference/sisua/baselines.py`` (the reference
module is stale — imports removed names — but the intent is clear): PCA /
probabilistic PCA / sparse PCA latent spaces on log-normalized counts, scored
with the same latent benchmarks (protein F1 via linear SVM, clustering
scores) so deep models can be compared against cheap baselines.
"""

from __future__ import annotations

import argparse
from typing import Dict, Optional

import numpy as np

__all__ = ["run_baseline", "BASELINE_MODELS", "main"]

BASELINE_MODELS = ("pca", "ppca", "sppca", "nmf", "fa")


def _fit_latent(x: np.ndarray, model: str, n_components: int, seed: int):
  model = model.lower()
  if model == "pca":
    from sklearn.decomposition import PCA
    return PCA(n_components, random_state=seed).fit(x)
  if model == "ppca":  # probabilistic PCA = PCA with full ML noise model
    from sklearn.decomposition import PCA
    return PCA(n_components, svd_solver="full", random_state=seed).fit(x)
  if model == "sppca":  # sparse probabilistic PCA analogue
    from sklearn.decomposition import SparsePCA
    return SparsePCA(n_components, random_state=seed).fit(x)
  if model == "nmf":
    from sklearn.decomposition import NMF
    return NMF(n_components, init="nndsvda", max_iter=400,
               random_state=seed).fit(np.maximum(x, 0))
  if model == "fa":
    from sklearn.decomposition import FactorAnalysis
    return FactorAnalysis(n_components, random_state=seed).fit(x)
  raise ValueError(f"unknown baseline '{model}'; options {BASELINE_MODELS}")


def run_baseline(sco,
                 model: str = "pca",
                 n_components: int = 10,
                 seed: int = 8,
                 verbose: bool = False) -> Dict[str, float]:
  """Fit a linear latent baseline on the main omic and score it with the
  standard latent benchmarks. Returns the score dict."""
  from .analysis.latent import clustering_scores, streamline_classifier
  from .data.const import OMIC
  from .utils.others import UnitTimer

  x = np.log1p(sco.numpy())
  with UnitTimer(f"baseline:{model}", print_log=verbose):
    fitted = _fit_latent(x, model, n_components, seed)
    z = fitted.transform(x)
  scores: Dict[str, float] = {}
  # clustering vs celltype labels
  for cand in ("celltype", "disease", "progenitor"):
    if cand in sco.omics:
      labels = np.argmax(sco.numpy(cand), 1)
      scores.update({f"{k}_{cand}": v
                     for k, v in clustering_scores(z, labels).items()})
      break
  # protein prediction F1
  if "proteomic" in sco.omics:
    _, _, ybin = sco.probabilistic_embedding(OMIC.proteomic)
    n = len(z)
    rng = np.random.RandomState(seed)
    idx = rng.permutation(n)
    cut = int(0.8 * n)
    _, test_f1 = streamline_classifier(
        z[idx[:cut]], ybin[idx[:cut]], z[idx[cut:]], ybin[idx[cut:]],
        sco.get_var_names(OMIC.proteomic))
    scores.update({f"f1_{k}": v for k, v in test_f1.items()})
  if verbose:
    print({k: round(v, 4) for k, v in scores.items()})
  return scores


def main(argv=None):
  p = argparse.ArgumentParser("sisua-baselines")
  p.add_argument("-ds", default="synthetic")
  p.add_argument("-model", default="pca",
                 help=f"comma-separated from {BASELINE_MODELS}")
  p.add_argument("-zdim", type=int, default=10)
  args = p.parse_args(argv)
  from .data import get_dataset
  sco = get_dataset(args.ds)
  out = {}
  for m in args.model.split(","):
    out[m] = run_baseline(sco, m, n_components=args.zdim, verbose=True)
  return out


if __name__ == "__main__":
  main()
