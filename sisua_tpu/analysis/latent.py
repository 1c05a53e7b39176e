"""Latent-space benchmarks: clustering quality + protein-level classification.

Metric definitions pinned by the reference
(``/root/reference/sisua/analysis/latent_benchmarks.py``):
  * ``unsupervised_clustering_accuracy`` (:48-66): Hungarian-matched
    accuracy between predicted cluster ids and labels (scVI-derived).
  * ``clustering_scores`` (:69-117): ASW / ARI / NMI / UCA averaged over
    KMeans and GMM cluster predictions on the latent space.
  * ``multi_label_adj_Rindex`` (:32-45): ARI per binary label column.
  * ``streamline_classifier`` (:123-218): per-protein F1 of one-vs-rest
    linear SVMs trained on latents against GMM-binarized protein labels.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "unsupervised_clustering_accuracy", "clustering_scores",
    "multi_label_adj_Rindex", "streamline_classifier",
    "plot_distance_heatmap", "plot_latents_protein_pairs",
    "plot_latents_binary",
]


def unsupervised_clustering_accuracy(y: np.ndarray, y_pred: np.ndarray
                                     ) -> Tuple[float, np.ndarray]:
  """Hungarian-matched clustering accuracy (reference :48-66)."""
  from scipy.optimize import linear_sum_assignment
  y = np.asarray(y).ravel().astype(int)
  y_pred = np.asarray(y_pred).ravel().astype(int)
  assert len(y) == len(y_pred)
  n = max(y.max(), y_pred.max()) + 1
  reward = np.zeros((n, n))
  for yp, yt in zip(y_pred, y):
    reward[yp, yt] += 1
  row, col = linear_sum_assignment(-reward)
  acc = reward[row, col].sum() / len(y)
  assignment = np.stack([row, col], 1)
  return float(acc), assignment


def multi_label_adj_Rindex(label_bin: np.ndarray, y_pred: np.ndarray
                           ) -> list:
  """ARI per binary label column (reference :32-45)."""
  from sklearn.metrics import adjusted_rand_score
  assert label_bin.ndim == 2
  return [float(adjusted_rand_score(label_bin[:, i], y_pred))
          for i in range(label_bin.shape[1])]


def clustering_scores(latent: np.ndarray,
                      labels: np.ndarray,
                      n_labels: Optional[int] = None,
                      prediction_algorithm: str = "both",
                      seed: int = 8) -> Dict[str, float]:
  """ASW/ARI/NMI/UCA of latent clusters vs labels (reference :69-117)."""
  from sklearn.cluster import KMeans
  from sklearn.metrics import (adjusted_rand_score,
                               normalized_mutual_info_score,
                               silhouette_score)
  from sklearn.mixture import GaussianMixture
  labels = np.asarray(labels).ravel().astype(int)
  n_labels = n_labels or int(labels.max() + 1)
  preds = []
  if prediction_algorithm in ("knn", "kmeans", "both"):
    preds.append(KMeans(n_labels, n_init=10,
                        random_state=seed).fit_predict(latent))
  if prediction_algorithm in ("gmm", "both"):
    preds.append(GaussianMixture(n_labels,
                                 random_state=seed).fit_predict(latent))
  # ASW depends only on (latent, labels) — compute the O(n²) silhouette
  # once, not once per clustering algorithm
  try:
    asw = float(silhouette_score(latent, labels))
  except ValueError:
    asw = 0.0
  scores: Dict[str, list] = {"ASW": [asw], "ARI": [], "NMI": [], "UCA": []}
  for pred in preds:
    scores["ARI"].append(adjusted_rand_score(labels, pred))
    scores["NMI"].append(normalized_mutual_info_score(labels, pred))
    scores["UCA"].append(unsupervised_clustering_accuracy(labels, pred)[0])
  return {k: float(np.mean(v)) for k, v in scores.items()}


def streamline_classifier(Z_train: np.ndarray,
                          y_train: np.ndarray,
                          Z_test: np.ndarray,
                          y_test: np.ndarray,
                          labels_name: Sequence[str],
                          mode: str = "ovr",
                          seed: int = 8,
                          return_figure: bool = False,
                          title: str = ""):
  """Per-protein F1 of linear SVMs on latents (reference :123-218).

  y_* are binary (GMM-probabilized then thresholded) label matrices.
  Returns (train_scores, test_scores) dicts with per-label F1 + averages.
  """
  from sklearn.metrics import f1_score
  from sklearn.multiclass import OneVsRestClassifier
  from sklearn.svm import LinearSVC
  y_train = (np.asarray(y_train) > 0.5).astype(int)
  y_test = (np.asarray(y_test) > 0.5).astype(int)
  # drop degenerate columns (all one class in train)
  valid = [i for i in range(y_train.shape[1])
           if len(np.unique(y_train[:, i])) == 2]
  if not valid:
    # every column degenerate (tiny split / saturated binarization):
    # nothing to classify — degrade gracefully instead of crashing callers
    empty: Dict[str, float] = {}
    if return_figure:
      return (empty, empty), None
    return empty, empty
  names = [str(labels_name[i]) for i in valid]
  clf = OneVsRestClassifier(
      LinearSVC(random_state=seed), n_jobs=1)
  clf.fit(Z_train, y_train[:, valid])
  out = {}
  for split, Z, y in (("train", Z_train, y_train[:, valid]),
                      ("test", Z_test, y_test[:, valid])):
    pred = clf.predict(Z)
    per = {n: float(f1_score(y[:, i], pred[:, i], zero_division=0))
           for i, n in enumerate(names)}
    per["F1micro"] = float(f1_score(y, pred, average="micro",
                                    zero_division=0))
    per["F1macro"] = float(f1_score(y, pred, average="macro",
                                    zero_division=0))
    out[split] = per
  if return_figure:
    from ..utils.visualization import plot_evaluate_classifier
    _, fig = plot_evaluate_classifier(
        clf.decision_function(Z_test) > 0, y_test[:, valid], names,
        title=title or "latent→protein F1", return_figure=True)
    return (out["train"], out["test"]), fig
  return out["train"], out["test"]


# ---------------------------------------------------------------------------
# Plots (reference :221-537)
# ---------------------------------------------------------------------------
def plot_distance_heatmap(Z: np.ndarray, labels: np.ndarray,
                          title: str = "latent distance"):
  import matplotlib
  matplotlib.use("Agg")
  import matplotlib.pyplot as plt
  from scipy.spatial.distance import cdist
  labels = np.asarray(labels)
  uniq = np.unique(labels)
  cent = np.stack([Z[labels == u].mean(0) for u in uniq])
  dm = cdist(cent, cent)
  fig, ax = plt.subplots(figsize=(6, 5))
  im = ax.imshow(dm, cmap="magma")
  ax.set_xticks(range(len(uniq)))
  ax.set_xticklabels(uniq, rotation=45, fontsize=7, ha="right")
  ax.set_yticks(range(len(uniq)))
  ax.set_yticklabels(uniq, fontsize=7)
  ax.set_title(title)
  fig.colorbar(im, ax=ax)
  return fig


def plot_latents_protein_pairs(Z: np.ndarray, y: np.ndarray,
                               labels_name: Sequence[str],
                               pairs: Optional[Sequence[Tuple[str, str]]]
                               = None,
                               algo: str = "tsne",
                               title: str = ""):
  """2-D latent embedding colored by (pos, neg) protein-pair contrast
  (reference :359-455)."""
  import matplotlib
  matplotlib.use("Agg")
  import matplotlib.pyplot as plt
  from ..data.const import PROTEIN_PAIR_NEGATIVE, PROTEIN_PAIR_POSITIVE
  from ..data.utils import standardize_protein_name
  emb = _embed2d(Z, algo)
  # match knowledge-base pair names against standardized protein names
  # (reference latent_benchmarks.py:152,379) while keeping raw names valid
  # for explicitly passed pairs
  name_idx = {}
  for i, n in enumerate(labels_name):
    name_idx.setdefault(standardize_protein_name(str(n)), i)
  for i, n in enumerate(labels_name):
    name_idx.setdefault(str(n), i)
  if pairs is None:
    pairs = [p for p in PROTEIN_PAIR_NEGATIVE
             if p[0] in name_idx and p[1] in name_idx][:6]
  if not pairs:
    return None
  ncol = min(3, len(pairs))
  nrow = int(np.ceil(len(pairs) / ncol))
  fig, axes = plt.subplots(nrow, ncol, figsize=(4 * ncol, 3.5 * nrow),
                           squeeze=False)
  for k, (a, b) in enumerate(pairs):
    ax = axes[k // ncol][k % ncol]
    contrast = np.log1p(y[:, name_idx[a]]) - np.log1p(y[:, name_idx[b]])
    sc = ax.scatter(emb[:, 0], emb[:, 1], c=contrast, s=6, cmap="coolwarm",
                    linewidths=0)
    ax.set_title(f"{a} vs {b}", fontsize=8)
    ax.set_xticks([]); ax.set_yticks([])
    fig.colorbar(sc, ax=ax)
  fig.suptitle(title)
  fig.tight_layout()
  return fig


def plot_latents_binary(Z: np.ndarray, y_bin: np.ndarray,
                        labels_name: Sequence[str], algo: str = "tsne",
                        title: str = ""):
  """Latent embedding colored by the dominant positive protein
  (reference :458-537)."""
  import matplotlib
  matplotlib.use("Agg")
  from ..utils.visualization import fast_scatter
  emb = _embed2d(Z, algo)
  names = np.asarray([str(n) for n in labels_name])
  lab = np.asarray(["+".join(names[row > 0.5]) or "none" for row in y_bin])
  # collapse rare combos for readability
  uniq, counts = np.unique(lab, return_counts=True)
  keep = set(uniq[np.argsort(-counts)][:12])
  lab = np.asarray([l if l in keep else "other" for l in lab])
  ax = fast_scatter(emb[:, :2], labels=lab, title=title)
  return ax.get_figure()


def _embed2d(Z: np.ndarray, algo: str) -> np.ndarray:
  if Z.shape[1] == 1:  # callers index emb[:, 1] — pad a zero column
    return np.concatenate([Z, np.zeros_like(Z)], axis=1)
  if Z.shape[1] == 2:
    return Z
  if algo == "tsne" and Z.shape[0] <= 8000:
    from sklearn.manifold import TSNE
    return TSNE(2, init="pca", random_state=8).fit_transform(Z)
  from sklearn.decomposition import PCA
  return PCA(2, random_state=8).fit_transform(Z)
