"""ResultsSheet — multi-model / multi-posterior comparison.

Capability parity with ``/root/reference/sisua/analysis/results_sheet.py``
(~700 LoC): collect a set of fitted ``Posterior`` objects, tabulate every
scalar metric family side by side, export HTML/CSV score tables, and render
comparison figures (score bars, marker-pair correlation, imputation scatter,
latent scatter, learning curves) into one figure sink.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from ..utils.visualization import Visualizer
from .posterior import Posterior

__all__ = ["ResultsSheet"]


class ResultsSheet(Visualizer):
  """Comparison hub over multiple posteriors (one per trained model)."""

  def __init__(self, *posteriors: Posterior, verbose: bool = False):
    flat: List[Posterior] = []
    for p in posteriors:
      flat.extend(p if isinstance(p, (list, tuple)) else [p])
    assert flat and all(isinstance(p, Posterior) for p in flat)
    self.posteriors = flat
    self.verbose = bool(verbose)
    self._scores: Optional[pd.DataFrame] = None

  @property
  def names(self) -> List[str]:
    return [p.name for p in self.posteriors]

  # ------------------------------------------------------------------ table
  def get_scores(self, recompute: bool = False) -> pd.DataFrame:
    """(model × metric) score table across every scalar metric family."""
    if self._scores is not None and not recompute:
      return self._scores
    rows = {}
    for p in self.posteriors:
      if self.verbose:
        print(f"[results] scoring {p.name}")
      rows[p.name] = p.save_scores()
    self._scores = pd.DataFrame(rows).T
    return self._scores

  def save_scores(self, path: str) -> str:
    """Write the score table as CSV + HTML (reference html export)."""
    df = self.get_scores()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    base, ext = os.path.splitext(path)
    df.to_csv(base + ".csv")
    with open(base + ".html", "w") as f:
      f.write(df.to_html(float_format=lambda v: f"{v:.4f}"))
    return base + ".csv"

  # ----------------------------------------------------------------- plots
  def _bar_compare(self, columns: Sequence[str], title: str):
    import matplotlib.pyplot as plt
    df = self.get_scores()
    cols = [c for c in columns if c in df.columns]
    if not cols:
      return None
    sub = df[cols]
    fig, ax = plt.subplots(figsize=(max(6, 1.2 * len(cols)), 4))
    x = np.arange(len(cols))
    w = 0.8 / len(sub)
    for i, (name, row) in enumerate(sub.iterrows()):
      ax.bar(x + i * w, row.values, w, label=name)
    ax.set_xticks(x + 0.4)
    ax.set_xticklabels(cols, rotation=30, fontsize=7, ha="right")
    ax.legend(fontsize=7)
    ax.set_title(title)
    fig.tight_layout()
    return fig

  def plot_imputation_scores(self) -> "ResultsSheet":
    fig = self._bar_compare(
        ["imputation_med", "imputation_mean", "imputation_std"],
        "imputation error (lower is better)")
    if fig is not None:
      self.add_figure("imputation_scores", fig)
    return self

  def plot_correlation_scores(self) -> "ResultsSheet":
    fig = self._bar_compare(["spearman_mean", "pearson_mean"],
                            "marker gene↔protein correlation")
    if fig is not None:
      self.add_figure("correlation_scores", fig)
    return self

  def plot_classifier_F1(self) -> "ResultsSheet":
    df = self.get_scores()
    cols = [c for c in df.columns if c.startswith("f1_")]
    fig = self._bar_compare(cols[:12], "latent→protein F1")
    if fig is not None:
      self.add_figure("classifier_f1", fig)
    return self

  def plot_disentanglement_scores(self) -> "ResultsSheet":
    df = self.get_scores()
    cols = [c for c in df.columns
            if c.split("_")[0] in ("mig", "dci", "disentanglement",
                                   "completeness", "informativeness")]
    fig = self._bar_compare(cols[:10], "disentanglement")
    if fig is not None:
      self.add_figure("disentanglement_scores", fig)
    return self

  def plot_protein_prediction_scores(self) -> "ResultsSheet":
    fig = self._bar_compare(["protein_pearson_mean",
                             "protein_spearman_mean"],
                            "direct protein prediction (semi-supervised)")
    if fig is not None:
      self.add_figure("protein_prediction_scores", fig)
    return self

  def plot_clustering_scores(self) -> "ResultsSheet":
    df = self.get_scores()
    cols = [c for c in df.columns
            if c.split("_")[0] in ("ARI", "NMI", "ASW", "UCA")]
    fig = self._bar_compare(cols[:8], "latent clustering vs labels")
    if fig is not None:
      self.add_figure("clustering_scores", fig)
    return self

  def plot_llk_scores(self) -> "ResultsSheet":
    df = self.get_scores()
    cols = [c for c in df.columns if c.startswith(("llk_", "marginal_llk"))]
    fig = self._bar_compare(cols[:8], "log-likelihood (higher is better)")
    if fig is not None:
      self.add_figure("llk_scores", fig)
    return self

  def plot_ranking_heatmap(self) -> "ResultsSheet":
    """Models × metrics heatmap of per-metric ranks (1 = best), with
    error-like metrics (imputation_*) ranked ascending."""
    import matplotlib.pyplot as plt
    df = self.get_scores()
    num = df.select_dtypes(include=[np.number]).dropna(axis=1, how="any")
    keep = [c for c in num.columns
            if num[c].std() > 0 and not c.startswith(("beta",))]
    if not keep or len(df) < 2:
      return self
    num = num[keep]
    lower_better = num.columns.str.startswith("imputation")
    ranks = num.rank(ascending=False)
    ranks.loc[:, lower_better] = num.loc[:, lower_better].rank(
        ascending=True)
    fig, ax = plt.subplots(figsize=(max(6, 0.45 * ranks.shape[1]),
                                    max(3, 0.45 * ranks.shape[0])))
    im = ax.imshow(ranks.values, aspect="auto", cmap="RdYlGn_r")
    ax.set_xticks(range(ranks.shape[1]))
    ax.set_xticklabels(ranks.columns, rotation=90, fontsize=6)
    ax.set_yticks(range(ranks.shape[0]))
    ax.set_yticklabels(ranks.index, fontsize=7)
    for i in range(ranks.shape[0]):
      for j in range(ranks.shape[1]):
        ax.text(j, i, f"{int(ranks.values[i, j])}", ha="center",
                va="center", fontsize=6)
    ax.set_title("per-metric model rank (1 = best)")
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    self.add_figure("ranking_heatmap", fig)
    return self

  def plot_imputation_scatter(self) -> "ResultsSheet":
    for p in self.posteriors:
      p.plot_imputation_scatter()
      self.figures.update(p.figures)
      p.figures.clear()
    return self

  def plot_latents_scatter(self, algo: str = "pca") -> "ResultsSheet":
    for p in self.posteriors:
      p.plot_scatter(algo=algo)
      self.figures.update(p.figures)
      p.figures.clear()
    return self

  def plot_learning_curves(self) -> "ResultsSheet":
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(7, 4))
    for p in self.posteriors:
      hist = p.scm.history
      if "loss" in hist:
        ax.plot(hist["loss"], label=f"{p.name}")
      if "val_loss" in hist:
        ax.plot(hist["val_loss"], "--", label=f"{p.name} (val)")
    ax.legend(fontsize=7)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    self.add_figure("learning_curves", fig)
    return self

  def plot_all(self) -> "ResultsSheet":
    return (self.plot_imputation_scores().plot_correlation_scores()
            .plot_protein_prediction_scores().plot_clustering_scores()
            .plot_llk_scores().plot_classifier_F1()
            .plot_disentanglement_scores().plot_ranking_heatmap()
            .plot_learning_curves())

  def __repr__(self):
    return f"ResultsSheet({', '.join(self.names)})"
