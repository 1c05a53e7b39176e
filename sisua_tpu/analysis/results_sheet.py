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
    # dedupe display names: two runs of the same architecture on the same
    # dataset share `scm.id`, and identical names would collapse to a single
    # score-table row / overwrite each other's figures
    seen: Dict[str, int] = {}
    for p in flat:
      n = p.name
      if n in seen:
        seen[n] += 1
        p.name = f"{n}_{seen[n]}"
      else:
        seen[n] = 0
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

  # -------------------------------------------------- pooled bar/box plots
  def _bar_box_line(self, title: str, ylabel: str, get_scores,
                    using_bar: bool = True, ignore: Sequence[str] = (),
                    ax=None) -> "ResultsSheet":
    """Pooled per-item scores (per-protein F1, per-pair correlations, …)
    per model as a seaborn bar/box plot (reference ``_bar_box_line``
    :303-341)."""
    import matplotlib.pyplot as plt
    import seaborn as sns
    data = []
    for p in self.posteriors:
      scores = dict(get_scores(p))
      for k in ignore:
        scores.pop(k, None)
      for k, v in scores.items():
        data.append({"Model": p.name, ylabel: float(v)})
    if not data:
      return self
    df = pd.DataFrame(data)
    if ax is None:
      _, ax = plt.subplots(figsize=(max(6, 1.2 * len(self.posteriors)), 4))
    if using_bar:
      sns.barplot(x="Model", y=ylabel, data=df, ax=ax)
    else:
      sns.boxplot(x="Model", y=ylabel, data=df, ax=ax)
    ax.grid(axis="y", linewidth=1.2, alpha=0.5)
    ax.set_axisbelow(True)
    ax.set_title(title, fontsize=9)
    self.add_figure(title, ax.get_figure())
    return self

  @staticmethod
  def _per_item(d: Dict[str, float], prefix: str,
                drop_means: bool = True) -> Dict[str, float]:
    out = {k[len(prefix):]: v for k, v in d.items() if k.startswith(prefix)}
    if drop_means:
      out = {k: v for k, v in out.items()
             if not k.endswith(("mean", "micro", "macro", "weight"))}
    return out

  def boxplot_cluster(self, ax=None) -> "ResultsSheet":
    return self._bar_box_line("boxplot_cluster", "Pooled Cluster Metrics",
                              lambda p: p.cal_clustering_scores(),
                              using_bar=False, ax=ax)

  def boxplot_f1(self, ax=None) -> "ResultsSheet":
    return self._bar_box_line(
        "boxplot_classifier", "F1 score",
        lambda p: self._per_item(p.cal_protein_classification(), "f1_"),
        using_bar=False, ax=ax)

  def boxplot_pearson(self, ax=None) -> "ResultsSheet":
    return self._bar_box_line(
        "boxplot_pearson", "Pearson correlation",
        lambda p: self._per_item(p.cal_pearson(), "pearson_"),
        using_bar=False, ax=ax)

  def boxplot_spearman(self, ax=None) -> "ResultsSheet":
    return self._bar_box_line(
        "boxplot_spearman", "Spearman correlation",
        lambda p: self._per_item(p.cal_spearman(), "spearman_"),
        using_bar=False, ax=ax)

  def barplot_cluster(self, ax=None) -> "ResultsSheet":
    return self._bar_box_line("barplot_cluster", "Pooled Cluster Metrics",
                              lambda p: p.cal_clustering_scores(), ax=ax)

  def barplot_f1(self, ax=None) -> "ResultsSheet":
    return self._bar_box_line(
        "barplot_classifier", "F1 score",
        lambda p: self._per_item(p.cal_protein_classification(), "f1_"),
        ax=ax)

  def barplot_pearson(self, ax=None) -> "ResultsSheet":
    return self._bar_box_line(
        "barplot_pearson", "Pearson correlation",
        lambda p: self._per_item(p.cal_pearson(), "pearson_"), ax=ax)

  def barplot_spearman(self, ax=None) -> "ResultsSheet":
    return self._bar_box_line(
        "barplot_spearman", "Spearman correlation",
        lambda p: self._per_item(p.cal_spearman(), "spearman_"), ax=ax)

  def plot_comparison_f1(self, fig_width: int = 12) -> "ResultsSheet":
    """Per-protein F1 series, one panel per model with the mean line — the
    reference's ``plot_comparison_f1`` (:226-303)."""
    import matplotlib.pyplot as plt
    series = []
    for p in self.posteriors:
      f1 = self._per_item(p.cal_protein_classification(), "f1_")
      if f1:
        series.append((p.name, dict(sorted(f1.items()))))
    if not series:
      return self
    labels = list(series[0][1].keys())
    fig, axes = plt.subplots(1, len(series), sharey=True, squeeze=False,
                             figsize=(fig_width, 2.5))
    colors = plt.cm.tab10(np.linspace(0, 1, max(len(labels), 2)))
    for idx, (name, f1) in enumerate(series):
      ax = axes[0][idx]
      vals = [100.0 * f1.get(l, np.nan) for l in labels]
      ax.grid(True, axis="both", linewidth=0.5, alpha=0.6)
      for i, (v, c) in enumerate(zip(vals, colors)):
        ax.scatter(i, v, color=c, s=22, alpha=0.8)
      ax.plot(np.arange(len(labels)), vals, lw=1.0, ls="--")
      mean = float(np.nanmean(vals))
      ax.axhline(mean, lw=1.2, ls=":", color="black")
      ax.text(0, mean + 3, r"$\overline{F1}$:%.1f" % mean, fontsize=8)
      ax.set_xticks(np.arange(len(labels)))
      ax.set_xticklabels(labels if idx == 0 else [""] * len(labels),
                         rotation=90, fontsize=6)
      ax.set_xlabel(name, fontsize=10)
      ax.set_ylim(-8, 130)
      ax.set_yticks(np.linspace(0, 100, 5))
    fig.tight_layout(w_pad=0)
    self.add_figure("compare_classifier_f1", fig)
    return self

  def plot_correlation_marker_pairs(self, imputed: bool = True,
                                    fontsize: int = 8,
                                    max_pairs: int = 6) -> "ResultsSheet":
    """Marker gene↔protein scatter per pair × (Original + each model's
    imputed series), annotated with pearson/spearman — the reference's
    ``plot_correlation_marker_pairs`` (:390-467)."""
    import matplotlib.pyplot as plt
    from scipy.stats import pearsonr, spearmanr
    from .imputation import correlation_scores
    p0 = self.posteriors[0]
    if "proteomic" not in p0.sco_original.omics:
      return self
    gene_names = p0.sco_original.get_var_names(p0.main_omic)
    prot_names = p0.sco_original.get_var_names("proteomic")
    y = p0.sco_original.numpy("proteomic")
    original = correlation_scores(p0.sco_original.numpy(p0.main_omic), y,
                                  gene_names, prot_names, return_series=True)
    if not original:
      return self
    imputed_series = []
    for p in self.posteriors:
      X = p.sco_analysis.numpy(f"i{p.main_omic}")
      imputed_series.append(correlation_scores(
          X, p.sco_original.numpy("proteomic"),
          p.sco_original.get_var_names(p.main_omic),
          p.sco_original.get_var_names("proteomic"), return_series=True))
    pairs = list(original.keys())[:max_pairs]
    ncol = 1 + len(self.posteriors)
    fig, axes = plt.subplots(len(pairs), ncol, squeeze=False,
                             figsize=(4 * ncol, 3.2 * len(pairs)))
    for r, pair in enumerate(pairs):
      gx0, py0 = original[pair]
      cols = [("Original", gx0, py0)]
      cols += [(p.name, *s[pair]) for p, s in zip(self.posteriors,
                                                  imputed_series)
               if pair in s]
      for c, (name, g, prot) in enumerate(cols):
        ax = axes[r][c]
        ax.scatter(prot, g, s=18, alpha=0.6, linewidths=0)
        pe = pearsonr(g, prot)[0] if np.std(g) > 0 else 0.0
        sp = spearmanr(g, prot).statistic if np.std(g) > 0 else 0.0
        ax.set_title(f"{pair} - {name}\nPearson:{pe:.2f} "
                     f"Spearman:{sp:.2f}", fontsize=fontsize)
        if c == 0:
          prot_nm, gene_nm = pair.split("/")
          ax.set_xlabel(f"[Protein] {prot_nm}", fontsize=fontsize)
          ax.set_ylabel(f"[Gene] {gene_nm}", fontsize=fontsize)
    fig.tight_layout()
    self.add_figure("correlation_marker_pairs", fig)
    return self

  def plot_latents_binary_scatter(self) -> "ResultsSheet":
    """Per-model binary-protein latent scatter (reference :532-559)."""
    for p in self.posteriors:
      p.plot_latents_binary()
      self.figures.update(p.figures)
      p.figures.clear()
    return self

  def plot_scores(self, score_type: str = "imputation",
                  width: float = 0.2) -> "ResultsSheet":
    """Grouped bar over an arbitrary score family prefix (reference
    ``plot_scores`` :594-657)."""
    df = self.get_scores()
    cols = [c for c in df.columns if c.startswith(score_type)]
    fig = self._bar_compare(cols[:12], f"{score_type} scores")
    if fig is not None:
      self.add_figure(f"scores_{score_type}", fig)
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
            .plot_comparison_f1().plot_correlation_marker_pairs()
            .boxplot_f1().boxplot_spearman().barplot_cluster()
            .plot_learning_curves())

  def save_plots(self, path: str, dpi: int = 120,
                 separate_files: bool = True) -> "ResultsSheet":
    """Reference alias for the figure-sink save (:657-663)."""
    return self.save_figures(path, dpi=dpi, separate_files=separate_files)

  # ---------------------------------------------------------- dunder surface
  def summary(self) -> str:
    lines = [f"ResultsSheet: {len(self)} posteriors"]
    for p in self.posteriors:
      lines.append(f"  {p.name}: omics={list(p.sco_original.omics)}")
    return "\n".join(lines)

  def __str__(self):
    return self.summary()

  def __len__(self):
    return len(self.posteriors)

  def __getitem__(self, key):
    """String keys match the full posterior name or any '_'-token of it,
    case-insensitively (reference results_sheet.py:692-697 token
    semantics: ``rs['SISUA']`` finds the 'sisua_…' posterior); callables
    filter; ints/slices index."""
    if isinstance(key, str):
      # exact name wins over token matches (a posterior literally named
      # 'vae' must shadow 'sisua_vae' whose token also matches)
      for p in self.posteriors:
        if p.name == key:
          return p
      for p in self.posteriors:
        if key.lower() in p.name.lower().split("_"):
          return p
      raise KeyError(key)
    if callable(key):
      for p in self.posteriors:
        if key(p):
          return p
      raise KeyError(key)
    return self.posteriors[key]

  def __iter__(self):
    return iter(self.posteriors)

  def __repr__(self):
    return f"ResultsSheet({', '.join(self.names)})"
