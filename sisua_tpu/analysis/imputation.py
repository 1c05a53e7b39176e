"""Imputation benchmarks (denoising quality after artificial corruption).

Metric definitions pinned by the reference
(``/root/reference/sisua/analysis/imputation_benchmarks.py``):
  * ``imputation_score`` (:102-107): median of |original − imputed| over all
    entries (on log-normalized values in the reference protocol's spirit —
    we apply it to raw counts exactly as the reference does).
  * ``imputation_mean_score`` / ``imputation_std_score`` (:110-127): mean /
    std over *corrupted cells only* of the per-cell median |orig − imputed|.
  * ``correlation_scores`` (:34-96): spearman+pearson between imputed marker
    genes and their paired protein levels.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy import stats as sp_stats

__all__ = [
    "imputation_score", "imputation_mean_score", "imputation_std_score",
    "correlation_scores", "get_imputed_indices", "plot_imputation",
    "plot_imputation_series",
]


def get_imputed_indices(x_org: np.ndarray, x_imp: np.ndarray) -> np.ndarray:
  """Indices of cells whose counts changed under imputation
  (reference :25-31: row sums differ)."""
  return np.nonzero(np.asarray(x_org).sum(axis=1)
                    != np.asarray(x_imp).sum(axis=1))[0]


def _per_cell_median_abs_err(original: np.ndarray,
                             imputed: np.ndarray) -> np.ndarray:
  return np.median(np.abs(original - imputed), axis=1)


def imputation_score(original: np.ndarray, imputed: np.ndarray) -> float:
  """Median absolute deviation over all entries (reference :102-107)."""
  assert original.shape == imputed.shape
  return float(np.median(np.abs(original - imputed)))


def _corrupted_cells_mask(original: np.ndarray,
                          corrupted: np.ndarray) -> np.ndarray:
  return np.asarray((original != corrupted)).any(axis=1)


def imputation_mean_score(original: np.ndarray, corrupted: np.ndarray,
                          imputed: np.ndarray) -> float:
  """Mean over corrupted cells of per-cell median |orig − imputed|."""
  mask = _corrupted_cells_mask(original, corrupted)
  if not mask.any():
    return 0.0
  return float(np.mean(_per_cell_median_abs_err(original[mask],
                                                imputed[mask])))


def imputation_std_score(original: np.ndarray, corrupted: np.ndarray,
                         imputed: np.ndarray) -> float:
  """Std over corrupted cells of per-cell median |orig − imputed|."""
  mask = _corrupted_cells_mask(original, corrupted)
  if not mask.any():
    return 0.0
  return float(np.std(_per_cell_median_abs_err(original[mask],
                                               imputed[mask])))


def correlation_scores(X: np.ndarray,
                       y: np.ndarray,
                       gene_name: Sequence[str],
                       protein_name: Sequence[str],
                       return_series: bool = False
                       ) -> Dict[str, Tuple[float, float]]:
  """(spearman, pearson) between each marker gene in X and its paired
  protein in y, using the marker knowledge base (reference :34-96).

  Returns {'<protein>/<gene>': (spearman, pearson)}, or — with
  ``return_series=True`` — {'<protein>/<gene>': (gene_series, prot_series)}
  (the raw per-cell series, the reference's ``return_series`` used by
  ``ResultsSheet.plot_correlation_marker_pairs``).
  """
  from ..data.const import MARKER_ADT_GENE
  from ..data.utils import standardize_protein_name
  gene_idx = {str(g): i for i, g in enumerate(gene_name)}
  prot_names = [standardize_protein_name(str(p)) for p in protein_name]
  scores: Dict[str, Tuple[float, float]] = {}
  for j, prot in enumerate(prot_names):
    gene = MARKER_ADT_GENE.get(prot)
    if gene is None or gene not in gene_idx:
      continue
    gx = np.asarray(X[:, gene_idx[gene]], np.float64).ravel()
    py = np.asarray(y[:, j], np.float64).ravel()
    if return_series:
      scores[f"{prot}/{gene}"] = (gx, py)
      continue
    if gx.std() == 0 or py.std() == 0:
      spear = pear = 0.0
    else:
      spear = float(sp_stats.spearmanr(gx, py).statistic)
      pear = float(sp_stats.pearsonr(gx, py).statistic)
    scores[f"{prot}/{gene}"] = (spear, pear)
  return scores


def plot_imputation_series(original: np.ndarray, imputed: np.ndarray,
                           title: str = "Imputation"):
  """Pairwise original/imputed library-size series: joint scatter with a
  regression line + identity, and marginal histograms (reference :133-159's
  seaborn pairplot, rendered as a 2×2 grid)."""
  import matplotlib
  matplotlib.use("Agg")
  import matplotlib.pyplot as plt
  x = np.log1p(np.asarray(original, np.float64).ravel())
  y = np.log1p(np.asarray(imputed, np.float64).ravel())
  max_val = float(max(x.max(), y.max())) if x.size else 1.0
  fig, axes = plt.subplots(2, 2, figsize=(8, 8))
  axes[0][0].hist(x, bins=180, color="g", alpha=0.8)
  axes[0][0].set_xlabel("Original Value")
  axes[1][1].hist(y, bins=180, color="g", alpha=0.8)
  axes[1][1].set_xlabel("Imputed Value")
  slope, intercept = (np.polyfit(x, y, 1) if x.size > 1 else (1.0, 0.0))
  grid = np.linspace(0, max_val, 50)
  for ax, (a, b) in ((axes[0][1], (x, y)), (axes[1][0], (y, x))):
    ax.scatter(a, b, s=2, alpha=0.6, color="g", linewidths=0)
    if ax is axes[0][1]:
      fit = slope * grid + intercept
    elif abs(slope) > 1e-8:
      fit = (grid - intercept) / slope  # keep the sign: an anti-correlated
      # imputation must show its (negative-slope) regression line
    else:
      fit = np.full_like(grid, np.nan)  # vertical line — nothing to draw
    ax.plot(grid, fit, color="red", alpha=0.8, lw=1.2)
    ax.plot(grid, grid, linestyle="--", linewidth=1, color="black")
    ax.set_xlim((0, max_val))
    ax.set_ylim((0, max_val))
  axes[0][1].set_xlabel("Original Value")
  axes[0][1].set_ylabel("Imputed Value")
  axes[1][0].set_xlabel("Imputed Value")
  axes[1][0].set_ylabel("Original Value")
  fig.suptitle(title)
  fig.tight_layout()
  return fig


def plot_imputation(original: np.ndarray, imputed: np.ndarray,
                    corrupted: Optional[np.ndarray] = None,
                    title: str = "Imputation"):
  """Density scatter original vs imputed (scVI-derived plot,
  reference :162-231)."""
  import matplotlib
  matplotlib.use("Agg")
  import matplotlib.pyplot as plt
  x = np.log1p(original.ravel())
  y = np.log1p(imputed.ravel())
  if len(x) > 200000:
    idx = np.random.default_rng(0).choice(len(x), 200000, replace=False)
    x, y = x[idx], y[idx]
  fig, ax = plt.subplots(figsize=(6, 6))
  hb = ax.hexbin(x, y, gridsize=60, bins="log", cmap="viridis")
  lim = max(x.max(), y.max())
  ax.plot([0, lim], [0, lim], "r--", lw=1)
  ax.set_xlabel("log1p original")
  ax.set_ylabel("log1p imputed")
  ax.set_title(title)
  fig.colorbar(hb, ax=ax)
  return fig
