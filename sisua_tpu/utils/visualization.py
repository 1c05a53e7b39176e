"""Plotting utilities + the Visualizer figure-sink mixin.

Re-provides the reference's `[odin] Visualizer` pattern (``add_figure`` /
``save_figures`` used across ``sisua/analysis/*`` and the data container) and
the helper plots of ``/root/reference/sisua/utils/visualization.py``
(fast_scatter, plot_evaluate_classifier, …). All matplotlib with the Agg
backend — figures are host-side artifacts.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

__all__ = [
    "Visualizer", "fast_scatter", "plot_evaluate_classifier",
    "plot_evaluate_regressor", "plot_evaluate_reconstruction",
    "save_figures", "to_axis", "downsample_data", "show_image",
]


def to_axis(ax=None, fig_size=(8, 6)):
  if ax is None:
    fig = plt.figure(figsize=fig_size)
    ax = fig.add_subplot(111)
  return ax


class Visualizer:
  """Figure sink: accumulate named figures, save them all at once."""

  @property
  def figures(self) -> Dict[str, plt.Figure]:
    if not hasattr(self, "_figures"):
      self._figures: Dict[str, plt.Figure] = {}
    return self._figures

  def add_figure(self, name: str, fig: plt.Figure) -> "Visualizer":
    old = self.figures.get(name)
    if old is not None and old is not fig:
      plt.close(old)  # replacing a name must not leak the old canvas
    self.figures[name] = fig
    # detach from pyplot's global registry: 30-figure grids (plot_all
    # full=True) otherwise trip the >20-open-figures RuntimeWarning and pin
    # every canvas until save. The Figure object stays alive in the sink
    # and fig.savefig still renders through its Agg canvas.
    plt.close(fig)
    return self

  def save_figures(self,
                   path: str,
                   dpi: int = 120,
                   separate_files: bool = True,
                   clear_figures: bool = True,
                   verbose: bool = False) -> "Visualizer":
    if separate_files:
      os.makedirs(path, exist_ok=True)
      for name, fig in self.figures.items():
        fp = os.path.join(path, f"{name}.png")
        fig.savefig(fp, dpi=dpi, bbox_inches="tight")
        if verbose:
          print("saved:", fp)
    else:  # single pdf
      from matplotlib.backends.backend_pdf import PdfPages
      os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
      with PdfPages(path) as pdf:
        for name, fig in self.figures.items():
          pdf.savefig(fig)
      if verbose:
        print("saved:", path)
    if clear_figures:
      for fig in self.figures.values():
        plt.close(fig)
      self.figures.clear()
    return self


def save_figures(figures: Dict[str, plt.Figure], path: str, dpi: int = 120):
  v = Visualizer()
  for k, f in figures.items():
    v.add_figure(k, f)
  v.save_figures(path, dpi=dpi)


def downsample_data(*X, max_samples: int = 8000, seed: int = 87654321):
  """Subsample every array to ≤ ``max_samples`` rows with one shared seeded
  choice; None entries pass through (reference visualization.py:44-61)."""
  sizes = {x.shape[0] for x in X if x is not None}
  assert len(sizes) == 1, "Inconsistent shape[0] across inputs"
  n = sizes.pop()
  if n <= max_samples:
    return tuple(X)
  ids = np.random.RandomState(seed).choice(n, max_samples, replace=False)
  return tuple(None if x is None else x[ids] for x in X)


def show_image(x: np.ndarray, is_probability: bool = False,
               ax=None) -> plt.Axes:
  """Render a vector/matrix as a grayscale image, 4×4 max-pooled when large
  (reference visualization.py:64-86)."""
  from .others import anything2image
  x = np.asarray(anything2image(np.asarray(x)), np.float32)
  if x.ndim == 2 and x.shape[0] > 32:
    h, w = (x.shape[0] // 4) * 4, (x.shape[1] // 4) * 4
    x = x[:h, :w].reshape(h // 4, 4, w // 4, 4).max(axis=(1, 3))
  ax = to_axis(ax)
  ax.imshow(x, interpolation="nearest", cmap=plt.cm.Greys_r,
            vmin=0.0 if is_probability else None,
            vmax=1.0 if is_probability else None)
  ax.set_xticks([])
  ax.set_yticks([])
  ax.set_aspect(aspect="auto")
  return ax


def fast_scatter(x: np.ndarray,
                 y: Optional[np.ndarray] = None,
                 labels: Optional[Sequence] = None,
                 title: str = "",
                 ax=None,
                 size: int = 8,
                 fig_size=(8, 6)) -> plt.Axes:
  """2-D scatter colored by (categorical) labels (ref visualization.py)."""
  ax = to_axis(ax, fig_size)
  if y is None:
    x, y = x[:, 0], x[:, 1]
  if labels is None:
    ax.scatter(x, y, s=size, alpha=0.6, linewidths=0)
  else:
    labels = np.asarray(labels)
    uniq = np.unique(labels)
    cmap = plt.get_cmap("tab20", len(uniq))
    for i, u in enumerate(uniq):
      m = labels == u
      ax.scatter(x[m], y[m], s=size, alpha=0.6, linewidths=0,
                 color=cmap(i), label=str(u))
    if len(uniq) <= 20:
      ax.legend(fontsize=6, markerscale=2, loc="best")
  ax.set_title(title, fontsize=10)
  ax.set_xticks([])
  ax.set_yticks([])
  return ax


def plot_evaluate_classifier(y_pred: np.ndarray,
                             y_true: np.ndarray,
                             labels: Sequence[str],
                             title: str = "",
                             return_figure: bool = False):
  """Per-class F1 bar chart + table (ref visualization.py F1 helper)."""
  from sklearn.metrics import f1_score
  y_pred_b = (y_pred > 0.5).astype(int)
  y_true_b = (y_true > 0.5).astype(int)
  f1s = [f1_score(y_true_b[:, i], y_pred_b[:, i], zero_division=0)
         for i in range(y_true.shape[1])]
  fig, ax = plt.subplots(figsize=(max(6, 0.5 * len(labels)), 4))
  ax.bar(range(len(labels)), f1s)
  ax.set_xticks(range(len(labels)))
  ax.set_xticklabels([str(l) for l in labels], rotation=45, fontsize=7,
                     ha="right")
  ax.set_ylabel("F1")
  ax.set_ylim(0, 1)
  ax.set_title(f"{title} (mean F1={np.mean(f1s):.3f})")
  fig.tight_layout()
  scores = dict(zip(map(str, labels), f1s))
  if return_figure:
    return scores, fig
  plt.close(fig)
  return scores


def plot_evaluate_regressor(y_pred: np.ndarray, y_true: np.ndarray,
                            labels: Sequence[str], title: str = "",
                            return_figure: bool = False):
  """Predicted-vs-true scatter grid with R² (ref visualization.py)."""
  n = y_true.shape[1]
  ncol = min(4, n)
  nrow = int(np.ceil(n / ncol))
  fig, axes = plt.subplots(nrow, ncol, figsize=(3 * ncol, 3 * nrow),
                           squeeze=False)
  r2s = {}
  for i in range(n):
    ax = axes[i // ncol][i % ncol]
    yt, yp = y_true[:, i], y_pred[:, i]
    ss_res = np.sum((yt - yp) ** 2)
    ss_tot = np.sum((yt - yt.mean()) ** 2) + 1e-12
    r2 = 1 - ss_res / ss_tot
    r2s[str(labels[i])] = float(r2)
    ax.scatter(yt, yp, s=4, alpha=0.4, linewidths=0)
    ax.set_title(f"{labels[i]} R2={r2:.2f}", fontsize=8)
  fig.suptitle(title)
  fig.tight_layout()
  if return_figure:
    return r2s, fig
  plt.close(fig)
  return r2s


def plot_evaluate_reconstruction(x: np.ndarray, x_rec: np.ndarray,
                                 title: str = "", n_cells: int = 8):
  """Original vs reconstructed count profiles for a few cells."""
  idx = np.linspace(0, x.shape[0] - 1, n_cells).astype(int)
  fig, axes = plt.subplots(n_cells, 1, figsize=(10, 1.6 * n_cells),
                           squeeze=False)
  for r, i in enumerate(idx):
    ax = axes[r][0]
    ax.plot(x[i], lw=0.5, label="original")
    ax.plot(x_rec[i], lw=0.5, alpha=0.7, label="reconstructed")
    ax.set_yticks([])
    if r == 0:
      ax.legend(fontsize=6)
      ax.set_title(title, fontsize=9)
  fig.tight_layout()
  return fig
