"""Series-statistics plots + per-epoch monitoring figure.

Capability parity with ``/root/reference/sisua/utils/plot_utils.py`` and the
``plot_monitoring_epoch`` helper of ``utils/visualization.py``: mean±std
bands of sorted expression series, original/corrupted/imputed comparison
panels per epoch.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

__all__ = ["plot_series_statistics", "plot_monitoring_epoch",
           "plot_countsum_series", "plot_countsum_comparison"]


def plot_countsum_series(original: np.ndarray,
                         imputed,
                         p: Optional[np.ndarray] = None,
                         reduce_axis: int = 0,
                         title: Optional[str] = None,
                         ax=None):
  """Log1p count-sums of observed vs expected with a ±stdev band, sorted by
  the observed series; optional dropout-probability overlay (reference
  plot_utils.py:45-100). ``imputed`` is (expected, stdev_total,
  stdev_explained) as a tuple or a stacked [3, n, g] array."""
  from .visualization import to_axis
  ax = to_axis(ax, (10, 4))
  if isinstance(imputed, (tuple, list)):
    assert len(imputed) == 3
    expected, stdev_total, stdev_explained = imputed
  else:
    imputed = np.asarray(imputed)
    assert imputed.ndim == 3 and imputed.shape[0] == 3
    expected, stdev_total, stdev_explained = imputed
  axis = int(reduce_axis)
  obs = np.log1p(np.sum(np.asarray(original), axis=axis))
  exp = np.log1p(np.sum(np.asarray(expected), axis=axis))
  std_tot = np.log1p(np.sum(np.asarray(stdev_total), axis=axis))
  std_exp = np.log1p(np.sum(np.asarray(stdev_explained), axis=axis))
  order = np.argsort(obs)
  x = np.arange(len(order))
  ax.plot(x, obs[order], lw=1.2, color="tab:blue", label="observed")
  ax.plot(x, exp[order], lw=1.0, color="tab:orange", label="expected")
  ax.fill_between(x, exp[order] - std_tot[order], exp[order] + std_tot[order],
                  alpha=0.15, color="tab:orange", label="total stdev")
  ax.fill_between(x, exp[order] - std_exp[order], exp[order] + std_exp[order],
                  alpha=0.3, color="tab:orange", label="explained stdev")
  ax.set_xlabel("rank by observed count-sum", fontsize=8)
  ax.set_ylabel("log1p count-sum", fontsize=8)
  ax.legend(fontsize=7)
  if p is not None:
    twin = ax.twinx()
    twin.plot(x, np.mean(np.asarray(p), axis=axis)[order], lw=0.8,
              color="tab:red", alpha=0.6, label="dropout prob")
    twin.set_ylabel("dropout probability", fontsize=8, color="tab:red")
    twin.set_ylim(0, 1)
  if title:
    ax.set_title(title, fontsize=10)
  return ax


def _dist_or_array_mean(x) -> np.ndarray:
  if hasattr(x, "mean") and not isinstance(x, np.ndarray):
    x = x.mean()
  x = np.asarray(x)
  return x[0] if x.ndim == 3 else x


def plot_countsum_comparison(original: np.ndarray,
                             reconstructed,
                             imputed,
                             title: str = "",
                             comparing_axis: int = 0,
                             ax=None):
  """Scatter of reconstructed/imputed count-sums against the original, with
  per-series median lines (reference plot_utils.py:103-160)."""
  from .visualization import to_axis
  ax = to_axis(ax, (6, 6))
  axis = int(comparing_axis)
  org = np.asarray(original).sum(axis=axis)
  rec = _dist_or_array_mean(reconstructed).sum(axis=axis)
  imp = _dist_or_array_mean(imputed).sum(axis=axis)
  assert org.shape == rec.shape == imp.shape
  order = np.argsort(org)
  org, rec, imp = (np.log1p(v[order]) for v in (org, rec, imp))
  colors = plt.get_cmap("Set2").colors
  ax.scatter(org, imp, c=[colors[1]], s=3, alpha=0.3, label="imputed")
  ax.scatter(org, rec, c=[colors[2]], s=3, alpha=0.3, label="reconstructed")
  for series, color, name in ((org, colors[0], "Original Median"),
                              (imp, colors[1], "Imputed Median"),
                              (rec, colors[2], "Reconstructed Median")):
    ax.axhline(y=float(np.median(series)), color=color, linestyle="--",
               linewidth=1.5, label=name)
  lim = float(max(org.max(), rec.max(), imp.max())) if org.size else 1.0
  ax.plot([0, lim], [0, lim], lw=0.8, ls=":", color="black")
  ax.set_xlabel("log1p original count-sum", fontsize=8)
  ax.set_ylabel("log1p predicted count-sum", fontsize=8)
  ax.legend(fontsize=7, markerscale=3)
  ax.set_title(title, fontsize=10)
  return ax


def plot_series_statistics(series: Dict[str, np.ndarray],
                           log_scale: bool = True,
                           title: str = "",
                           ax=None):
  """Sorted-value curves with mean±std band per named series — the
  reference's gene-series statistics figure."""
  if ax is None:
    _, ax = plt.subplots(figsize=(8, 4))
  for name, values in series.items():
    v = np.sort(np.asarray(values).ravel())
    if log_scale:
      v = np.log1p(v)
    ax.plot(v, lw=1, label=f"{name} (μ={v.mean():.2f}±{v.std():.2f})")
  ax.legend(fontsize=7)
  ax.set_xlabel("rank")
  ax.set_ylabel("log1p value" if log_scale else "value")
  ax.set_title(title, fontsize=10)
  return ax


def plot_monitoring_epoch(x_original: np.ndarray,
                          x_corrupted: Optional[np.ndarray],
                          x_imputed: np.ndarray,
                          latents: Optional[np.ndarray] = None,
                          labels: Optional[Sequence] = None,
                          epoch: int = 0,
                          title: str = ""):
  """One monitoring figure per eval epoch: count-series comparison +
  imputation scatter + (optional) latent scatter."""
  from .visualization import fast_scatter
  ncols = 3 if latents is not None else 2
  fig, axes = plt.subplots(1, ncols, figsize=(5 * ncols, 4))
  series = {"original": x_original.sum(0), "imputed": x_imputed.sum(0)}
  if x_corrupted is not None:
    series["corrupted"] = x_corrupted.sum(0)
  plot_series_statistics(series, title=f"{title} epoch {epoch}", ax=axes[0])
  idx = np.random.default_rng(0).choice(
      x_original.size, min(50_000, x_original.size), replace=False)
  axes[1].hexbin(np.log1p(x_original.ravel()[idx]),
                 np.log1p(x_imputed.ravel()[idx]), gridsize=50, bins="log")
  axes[1].set_xlabel("log1p original")
  axes[1].set_ylabel("log1p imputed")
  if latents is not None:
    if latents.shape[1] == 1:      # 1-D latent: pad a zero y-axis
      emb = np.concatenate([latents, np.zeros_like(latents)], axis=1)
    elif latents.shape[1] == 2:
      emb = latents
    else:
      from sklearn.decomposition import PCA
      emb = PCA(2).fit_transform(latents)
    fast_scatter(emb, labels=labels, title="latent", ax=axes[2])
  fig.tight_layout()
  return fig
