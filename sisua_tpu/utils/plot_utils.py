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

__all__ = ["plot_series_statistics", "plot_monitoring_epoch"]


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
