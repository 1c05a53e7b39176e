"""Training monitors: figures saved every eval epoch.

Capability parity with ``/root/reference/sisua/analysis/sc_monitor.py``:
``SingleCellMonitor`` base (renders + saves a figure per firing, :36-64),
``LearningCurves`` (:67-99), ``ScatterPlot`` (:102-155), ``HeatmapPlot``
(:158-188).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from .sc_metrics import SingleCellMetric, _first

__all__ = ["SingleCellMonitor", "LearningCurves", "ScatterPlot",
           "HeatmapPlot"]


class SingleCellMonitor(SingleCellMetric):
  """Figure-emitting callback: subclass ``plot``; saved under ``path``."""

  def __init__(self, path: str, dpi: int = 100, **kwargs):
    super().__init__(**kwargs)
    self.path = path
    self.dpi = int(dpi)
    os.makedirs(path, exist_ok=True)

  def call(self, y_true, pX, qZ):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig = self.plot(y_true, pX, qZ)
    if fig is not None:
      epoch = len(self.model.history.get("loss", []))
      fig.savefig(os.path.join(self.path,
                               f"{self.name}_epoch{epoch:04d}.png"),
                  dpi=self.dpi, bbox_inches="tight")
      plt.close(fig)
    return {}

  def plot(self, y_true, pX, qZ):
    raise NotImplementedError


class LearningCurves(SingleCellMonitor):
  """Loss/val_loss + llk/klqp curves (reference :67-99)."""

  def __init__(self, path: str, keys: Optional[Sequence[str]] = None,
               **kwargs):
    super().__init__(path, **kwargs)
    self.keys = keys

  def plot(self, y_true, pX, qZ):
    import matplotlib.pyplot as plt
    hist = self.model.history
    if not hist:
      return None
    keys = self.keys or [k for k in hist
                         if k.startswith(("loss", "val_loss", "llk", "klqp"))]
    fig, ax = plt.subplots(figsize=(7, 4))
    for k in keys:
      if k in hist:
        ax.plot(hist[k], label=k, lw=1)
    ax.legend(fontsize=6)
    ax.set_xlabel("epoch")
    return fig


class ScatterPlot(SingleCellMonitor):
  """Latent PCA scatter colored by a label omic (reference :102-155)."""

  def plot(self, y_true, pX, qZ):
    from sklearn.decomposition import PCA
    from ..utils.visualization import fast_scatter
    z = np.asarray(_first(qZ).mean())
    emb = PCA(2).fit_transform(z) if z.shape[1] > 2 else z
    labels = None
    for cand in ("celltype", "disease", "progenitor"):
      if cand in self.sco.omics:
        names = self.sco.get_var_names(cand)
        labels = np.asarray(names)[np.argmax(self.sco.numpy(cand), 1)]
        break
    ax = fast_scatter(emb, labels=labels, title=self.name)
    return ax.get_figure()


class HeatmapPlot(SingleCellMonitor):
  """Imputed-vs-original mean-expression heatmap (reference :158-188)."""

  def plot(self, y_true, pX, qZ):
    import matplotlib.pyplot as plt
    from .posterior import _unwrap_imputed
    from .sc_metrics import _mc_mean
    imp = _mc_mean(_unwrap_imputed(_first(pX)))
    org = y_true[0]
    order = np.argsort(-org.var(0))[:50]
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    for ax, m, t in ((axes[0], org[:, order], "original"),
                     (axes[1], imp[:, order], "imputed")):
      im = ax.imshow(np.log1p(m[np.argsort(org[:, order[0]])]),
                     aspect="auto", cmap="viridis")
      ax.set_title(t)
      ax.set_yticks([])
      fig.colorbar(im, ax=ax)
    return fig
