"""_OMICvisualizer — plotting methods on the dataset container.

Re-provides the plot inventory of
``/root/reference/sisua/data/_single_cell_visualizer.py`` (15+ methods) on
matplotlib/seaborn. Every method renders a figure, registers it in the
container's figure sink (``add_figure``/``save_figures``) and returns self —
matching the reference's fluent style.

The ``_process_omics`` helper resolves an omic spec to per-cell labels the
same way the reference does (:28-90): one-hot labels → argmax names, count
labels → probabilistic embedding, or clustering/louvain keys.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np
import pandas as pd

from ..utils.visualization import Visualizer, fast_scatter, to_axis
from .analysis import _OMICanalyzer
from .const import OMIC

__all__ = ["_OMICvisualizer"]


class _OMICvisualizer(_OMICanalyzer, Visualizer):

  # ------------------------------------------------------------- label reso
  def _process_omics(self, omic, clustering: Optional[str] = None
                     ) -> Tuple[str, np.ndarray]:
    """Resolve an omic (or clustering spec) to (name, per-cell labels)."""
    if isinstance(omic, str) and omic in self.obs:
      return omic, self.obs[omic].values
    omic = OMIC.parse(omic)
    name = omic.name
    if clustering is not None:
      algo = str(clustering).lower()
      if algo == "louvain":
        key = self.louvain(omic, return_key=True)
      else:
        key = self.clustering(omic, algo=algo, return_key=True)
      return key, self.obs[key].values
    x = self.numpy(omic)
    var_names = self.get_var_names(omic)
    from .utils import is_categorical_dtype, is_binary_dtype
    if is_categorical_dtype(x):  # one-hot → names
      return name, np.asarray(var_names)[np.argmax(x, -1)]
    if is_binary_dtype(x):
      lab = np.asarray(["+".join(np.asarray(var_names)[row > 0.5]) or "none"
                        for row in x])
      return name, lab
    if name in ("proteomic", "iproteomic"):
      # dominant protein per cell (reference resolves protein labels via the
      # probabilistic embedding; argmax of raw counts is its binary analogue)
      return name, np.asarray(var_names)[np.argmax(x, -1)]
    # continuous fallback: argmax variable
    return name, np.asarray(var_names)[np.argmax(x, -1)]

  # ----------------------------------------------------------------- plots
  def plot_scatter(self,
                   X=OMIC.transcriptomic,
                   color_by=None,
                   algo: str = "tsne",
                   clustering: Optional[str] = None,
                   dimension: int = 2,
                   ax=None,
                   fig_size=(8, 6),
                   title: Optional[str] = None) -> "_OMICvisualizer":
    """2-D embedding scatter colored by a label omic (ref :92-160)."""
    omic = OMIC.parse(X)
    emb = self.dimension_reduce(omic, n_components=dimension, algo=algo)
    labels = None
    if color_by is not None:
      _, labels = self._process_omics(color_by, clustering=clustering)
    name = title or f"{omic.name}_{algo}_scatter"
    ax = fast_scatter(emb[:, :2], labels=labels, title=name, ax=ax,
                      fig_size=fig_size)
    self.add_figure(name, ax.get_figure())
    return self

  def plot_stacked_violins(self,
                           X=OMIC.transcriptomic,
                           group_by=OMIC.celltype,
                           var_names: Optional[Sequence[str]] = None,
                           clustering: Optional[str] = None,
                           log: bool = True) -> "_OMICvisualizer":
    """Violin of marker vars per label group (ref :162-230)."""
    import matplotlib.pyplot as plt
    import seaborn as sns
    omic = OMIC.parse(X)
    if var_names is None:
      markers = omic.markers or []
      names = set(map(str, self.get_var_names(omic)))
      var_names = [m for m in markers if m in names][:10] or \
          list(self.top_vars(omic, 10))
    _, labels = self._process_omics(group_by, clustering=clustering)
    vi = self.get_var_indices(omic)
    x = self.numpy(omic)[:, [vi[str(v)] for v in var_names]]
    if log:
      x = np.log1p(x)
    df = pd.DataFrame(x, columns=[str(v) for v in var_names])
    df["group"] = labels
    melt = df.melt(id_vars="group", var_name="var", value_name="value")
    fig, ax = plt.subplots(figsize=(max(8, len(var_names)), 5))
    sns.violinplot(data=melt, x="var", y="value", hue="group", ax=ax,
                   cut=0, linewidth=0.4, density_norm="width")
    ax.legend(fontsize=6)
    ax.tick_params(axis="x", rotation=45)
    name = f"{omic.name}_violins"
    self.add_figure(name, fig)
    return self

  def plot_dotplot(self,
                   X=OMIC.transcriptomic,
                   group_by=OMIC.celltype,
                   var_names: Optional[Sequence[str]] = None
                   ) -> "_OMICvisualizer":
    """Mean-expression dot plot: dot size = fraction expressing (ref :232)."""
    import matplotlib.pyplot as plt
    omic = OMIC.parse(X)
    if var_names is None:
      markers = omic.markers or []
      names = set(map(str, self.get_var_names(omic)))
      var_names = [m for m in markers if m in names][:12] or \
          list(self.top_vars(omic, 12))
    _, labels = self._process_omics(group_by)
    vi = self.get_var_indices(omic)
    x = self.numpy(omic)[:, [vi[str(v)] for v in var_names]]
    uniq = np.unique(labels)
    mean = np.stack([x[labels == u].mean(0) for u in uniq])
    frac = np.stack([(x[labels == u] > 0).mean(0) for u in uniq])
    fig, ax = plt.subplots(figsize=(max(6, len(var_names) * 0.6),
                                    max(4, len(uniq) * 0.4)))
    gi, vj = np.meshgrid(np.arange(len(uniq)), np.arange(len(var_names)),
                         indexing="ij")
    sc = ax.scatter(vj.ravel(), gi.ravel(), s=20 + 180 * frac.ravel(),
                    c=mean.ravel(), cmap="Reds")
    ax.set_xticks(range(len(var_names)))
    ax.set_xticklabels([str(v) for v in var_names], rotation=45, fontsize=7,
                       ha="right")
    ax.set_yticks(range(len(uniq)))
    ax.set_yticklabels([str(u) for u in uniq], fontsize=7)
    fig.colorbar(sc, ax=ax, label="mean expression")
    self.add_figure(f"{omic.name}_dotplot", fig)
    return self

  def plot_heatmap(self,
                   X=OMIC.transcriptomic,
                   group_by=OMIC.celltype,
                   var_names: Optional[Sequence[str]] = None,
                   log: bool = True) -> "_OMICvisualizer":
    """Cells×vars heatmap grouped by labels (ref :plot_heatmap)."""
    import matplotlib.pyplot as plt
    omic = OMIC.parse(X)
    if var_names is None:
      var_names = list(self.top_vars(omic, 25))
    _, labels = self._process_omics(group_by)
    vi = self.get_var_indices(omic)
    x = self.numpy(omic)[:, [vi[str(v)] for v in var_names]]
    if log:
      x = np.log1p(x)
    order = np.argsort(labels)
    fig, ax = plt.subplots(figsize=(8, 6))
    im = ax.imshow(x[order], aspect="auto", cmap="viridis",
                   interpolation="nearest")
    ax.set_xticks(range(len(var_names)))
    ax.set_xticklabels([str(v) for v in var_names], rotation=90, fontsize=6)
    ax.set_yticks([])
    fig.colorbar(im, ax=ax)
    self.add_figure(f"{omic.name}_heatmap", fig)
    return self

  def plot_dendrogram_heatmap(self,
                              X=OMIC.transcriptomic,
                              group_by=OMIC.celltype,
                              var_names: Optional[Sequence[str]] = None,
                              log: bool = True) -> "_OMICvisualizer":
    """Hierarchically-clustered group-mean heatmap with the dendrogram drawn
    above (the scanpy dendrogram panel of the reference's
    ``_single_cell_visualizer.py``): groups ordered by Ward linkage over
    their centroid profiles."""
    import matplotlib.pyplot as plt
    from scipy.cluster import hierarchy
    omic = OMIC.parse(X)
    if var_names is None:
      markers = omic.markers or []
      names = set(map(str, self.get_var_names(omic)))
      var_names = [m for m in markers if m in names][:25] or \
          list(self.top_vars(omic, 25))
    _, labels = self._process_omics(group_by)
    vi = self.get_var_indices(omic)
    x = self.numpy(omic)[:, [vi[str(v)] for v in var_names]]
    if log:
      x = np.log1p(x)
    uniq = np.unique(labels)
    cent = np.stack([x[labels == u].mean(0) for u in uniq])
    fig, (ax_d, ax_h) = plt.subplots(
        2, 1, figsize=(max(6, len(var_names) * 0.35), 7),
        gridspec_kw={"height_ratios": [1, 3]}, sharex=False)
    if len(uniq) > 1:
      link = hierarchy.linkage(cent, method="ward")
      dn = hierarchy.dendrogram(link, ax=ax_d, labels=list(uniq),
                                leaf_font_size=7)
      order = dn["leaves"]
    else:
      order = [0]
      ax_d.axis("off")
    ax_d.set_yticks([])
    im = ax_h.imshow(cent[order], aspect="auto", cmap="viridis",
                     interpolation="nearest")
    ax_h.set_xticks(range(len(var_names)))
    ax_h.set_xticklabels([str(v) for v in var_names], rotation=90,
                         fontsize=6)
    ax_h.set_yticks(range(len(uniq)))
    ax_h.set_yticklabels([str(uniq[i]) for i in order], fontsize=7)
    fig.colorbar(im, ax=ax_h)
    fig.tight_layout()
    self.add_figure(f"{omic.name}_dendrogram", fig)
    return self

  def plot_distance_heatmap(self,
                            X=OMIC.transcriptomic,
                            group_by=OMIC.celltype,
                            metric: str = "euclidean") -> "_OMICvisualizer":
    """Group-mean pairwise distance heatmap (ref :plot_distance_heatmap)."""
    import matplotlib.pyplot as plt
    from scipy.spatial.distance import cdist
    omic = OMIC.parse(X)
    _, labels = self._process_omics(group_by)
    x = np.log1p(self.numpy(omic))
    uniq = np.unique(labels)
    centroids = np.stack([x[labels == u].mean(0) for u in uniq])
    dm = cdist(centroids, centroids, metric=metric)
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(dm, cmap="magma")
    ax.set_xticks(range(len(uniq)))
    ax.set_xticklabels(uniq, rotation=45, fontsize=7, ha="right")
    ax.set_yticks(range(len(uniq)))
    ax.set_yticklabels(uniq, fontsize=7)
    fig.colorbar(im, ax=ax)
    self.add_figure(f"{omic.name}_distance_heatmap", fig)
    return self

  def plot_importance_matrix(self, omic1=OMIC.transcriptomic,
                             omic2=OMIC.proteomic) -> "_OMICvisualizer":
    df = self.get_importance_matrix(omic1, omic2)
    self._matrix_fig(df, f"{OMIC.parse(omic1).name}_importance",
                     top_rows=30)
    return self

  def plot_mutual_information(self, omic1=OMIC.transcriptomic,
                              omic2=OMIC.proteomic) -> "_OMICvisualizer":
    df = self.get_mutual_information(omic1, omic2)
    self._matrix_fig(df, f"{OMIC.parse(omic1).name}_mutual_information",
                     top_rows=30)
    return self

  def _corr_matrix_df(self, omic1, omic2, which: str) -> pd.DataFrame:
    omic1, omic2 = OMIC.parse(omic1), OMIC.parse(omic2)
    corr = self.get_correlation(omic1, omic2)
    n1, n2 = self.get_dim(omic1), self.get_dim(omic2)
    m = np.zeros((n1, n2))
    col = 2 if which == "pearson" else 3
    for t in corr:
      m[t[0], t[1]] = t[col]
    return pd.DataFrame(m, index=self.get_var_names(omic1),
                        columns=self.get_var_names(omic2))

  def plot_pearson_matrix(self, omic1=OMIC.transcriptomic,
                          omic2=OMIC.proteomic) -> "_OMICvisualizer":
    df = self._corr_matrix_df(omic1, omic2, "pearson")
    self._matrix_fig(df, f"{OMIC.parse(omic1).name}_pearson", top_rows=30,
                     cmap="coolwarm", center_zero=True)
    return self

  def plot_spearman_matrix(self, omic1=OMIC.transcriptomic,
                           omic2=OMIC.proteomic) -> "_OMICvisualizer":
    df = self._corr_matrix_df(omic1, omic2, "spearman")
    self._matrix_fig(df, f"{OMIC.parse(omic1).name}_spearman", top_rows=30,
                     cmap="coolwarm", center_zero=True)
    return self

  def _matrix_fig(self, df: pd.DataFrame, name: str, top_rows: int = 30,
                  cmap: str = "viridis", center_zero: bool = False):
    import matplotlib.pyplot as plt
    if df.shape[0] > top_rows:  # keep most informative rows
      order = np.argsort(-np.abs(df.values).max(1))[:top_rows]
      df = df.iloc[order]
    fig, ax = plt.subplots(figsize=(max(6, df.shape[1] * 0.4),
                                    max(4, df.shape[0] * 0.25)))
    vmax = np.abs(df.values).max() or 1.0
    kw = dict(vmin=-vmax, vmax=vmax) if center_zero else {}
    im = ax.imshow(df.values, aspect="auto", cmap=cmap, **kw)
    ax.set_xticks(range(df.shape[1]))
    ax.set_xticklabels(df.columns, rotation=90, fontsize=6)
    ax.set_yticks(range(df.shape[0]))
    ax.set_yticklabels(df.index, fontsize=6)
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    self.add_figure(name, fig)

  def plot_correlation_scatter(self,
                               omic1=OMIC.transcriptomic,
                               omic2=OMIC.proteomic,
                               n_pairs: int = 9) -> "_OMICvisualizer":
    """Scatter of the top marker gene↔protein pairs (ref :plot_correlation*)."""
    import matplotlib.pyplot as plt
    omic1, omic2 = OMIC.parse(omic1), OMIC.parse(omic2)
    pairs = self.get_marker_pairs(omic1, omic2)
    vi1, vi2 = self.get_var_indices(omic1), self.get_var_indices(omic2)
    if not pairs:  # fall back to top correlated pairs
      corr = self.get_correlation(omic1, omic2)[:n_pairs]
      names1, names2 = self.get_var_names(omic1), self.get_var_names(omic2)
      pairs = [(str(names1[i]), str(names2[j])) for i, j, _, _ in corr]
    pairs = pairs[:n_pairs]
    x1, x2 = np.log1p(self.numpy(omic1)), np.log1p(self.numpy(omic2))
    ncol = 3
    nrow = int(np.ceil(len(pairs) / ncol))
    fig, axes = plt.subplots(nrow, ncol, figsize=(3.2 * ncol, 3 * nrow),
                             squeeze=False)
    for k, (a, b) in enumerate(pairs):
      ax = axes[k // ncol][k % ncol]
      ax.scatter(x1[:, vi1[a]], x2[:, vi2[b]], s=4, alpha=0.3, linewidths=0)
      ax.set_title(f"{a} vs {b}", fontsize=8)
    fig.tight_layout()
    self.add_figure(f"{omic1.name}_{omic2.name}_corr_scatter", fig)
    return self

  def plot_divergence(self,
                      X=OMIC.transcriptomic,
                      omic=OMIC.proteomic,
                      algo: str = "tsne") -> "_OMICvisualizer":
    """Embedding colored by each protein level (ref :plot_divergence)."""
    import matplotlib.pyplot as plt
    omic_x, omic_c = OMIC.parse(X), OMIC.parse(omic)
    emb = self.dimension_reduce(omic_x, n_components=2, algo=algo)
    y = np.log1p(self.numpy(omic_c))
    names = self.get_var_names(omic_c)
    n = min(9, y.shape[1])
    ncol = 3
    nrow = int(np.ceil(n / ncol))
    fig, axes = plt.subplots(nrow, ncol, figsize=(3.2 * ncol, 3 * nrow),
                             squeeze=False)
    for k in range(n):
      ax = axes[k // ncol][k % ncol]
      sc = ax.scatter(emb[:, 0], emb[:, 1], s=4, c=y[:, k], cmap="inferno",
                      linewidths=0)
      ax.set_title(str(names[k]), fontsize=8)
      ax.set_xticks([]); ax.set_yticks([])
      fig.colorbar(sc, ax=ax)
    fig.tight_layout()
    self.add_figure(f"{omic_x.name}_{omic_c.name}_divergence", fig)
    return self

  def plot_histogram(self, omic=None, bins: int = 80) -> "_OMICvisualizer":
    import matplotlib.pyplot as plt
    omic = self.current_omic if omic is None else OMIC.parse(omic)
    x = self.numpy(omic)
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].hist(x.sum(1), bins=bins)
    axes[0].set_title("library size / cell")
    axes[1].hist(np.log1p(x).ravel()[:200000], bins=bins)
    axes[1].set_title("log1p counts")
    fig.tight_layout()
    self.add_figure(f"{omic.name}_histogram", fig)
    return self

  def plot_percentile_histogram(self, omic=None, n_hist: int = 8,
                                bins: int = 60) -> "_OMICvisualizer":
    """Histogram of vars grouped by expression percentile (ref :plot_perc)."""
    import matplotlib.pyplot as plt
    omic = self.current_omic if omic is None else OMIC.parse(omic)
    x = self.numpy(omic)
    totals = x.sum(0)
    qs = np.percentile(totals, np.linspace(0, 100, n_hist + 1))
    fig, axes = plt.subplots(1, n_hist, figsize=(2.2 * n_hist, 2.4),
                             squeeze=False)
    for i in range(n_hist):
      m = (totals >= qs[i]) & (totals <= qs[i + 1])
      vals = np.log1p(x[:, m]).ravel()
      axes[0][i].hist(vals[:100000], bins=bins)
      axes[0][i].set_title(f"p{int(100*i/n_hist)}-{int(100*(i+1)/n_hist)}",
                           fontsize=7)
      axes[0][i].set_yticks([])
    fig.tight_layout()
    self.add_figure(f"{omic.name}_percentile_histogram", fig)
    return self

  def plot_series(self, omic=None, var_names: Optional[Sequence[str]] = None
                  ) -> "_OMICvisualizer":
    """Sorted expression series of selected vars (ref :plot_series)."""
    import matplotlib.pyplot as plt
    omic = self.current_omic if omic is None else OMIC.parse(omic)
    if var_names is None:
      var_names = list(self.top_vars(omic, 5))
    vi = self.get_var_indices(omic)
    x = self.numpy(omic)
    fig, ax = plt.subplots(figsize=(8, 4))
    for v in var_names:
      ax.plot(np.sort(np.log1p(x[:, vi[str(v)]])), lw=1, label=str(v))
    ax.legend(fontsize=7)
    ax.set_xlabel("cell rank")
    ax.set_ylabel("log1p count")
    fig.tight_layout()
    self.add_figure(f"{omic.name}_series", fig)
    return self
