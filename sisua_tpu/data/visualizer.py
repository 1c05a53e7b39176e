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
    # continuous fallback (incl. proteomic): dominant variable per cell —
    # same resolution the reference reaches via probabilistic embedding on
    # raw protein counts
    return name, np.asarray(var_names)[np.argmax(x, -1)]

  # ------------------------------------------------------------ var helpers
  def _process_varnames(self, omic, var_names, default_n: int = 16):
    """Resolve the reference's ``var_names`` vocabulary
    (``_single_cell_visualizer.py:90-120``): ``'auto'`` → the omic's curated
    markers present in this dataset (top-variance fallback); an int → top-n
    highest-variance vars; ``None`` → markers, else all vars (top-variance
    when wide); a list → filtered to existing names."""
    omic = OMIC.parse(omic)
    names = [str(v) for v in self.get_var_names(omic)]
    name_set = set(names)
    markers = [m for m in (omic.markers or []) if m in name_set]
    if isinstance(var_names, str) and var_names == "auto":
      var_names = markers[:default_n] or list(self.top_vars(omic, default_n))
    elif isinstance(var_names, str):
      # a bare string is ONE variable name — iterating it would match (or
      # silently plot) single-character var names
      assert var_names in name_set, \
          f"var name {var_names!r} not in omic {omic.name}"
      var_names = [var_names]
    elif var_names is None:
      var_names = markers or (names if len(names) <= 50
                              else list(self.top_vars(omic, default_n)))
    elif isinstance(var_names, (int, np.integer)):
      var_names = list(self.top_vars(omic, int(var_names)))
    else:
      var_names = [str(v) for v in var_names if str(v) in name_set]
    assert len(var_names) > 0, f"No valid var_names for omic {omic.name}"
    return omic, list(dict.fromkeys(map(str, var_names)))

  def _resolve_groups(self, group_by, clustering, groups):
    """(key, per-cell labels, shown categories); ``groups`` filters the
    categories shown (ref ``groups=`` argument)."""
    if group_by is None:
      labels = np.full(self.n_obs, "all")
      return None, labels, np.array(["all"])
    key, labels = self._process_omics(group_by, clustering=clustering)
    labels = np.asarray(labels).astype(str)
    uniq = np.unique(labels)
    if groups is not None:
      if isinstance(groups, (str, bytes)):
        groups = [groups]
      want = {str(g) for g in groups}
      uniq = np.array([u for u in uniq if u in want])
      assert len(uniq) > 0, f"None of groups={sorted(want)} found in {key}"
    return key, labels, uniq

  @staticmethod
  def _ranked_var_blocks(x, labels, uniq, n):
    """Per-group top-n discriminative variable columns (Welch t-test
    one-vs-rest) — the selection behind the reference's ``rank_vars>0``
    scanpy ``rank_genes_groups_*`` panels."""
    from scipy import stats as sp_stats
    blocks = []
    for u in uniq:
      in_g = labels == u
      if in_g.sum() < 2 or (~in_g).sum() < 2:
        blocks.append(list(np.argsort(-x[in_g].mean(0))[:n]))
        continue
      score, _ = sp_stats.ttest_ind(x[in_g], x[~in_g], axis=0,
                                    equal_var=False)
      blocks.append(list(np.argsort(-np.nan_to_num(score))[:n]))
    return blocks

  @staticmethod
  def _dendrogram_order(cent):
    """Ward-linkage leaf order over group centroids (scanpy dendrogram)."""
    from scipy.cluster import hierarchy
    if len(cent) < 2:
      return np.arange(len(cent)), None
    link = hierarchy.linkage(cent, method="ward")
    order = hierarchy.dendrogram(link, no_plot=True)["leaves"]
    return np.asarray(order), link

  @staticmethod
  def _fig_desc(title, omic, key, *, nv=None, rank=0, log=True,
                dendrogram=False, swap_axes=False, scale=None, groups=None):
    """Unique figure name from the argument grid (the reference's
    `_validate_arguments` title, extended so no two grid points collide)."""
    parts = [title, omic.name, str(key),
             None if nv is None else f"v{nv}",
             f"rank{rank}" if rank else None,
             "log" if log else "raw",
             "dendro" if dendrogram else None,
             "swap" if swap_axes else None,
             f"scale-{scale}" if scale else None,
             ("g" + "-".join(sorted(map(str, np.atleast_1d(groups)))))
             if groups is not None else None]
    return "_".join(p for p in parts if p)

  @staticmethod
  def _standard_scale(x, mode):
    """scanpy ``standard_scale``: min-max each var ('var') or cell ('obs')."""
    if mode == "var":
      x = x - x.min(0, keepdims=True)
      x = x / np.maximum(x.max(0, keepdims=True), 1e-12)
    elif mode == "obs":
      x = x - x.min(1, keepdims=True)
      x = x / np.maximum(x.max(1, keepdims=True), 1e-12)
    return x

  def _select_vars(self, omic, var_names, rank_vars, full, labels, uniq):
    """Columns + per-group boundaries for the rank-genes panel layout."""
    names = np.asarray([str(v) for v in self.get_var_names(omic)])
    if rank_vars > 0:
      blocks = self._ranked_var_blocks(full, labels, uniq, rank_vars)
      cols, bounds = [], [0]
      for b in blocks:
        cols.extend(b)
        bounds.append(len(cols))
      return list(names[cols]), cols, bounds
    omic, var_list = self._process_varnames(omic, var_names)
    vi = self.get_var_indices(omic)
    return var_list, [vi[v] for v in var_list], None

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
                           groups=None,
                           var_names="auto",
                           clustering: Optional[str] = None,
                           rank_vars: int = 0,
                           rank_genes: int = 0,
                           dendrogram: bool = False,
                           standard_scale: Optional[str] = None,
                           log: bool = True,
                           swap_axes: bool = False,
                           title: str = "",
                           return_figure: bool = False):
    """Violin of vars per label group — the reference's full surface
    (``_single_cell_visualizer.py:249-314``): ``rank_vars>0`` ranks vars per
    group (rank_genes_groups_stacked_violin), ``dendrogram`` orders groups
    by Ward linkage, ``groups`` selects categories, ``standard_scale``
    min-max scales, ``swap_axes`` swaps var/group roles."""
    import matplotlib.pyplot as plt
    import seaborn as sns
    rank_vars = max(int(rank_vars), int(rank_genes))
    omic = OMIC.parse(X)
    key, labels, uniq = self._resolve_groups(group_by, clustering, groups)
    full = self.numpy(omic)
    if log:
      full = np.log1p(full)
    if dendrogram and len(uniq) > 1:
      cent = np.stack([full[labels == u].mean(0) for u in uniq])
      order, _ = self._dendrogram_order(cent)
      uniq = uniq[order]
    var_list, cols, _ = self._select_vars(omic, var_names, rank_vars, full,
                                          labels, uniq)
    keep = np.isin(labels, uniq)
    x = self._standard_scale(full[keep][:, cols], standard_scale)
    df = pd.DataFrame(x, columns=pd.Index(var_list).astype(str))
    # duplicated rank columns across groups collapse in the frame; keep first
    df = df.loc[:, ~df.columns.duplicated()]
    df["group"] = pd.Categorical(labels[keep], categories=list(uniq))
    melt = df.melt(id_vars="group", var_name="var", value_name="value")
    xvar, hue = ("group", "var") if swap_axes else ("var", "group")
    fig, ax = plt.subplots(figsize=(max(8, len(var_list)), 5))
    sns.violinplot(data=melt, x=xvar, y="value", hue=hue, ax=ax,
                   cut=0, linewidth=0.4, density_norm="width")
    ax.legend(fontsize=6)
    ax.tick_params(axis="x", rotation=45)
    desc = self._fig_desc(title, omic, key, nv=len(var_list), rank=rank_vars,
                          log=log, dendrogram=dendrogram,
                          swap_axes=swap_axes, scale=standard_scale,
                          groups=groups)
    ax.set_title(desc, fontsize=9)
    if return_figure:
      return fig
    self.add_figure(f"violin_{desc}", fig)
    return self

  def plot_dotplot(self,
                   X=OMIC.transcriptomic,
                   group_by=OMIC.celltype,
                   groups=None,
                   var_names="auto",
                   clustering: Optional[str] = None,
                   rank_genes: int = 0,
                   rank_vars: int = 0,
                   dendrogram: bool = False,
                   standard_scale: Optional[str] = "var",
                   cmap: str = "Reds",
                   log: bool = True,
                   title: str = "",
                   return_figure: bool = False):
    """Dot plot: dot size = fraction of group expressing, color = (scaled)
    mean expression — the reference's full surface
    (``_single_cell_visualizer.py:315-353``) incl. the
    rank_genes_groups_dotplot panel (``rank_genes>0``, per-group separators)
    and Ward-dendrogram group ordering drawn in a side panel."""
    import matplotlib.pyplot as plt
    from scipy.cluster import hierarchy
    rank_vars = max(int(rank_vars), int(rank_genes))
    omic = OMIC.parse(X)
    key, labels, uniq = self._resolve_groups(group_by, clustering, groups)
    full = self.numpy(omic)
    logged = np.log1p(full) if log else full
    link = None
    if dendrogram and len(uniq) > 1:
      cent = np.stack([logged[labels == u].mean(0) for u in uniq])
      order, link = self._dendrogram_order(cent)
      uniq = uniq[order]
    var_list, cols, bounds = self._select_vars(omic, var_names, rank_vars,
                                               logged, labels, uniq)
    mean = np.stack([logged[labels == u][:, cols].mean(0) for u in uniq])
    frac = np.stack([(full[labels == u][:, cols] > 0).mean(0) for u in uniq])
    mean = self._standard_scale(mean, standard_scale)
    nv, ng = len(var_list), len(uniq)
    fig = plt.figure(figsize=(max(6, nv * 0.6) + (1.2 if link is not None
                                                  else 0), max(4, ng * 0.4)))
    if link is not None:
      gs = fig.add_gridspec(1, 2, width_ratios=[5, 1], wspace=0.05)
      ax = fig.add_subplot(gs[0])
      ax_d = fig.add_subplot(gs[1], sharey=None)
      with plt.rc_context({"lines.linewidth": 0.8}):
        hierarchy.dendrogram(link, ax=ax_d, orientation="right",
                             no_labels=True, link_color_func=lambda _: "k")
      ax_d.axis("off")
    else:
      ax = fig.add_subplot(111)
    gi, vj = np.meshgrid(np.arange(ng), np.arange(nv), indexing="ij")
    sc = ax.scatter(vj.ravel(), gi.ravel(), s=20 + 180 * frac.ravel(),
                    c=mean.ravel(), cmap=cmap)
    if bounds is not None:  # rank-genes panel: separate per-group blocks
      for b in bounds[1:-1]:
        ax.axvline(b - 0.5, color="0.7", lw=0.8)
    ax.set_xticks(range(nv))
    ax.set_xticklabels([str(v) for v in var_list], rotation=45, fontsize=7,
                       ha="right")
    ax.set_yticks(range(ng))
    ax.set_yticklabels([str(u) for u in uniq], fontsize=7)
    fig.colorbar(sc, ax=ax, label="mean expression"
                 + (" (scaled)" if standard_scale else ""))
    desc = self._fig_desc(title, omic, key, nv=nv, rank=rank_vars, log=log,
                          dendrogram=dendrogram, scale=standard_scale,
                          groups=groups)
    ax.set_title(desc, fontsize=9)
    if return_figure:
      return fig
    self.add_figure(f"dotplot_{desc}", fig)
    return self

  def plot_heatmap(self,
                   X=OMIC.transcriptomic,
                   group_by=OMIC.celltype,
                   groups=None,
                   var_names="auto",
                   clustering: Optional[str] = None,
                   rank_vars: int = 0,
                   rank_genes: int = 0,
                   dendrogram: bool = False,
                   swap_axes: bool = False,
                   cmap: str = "viridis",
                   standard_scale: Optional[str] = "var",
                   log: bool = True,
                   title: str = "",
                   return_figure: bool = False):
    """Cells×vars heatmap grouped by labels — the reference's full surface
    (``_single_cell_visualizer.py:354-422``): ``rank_vars>0`` renders the
    rank_genes_groups_heatmap panel (per-group top discriminative vars with
    block separators), ``dendrogram`` orders groups by Ward linkage (drawn
    in a side panel), ``groups`` selects categories, plus
    ``standard_scale``/``swap_axes``/``cmap``/``return_figure``."""
    import matplotlib.pyplot as plt
    from scipy.cluster import hierarchy
    rank_vars = max(int(rank_vars), int(rank_genes))
    omic = OMIC.parse(X)
    key, labels, uniq = self._resolve_groups(group_by, clustering, groups)
    full = self.numpy(omic)
    if log:
      full = np.log1p(full)
    link = None
    if dendrogram and len(uniq) > 1:
      cent = np.stack([full[labels == u].mean(0) for u in uniq])
      order, link = self._dendrogram_order(cent)
      uniq = uniq[order]
    var_list, cols, bounds = self._select_vars(omic, var_names, rank_vars,
                                               full, labels, uniq)
    x = self._standard_scale(full[:, cols], standard_scale)
    # cells sorted into group blocks in display order
    sel = np.concatenate([np.where(labels == u)[0] for u in uniq])
    x = x[sel]
    sizes = [int(np.sum(labels == u)) for u in uniq]
    row_bounds = np.cumsum(sizes)
    centers = row_bounds - np.asarray(sizes) / 2.0
    nv = len(var_list)
    fig = plt.figure(figsize=((10, 7) if swap_axes else
                              (max(8, nv * 0.3), 7)))
    if link is not None:
      if swap_axes:
        # groups live on the x axis: the tree goes ON TOP, leaves[0] at the
        # left matching the first column block
        gs = fig.add_gridspec(2, 1, height_ratios=[1, 5], hspace=0.05)
        ax_d = fig.add_subplot(gs[0])
        ax = fig.add_subplot(gs[1])
        orientation = "top"
      else:
        gs = fig.add_gridspec(1, 2, width_ratios=[5, 1], wspace=0.05)
        ax = fig.add_subplot(gs[0])
        ax_d = fig.add_subplot(gs[1])
        orientation = "right"
      with plt.rc_context({"lines.linewidth": 0.8}):
        hierarchy.dendrogram(link, ax=ax_d, orientation=orientation,
                             no_labels=True, link_color_func=lambda _: "k")
      if not swap_axes:
        # scipy puts leaves[0] at the BOTTOM for orientation='right' while
        # imshow draws row 0 at the TOP — invert so the tree follows the
        # group blocks instead of mirroring them
        ax_d.invert_yaxis()
      ax_d.axis("off")
    else:
      ax = fig.add_subplot(111)
    im = ax.imshow(x.T if swap_axes else x, aspect="auto", cmap=cmap,
                   interpolation="nearest")
    var_axis, group_axis = ("y", "x") if swap_axes else ("x", "y")
    # variable labels (only readable below ~50 names, as the reference)
    var_ticks = (range(nv), [str(v) for v in var_list]) if nv < 50 \
        else ([], [])
    getattr(ax, f"set_{var_axis}ticks")(var_ticks[0])
    getattr(ax, f"set_{var_axis}ticklabels")(
        var_ticks[1], fontsize=6,
        **({"rotation": 90} if var_axis == "x" else {}))
    # group blocks: labels at block centers, separators at boundaries
    getattr(ax, f"set_{group_axis}ticks")(centers)
    getattr(ax, f"set_{group_axis}ticklabels")(
        [str(u) for u in uniq], fontsize=7,
        **({"rotation": 45} if group_axis == "x" else {}))
    sep = ax.axvline if swap_axes else ax.axhline
    for b in row_bounds[:-1]:
      sep(b - 0.5, color="w", lw=1.0)
    if bounds is not None:  # rank-vars panel: per-group var-block separators
      vsep = ax.axhline if swap_axes else ax.axvline
      for b in bounds[1:-1]:
        vsep(b - 0.5, color="w", lw=0.8)
    fig.colorbar(im, ax=ax)
    desc = self._fig_desc(title, omic, key, nv=nv, rank=rank_vars, log=log,
                          dendrogram=dendrogram, swap_axes=swap_axes,
                          scale=standard_scale, groups=groups)
    ax.set_title(desc, fontsize=9)
    if return_figure:
      return fig
    self.add_figure(f"heatmap_{desc}", fig)
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
    # subsample FIRST (uniformly, not a first-cells prefix), then log1p —
    # transforming the full matrix to plot 200k values wastes a full-size
    # temporary and biases the sample toward the leading cells
    flat = x.reshape(-1)
    if flat.size > 200000:
      rng = np.random.default_rng(0)
      flat = flat[rng.choice(flat.size, 200000, replace=False)]
    axes[1].hist(np.log1p(flat), bins=bins)
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
