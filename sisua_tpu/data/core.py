"""_OMICbase — the multi-omic single-cell container (anndata-free).

The reference's ``SingleCellOMIC`` is an ``anndata.AnnData`` subclass
(``/root/reference/sisua/data/_single_cell_base.py``). anndata is not part of
this environment, and the TPU framework only needs the container *behavior*,
so this is a clean-room numpy/pandas implementation of the same API surface:

  * N omics stored per name (dense ndarray or scipy CSR), each with its own
    var table; one *current* omic exposed as ``.X``/``.var`` (reference
    ``_single_cell_base.py:74-255``);
  * per-omic statistics ``[<omic>_total, <omic>_log_counts, <omic>_local_mean,
    <omic>_local_var]`` in ``.obs`` (``_calculate_statistics``, :223-239);
  * provenance: every mutating call is recorded in ``._history`` and shown in
    ``__repr__`` (:173-187, 604-617);
  * row slicing / ``apply_indices`` across all omics (:241-290);
  * MD5-based equality (:647-663);
  * ``get_rv`` default likelihood per omic kind (:518-537);
  * ``create_dataset`` → TPU feeder (see ``feeder.py``), replacing tf.data
    (:539-602).
"""

from __future__ import annotations

import hashlib
from numbers import Number
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import pandas as pd
from scipy import sparse

from ..rv import RVmeta
from .const import OMIC
from .utils import get_library_size, is_binary_dtype, is_categorical_dtype

__all__ = ["_OMICbase", "get_all_omics"]


def _as_matrix(X):
  if sparse.issparse(X):
    return X.tocsr().astype(np.float32)
  X = np.asarray(X)
  if X.ndim == 1:
    X = X[:, None]
  return np.ascontiguousarray(X, dtype=np.float32)


def get_all_omics(sco: "_OMICbase") -> List[OMIC]:
  return [OMIC.parse(n) for n in sco.omics]


class _OMICbase:
  """Multi-omic container base (see module docstring)."""

  def __init__(self,
               X,
               cell_id: Optional[Sequence[str]] = None,
               gene_id: Optional[Sequence[str]] = None,
               omic: Union[str, OMIC] = OMIC.transcriptomic,
               name: Optional[str] = None,
               duplicated_var: bool = False,
               **kwargs):
    omic = OMIC.parse(omic)
    X = _as_matrix(X)
    n = X.shape[0]
    if cell_id is None:
      cell_id = [f"Cell#{i}" for i in range(n)]
    self.obs = pd.DataFrame(index=pd.Index(np.asarray(cell_id, str),
                                           name="cell_id"))
    self._omics: Dict[str, Union[np.ndarray, sparse.csr_matrix]] = {}
    self._vars: Dict[str, pd.DataFrame] = {}
    self.uns: Dict = {}
    self.obsm: Dict[str, np.ndarray] = {}  # extra per-cell matrices (pca, …)
    self._history: List[Tuple[str, dict]] = []
    self._name = name or "scOMIC"
    self._current_omic = omic
    self._duplicated_var = duplicated_var
    self._verbose = False
    # original row indices — survive slicing/split so a partition can be
    # traced back to the source rows (ref _single_cell_base.py:134,301-306)
    self.obs["indices"] = np.arange(n, dtype=np.int64)
    self.add_omic(omic, X, gene_id)

  # ------------------------------------------------------------------ history
  def _record(self, name: str, local_vars: dict):
    kw = {k: v for k, v in local_vars.items()
          if k not in ("self", "__class__") and isinstance(
              v, (Number, str, bool, type(None), tuple))}
    self._history.append((name, kw))

  @property
  def history(self):
    return list(self._history)

  def set_verbose(self, verbose) -> "_OMICbase":
    """If True, analysis methods narrate their calls (ref :137-144)."""
    self._verbose = bool(verbose)
    return self

  @property
  def verbose(self) -> bool:
    return getattr(self, "_verbose", False)

  # ------------------------------------------------------------------- omics
  @property
  def name(self) -> str:
    return self._name

  @property
  def current_omic(self) -> OMIC:
    return self._current_omic

  @property
  def omics(self) -> List[str]:
    return list(self._omics.keys())

  @property
  def n_omics(self) -> int:
    return len(self._omics)

  @property
  def n_obs(self) -> int:
    return self.obs.shape[0]

  @property
  def n_vars(self) -> int:
    return self._omics[self._current_omic.name].shape[1]

  @property
  def shape(self) -> Tuple[int, int]:
    return (self.n_obs, self.n_vars)

  @property
  def X(self):
    return self._omics[self._current_omic.name]

  @X.setter
  def X(self, value):
    value = _as_matrix(value)
    assert value.shape == self.X.shape, "Cannot change shape via .X"
    self._omics[self._current_omic.name] = value
    # keep the per-omic obs statistics (totals, library-size prior) in sync —
    # set_omic refreshes them, so the shorthand assignment must too
    self._calculate_statistics(self._current_omic)
    inv = getattr(self, "_invalidate_analysis_caches", None)
    if inv is not None:  # derived caches reflect the replaced values
      inv(self._current_omic.name)

  @property
  def var(self) -> pd.DataFrame:
    return self._vars[self._current_omic.name]

  @property
  def var_names(self) -> pd.Index:
    return self.var.index

  @property
  def obs_names(self) -> pd.Index:
    return self.obs.index

  def add_omic(self, omic, X, var_names: Optional[Sequence[str]] = None):
    """Register a new omic matrix + var table + statistics (ref :189-209)."""
    omic = OMIC.parse(omic)
    X = _as_matrix(X)
    assert X.shape[0] == self.n_obs or self.n_obs == 0, \
        f"Omic {omic.name} has {X.shape[0]} cells, container has {self.n_obs}"
    if var_names is not None:
      var_names = np.asarray(var_names, str)
      assert len(var_names) == X.shape[1]
      if not self._duplicated_var and len(set(var_names)) != len(var_names):
        # make unique by suffixing duplicates
        var_names = pd.Index(var_names)
        var_names = pd.Index(
            pd.io.common.dedup_names(var_names, is_potential_multiindex=False))
    else:
      var_names = pd.Index([f"{omic.name}{i}" for i in range(X.shape[1])])
    self._omics[omic.name] = X
    self._vars[omic.name] = pd.DataFrame(index=pd.Index(var_names, name="var"))
    self._calculate_statistics(omic)
    self._record("add_omic", dict(omic=omic.name, shape=tuple(X.shape)))
    return self

  def set_omic(self, omic, X=None,
               recalculate_statistics: bool = True) -> "_OMICbase":
    """With ``X`` given, replace the stored matrix of an omic in place
    (the reference's ``set_omic``, :370-392: shape must match, statistics
    refreshed). Without ``X``, switch the current omic (the in-place form
    of the reference's ``_swap_omic``)."""
    omic = OMIC.parse(omic)
    assert omic.name in self._omics, f"No omic {omic.name} in {self.omics}"
    if X is not None:
      X = _as_matrix(X)
      old = self._omics[omic.name]
      assert X.shape == old.shape, \
          (f"Dimensions mismatch, {omic.name} has dim={old.shape} "
           f"but given: {X.shape}")
      self._omics[omic.name] = X
      if recalculate_statistics:
        self._calculate_statistics(omic)
      self._record("set_omic", dict(omic=omic.name, shape=tuple(X.shape)))
    else:
      self._current_omic = omic
    return self

  def _swap_omic(self, omic) -> "_OMICbase":
    """Return a shallow view of self with another current omic (ref usage in
    tests/test_datasets.py:158-173)."""
    omic = OMIC.parse(omic)
    new = self.copy()
    new.set_omic(omic)
    return new

  def get_omic(self, omic=None):
    omic = self._current_omic if omic is None else OMIC.parse(omic)
    return self._omics[omic.name]

  def numpy(self, omic=None) -> np.ndarray:
    """Dense float32 matrix of an omic (ref :393-410)."""
    x = self.get_omic(omic)
    if sparse.issparse(x):
      x = np.asarray(x.todense())
    return np.asarray(x, dtype=np.float32)

  def get_var(self, omic=None) -> pd.DataFrame:
    omic = self._current_omic if omic is None else OMIC.parse(omic)
    return self._vars[omic.name]

  def get_var_indices(self, omic=None) -> Dict[str, int]:
    v = self.get_var(omic)
    return {name: i for i, name in enumerate(v.index)}

  def get_var_names(self, omic=None) -> np.ndarray:
    return self.get_var(omic).index.values

  def get_dim(self, omic=None) -> int:
    return self.get_omic(omic).shape[1]

  # --------------------------------------------------------------- statistics
  def _calculate_statistics(self, omic=None):
    omic = self._current_omic if omic is None else OMIC.parse(omic)
    x = self._omics[omic.name]
    total = np.asarray(x.sum(axis=1)).ravel()
    if total.min() < 0:  # non-count omic (e.g. latent means): stats on |x|
      import warnings as _w
      with _w.catch_warnings():
        _w.simplefilter("ignore")
        log_counts, local_mean, local_var = get_library_size(
            np.abs(x.todense() if sparse.issparse(x) else x),
            return_log_count=True)
    else:
      log_counts, local_mean, local_var = get_library_size(
          x, return_log_count=True)
    self.obs[f"{omic.name}_total"] = total.astype(np.float32)
    self.obs[f"{omic.name}_log_counts"] = log_counts.ravel()
    self.obs[f"{omic.name}_local_mean"] = local_mean.ravel()
    self.obs[f"{omic.name}_local_var"] = local_var.ravel()

  def get_library_size(self, omic=None) -> np.ndarray:
    """(n_cells, 2) array of [local_mean, local_var] — the scVI library
    prior parameters fed to the model (ref :539-602 'library')."""
    omic = self._current_omic if omic is None else OMIC.parse(omic)
    mean = self.obs[f"{omic.name}_local_mean"].values[:, None]
    var = self.obs[f"{omic.name}_local_var"].values[:, None]
    return np.concatenate([mean, var], axis=1).astype(np.float32)

  def stats(self, omic=None) -> Dict[str, np.ndarray]:
    omic = self._current_omic if omic is None else OMIC.parse(omic)
    return {k: self.obs[f"{omic.name}_{k}"].values
            for k in ("total", "log_counts", "local_mean", "local_var")}

  # ------------------------------------------------- per-stat accessors
  # the reference exposes each statistics column as an (n_cells, 1) array
  # (``_single_cell_base.py:483-516``); same surface here, read from obs
  def _stat_column(self, omic, key) -> np.ndarray:
    omic = self._current_omic if omic is None else OMIC.parse(omic)
    return self.obs[f"{omic.name}_{key}"].values[:, None].astype(np.float32)

  def total_counts(self, omic=None) -> np.ndarray:
    return self._stat_column(omic, "total")

  def log_counts(self, omic=None) -> np.ndarray:
    return self._stat_column(omic, "log_counts")

  def local_mean(self, omic=None) -> np.ndarray:
    return self._stat_column(omic, "local_mean")

  def local_var(self, omic=None) -> np.ndarray:
    return self._stat_column(omic, "local_var")

  def library_size(self, omic=None) -> Tuple[np.ndarray, np.ndarray]:
    """``(local_mean, local_var)`` of the log library size — the tuple form
    of :meth:`get_library_size` (ref :477-496)."""
    return self.local_mean(omic), self.local_var(omic)

  def sparsity(self, omic=None) -> float:
    """Fraction of zero entries in an omic matrix (ref :496-498)."""
    x = self.get_omic(omic)
    nnz = x.nnz if sparse.issparse(x) else np.count_nonzero(x)
    return 1.0 - nnz / (x.shape[0] * x.shape[1])

  def counts_per_cell(self, omic=None) -> np.ndarray:
    """Total counts per cell (ref :499-507)."""
    return np.asarray(self.get_omic(omic).sum(axis=1)).ravel()

  def counts_per_gene(self, omic=None) -> np.ndarray:
    """Total counts per variable (ref :508-517)."""
    return np.asarray(self.get_omic(omic).sum(axis=0)).ravel()

  # ------------------------------------------------------- id accessors
  @property
  def indices(self) -> np.ndarray:
    """Original row numbers of these cells in the source dataset; tracks
    partitions through ``split``/slicing (ref :301-306)."""
    return self.obs["indices"].values

  @property
  def cell_id(self) -> pd.Index:
    return self.obs.index

  @property
  def gene_id(self) -> pd.Index:
    return self.var.index

  @property
  def marker_genes(self) -> List[str]:
    """Var names of the current omic found in the marker knowledge base
    (ref :316-323)."""
    from .const import MARKER_GENES
    known = {g.lower() for g in MARKER_GENES}
    return [g for g in self.gene_id if g.lower() in known]

  def get_n_var(self, omic=None) -> int:
    return self.get_var(omic).shape[0]

  def get_current_omic(self) -> OMIC:
    return self._current_omic

  @property
  def dtype(self):
    return self.X.dtype

  def is_binary(self, omic=None) -> bool:
    return is_binary_dtype(self.get_omic(omic))

  def is_categorical(self, omic=None) -> bool:
    return is_categorical_dtype(self.get_omic(omic))

  # ------------------------------------------------------------- labels
  def get_labels_name(self, omic=OMIC.proteomic) -> str:
    omic = OMIC.parse(omic)
    return f"{omic.name}_labels"

  def labels(self, omic=OMIC.proteomic) -> pd.Series:
    """Per-cell label names for a label-like omic: the cached
    ``<omic>_labels`` obs column if present, else derived as the argmax
    variable name and cached (ref :412-420; the reference's loaders
    pre-populate the column, here it is derived on demand)."""
    omic = OMIC.parse(omic)
    name = self.get_labels_name(omic)
    if name not in self.obs:
      assert omic.name in self._omics, \
          f"No omic {omic.name} in {self.omics}"
      ids = np.argmax(self.numpy(omic), axis=1)
      self.obs[name] = self.get_var_names(omic)[ids]
    return self.obs[name]

  def describe(self) -> str:
    """Multi-line text summary of every omic (ref :619-646)."""
    def _five(v):
      v = np.asarray(v, np.float64).ravel()
      if v.size == 0:
        return "(empty)"
      return (f"min:{v.min():.2f} q1:{np.percentile(v, 25):.2f} "
              f"med:{np.median(v):.2f} q3:{np.percentile(v, 75):.2f} "
              f"max:{v.max():.2f} mean:{v.mean():.2f}")
    pad = "\n     "
    text = f"SingleCellOMICs: {self.name}"
    for omic in self.omics:
      x = self.get_omic(omic)
      nz = x.data if sparse.issparse(x) else np.asarray(x)[np.nonzero(x)]
      kind = "binary" if self.is_binary(omic) else "continuous"
      text += f"\n  OMIC: '{omic}' - dtype: '{kind}'"
      text += pad + f"Sparsity  : {self.sparsity(omic):.2f}"
      text += pad + f"Nonzeros  : {_five(nz)}"
      text += pad + f"Cell      : {_five(self.counts_per_cell(omic))}"
      text += pad + f"Gene      : {_five(self.counts_per_gene(omic))}"
      text += pad + f"LogCount  : {_five(self.log_counts(omic))}"
      text += pad + f"LocalMean : {_five(self.local_mean(omic))}"
      text += pad + f"LocalVar  : {_five(self.local_var(omic))}"
    return text

  # ---------------------------------------------------------------- defaults
  def get_rv(self, omic=None) -> RVmeta:
    """Default likelihood per omic kind (ref :518-537): counts → 'zinb',
    proteins → 'nb', labels → 'onehot'."""
    omic = self._current_omic if omic is None else OMIC.parse(omic)
    name = omic.name
    dim = self.get_dim(omic)
    if name in ("transcriptomic", "atac", "genomic",
                "itranscriptomic", "iatac", "igenomic"):
      posterior = "zinb"
    elif name in ("proteomic", "iproteomic", "pmhc", "ipmhc"):
      posterior = "nb"
    elif name in ("celltype", "disease", "progenitor", "tissue",
                  "icelltype", "idisease", "iprogenitor", "itissue"):
      posterior = "onehot"
    else:
      posterior = "diag"
    x = self._omics[name]
    if posterior == "nb" and is_categorical_dtype(x):
      posterior = "onehot"
    elif posterior in ("zinb", "nb") and is_binary_dtype(x):
      posterior = "bernoulli"
    return RVmeta(dim, posterior, True, name)

  create_rv = get_rv  # reference alias

  # ------------------------------------------------------------------ slicing
  def __getitem__(self, index) -> "_OMICbase":
    """Row (cell) slicing across all omics; returns a copy."""
    if isinstance(index, (int, np.integer)):
      index = [int(index)]
    new = self.__class__.__new__(self.__class__)
    new.obs = self.obs.iloc[index].copy()
    new._omics = {k: v[index] for k, v in self._omics.items()}
    new._vars = {k: v.copy() for k, v in self._vars.items()}
    new.uns = dict(self.uns)
    new.obsm = {k: v[index] for k, v in self.obsm.items()}
    new._history = list(self._history)
    new._name = self._name
    new._current_omic = self._current_omic
    new._duplicated_var = self._duplicated_var
    new._verbose = self.verbose
    return new

  def apply_indices(self, indices, observation: bool = True) -> "_OMICbase":
    """In-place row (or current-omic column) selection (ref :263-290)."""
    indices = np.asarray(indices)
    if indices.dtype == bool:
      indices = np.nonzero(indices)[0]
    inv = getattr(self, "_invalidate_analysis_caches", None)
    if observation:
      self.obs = self.obs.iloc[indices]
      self._omics = {k: v[indices] for k, v in self._omics.items()}
      self.obsm = {k: v[indices] for k, v in self.obsm.items()}
      if inv is not None:  # population-level tables/graphs are now stale;
        inv(rows_only=True)  # sliced per-cell artifacts stay valid
    else:
      name = self._current_omic.name
      self._omics[name] = self._omics[name][:, indices]
      self._vars[name] = self._vars[name].iloc[indices]
      self._calculate_statistics(self._current_omic)
      if inv is not None:  # var-indexed caches now index removed columns
        inv(name)
    self._record("apply_indices",
                 dict(n=int(len(indices)), observation=observation))
    return self

  # ------------------------------------------------------------------- equal
  def _md5(self) -> str:
    h = hashlib.md5()
    for k in sorted(self._omics):
      x = self._omics[k]
      if sparse.issparse(x):
        h.update(x.indptr.tobytes())
        h.update(x.indices.tobytes())
        h.update(np.ascontiguousarray(x.data).tobytes())
      else:
        h.update(np.ascontiguousarray(x).tobytes())
    return h.hexdigest()

  @property
  def md5(self) -> str:
    return self._md5()

  def __eq__(self, other) -> bool:
    return isinstance(other, _OMICbase) and self._md5() == other._md5()

  def __hash__(self):
    return id(self)

  # -------------------------------------------------------------------- misc
  def copy(self) -> "_OMICbase":
    return self[np.arange(self.n_obs)]

  def assert_matching_cells(self, other: "_OMICbase") -> "_OMICbase":
    assert self.n_obs == other.n_obs, \
        f"Cell mismatch: {self.n_obs} vs {other.n_obs}"
    return self

  def __repr__(self):
    lines = [f"SingleCellOMIC '{self._name}' cells={self.n_obs} "
             f"current={self._current_omic.name}"]
    for k, v in self._omics.items():
      kind = "sparse" if sparse.issparse(v) else "dense"
      lines.append(f"  omic {k}: {v.shape} ({kind})")
    if self._history:
      lines.append("  history:")
      for (fn, kw) in self._history[-8:]:
        lines.append(f"    {fn}({', '.join(f'{a}={b}' for a, b in kw.items())})")
    return "\n".join(lines)

  # ------------------------------------------------------------- data feeder
  def create_dataset(self,
                     omics=None,
                     labels_percent: float = 0.0,
                     batch_size: int = 64,
                     drop_remainder: bool = True,
                     shuffle: int = 1000,
                     seed: int = 1,
                     framework: str = "numpy",
                     extra_matrices=None,
                     **kwargs):
    """Batch feeder emitting ``{'inputs': [...], 'library': ..., 'mask': ...}``
    — the reference's tf.data pipeline (``_single_cell_base.py:539-602``)
    re-designed as a host-side CSR→dense streaming iterator (see feeder.py).
    """
    from .feeder import DataFeeder
    if omics is None:
      omics = [self._current_omic]
    elif isinstance(omics, (str, OMIC)):
      omics = [o for o in OMIC.parse(omics)]
    omics = [OMIC.parse(o) for o in omics]
    mats = [self.get_omic(o) for o in omics]
    if extra_matrices:
      # cell-aligned side inputs that are not omics (e.g. the batch
      # one-hot for covariate conditioning) ride as additional sources
      for m in extra_matrices:
        assert m.shape[0] == self.n_obs, "extra matrix must align on cells"
      # sparse side inputs stay CSR (the feeder gathers CSR natively);
      # np.asarray on a scipy matrix would raise an opaque ValueError
      mats = mats + [m.tocsr().astype(np.float32) if sparse.issparse(m)
                     else np.asarray(m, np.float32) for m in extra_matrices]
    library = self.get_library_size(omics[0])
    self._record("create_dataset",
                 dict(omics=tuple(o.name for o in omics),
                      labels_percent=float(labels_percent),
                      batch_size=batch_size))
    return DataFeeder(mats, library=library,
                      labels_percent=labels_percent, batch_size=batch_size,
                      drop_remainder=drop_remainder, shuffle=shuffle,
                      seed=seed, **kwargs)
