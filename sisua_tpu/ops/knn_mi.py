"""Device-accelerated Kraskov kNN mutual information (estimator #1).

TPU-native replacement for the per-column sklearn ``mutual_info_regression``
loop behind the analysis layer's MI matrix (reference
``/root/reference/sisua/data/_single_cell_analysis.py:1147-1196``, which
fanned sklearn calls over an odin-MPI process pool). On an accelerator the
whole (gene × protein) matrix is a batched dense computation:

  * chebyshev distances in the joint (x, y) space are an O(N²) pairwise
    broadcast — large, regular, and XLA-fusible, unlike the host KD-tree;
  * the k-th neighbor radius is a ``lax.top_k`` over the pair axis;
  * the marginal neighborhood counts are masked reductions of the same
    distance tiles, so everything stays in registers/VMEM.

Estimator semantics follow sklearn's ``_compute_mi_cc`` exactly (scale
columns by std, jitter to break count ties, radius = distance to the k-th
non-self neighbor, strict-inequality marginal counts excluding self,
``ψ(N) + ψ(k) − mean ψ(nx+1) − mean ψ(ny+1)``, clipped at 0). Two deliberate
deviations, both float32-driven: the tie-breaking jitter amplitude is 1e-5
(sklearn's 1e-10 vanishes below float32 eps), and distances are computed in
float32 — so results agree with sklearn to estimator noise (~1e-2 nats),
not bitwise. The host sklearn path stays the default where bit-stability
against the reference matters.

Memory model (scale safety): the pairwise tile is blocked on BOTH the
gene axis (``chunk`` columns of X per dispatch) and the query-cell axis
(``qblock`` rows per dispatch), so device memory is bounded by
``~4 × chunk × qblock × N`` float32 buffers regardless of cell count —
the full (N, N) distance matrix is never materialized. Per-query digamma
terms are partial-summed on device and finalized on host, which is exact
(the Kraskov statistic is a mean over cells). For atlas-scale N the O(N²)
*work* still grows quadratically, so ``max_cells`` offers seeded
subsampling; the analysis-layer entry point exposes it.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import numpy as np

__all__ = ["knn_mutual_information"]


@lru_cache(maxsize=8)
def _build_kernel(n_samples: int, k: int, qblock: int):
  import jax
  import jax.numpy as jnp
  from jax.scipy.special import digamma

  @jax.jit
  def _mi_block(xc, ys, qlo):
    """Partial digamma sums for one gene-chunk × query-block tile.

    xc: (C, N) scaled gene columns; ys: (P, N) scaled protein columns;
    qlo: scalar int32, first query-cell index of this block.
    Returns (sx, sy): each (P, C), the sums over this block's valid query
    rows of ψ(nx+1) and ψ(ny+1). One device dispatch covers a whole tile
    × ALL proteins: the dominant (C, Q, N) gene-distance tile is computed
    once and reused across proteins via ``lax.map`` (remote-attached chips
    pay a full RPC round trip per dispatch — per-(chunk, protein) kernels
    spent more wall-clock on tunnel latency than on compute)."""
    n = n_samples
    qidx = qlo + jnp.arange(qblock)                            # (Q,)
    valid = (qidx < n).astype(xc.dtype)                        # (Q,)
    qc = jnp.minimum(qidx, n - 1)                              # clamp pads
    xq = xc[:, qc]                                             # (C, Q)
    dx = jnp.abs(xq[:, :, None] - xc[:, None, :])              # (C, Q, N)
    # Self-exclusion without the 0*inf product (IEEE 0*inf = NaN; the old
    # ``eye * inf`` only worked via jit constant folding).
    self_mask = qidx[:, None] == jnp.arange(n)[None, :]        # (Q, N)
    penalty = jnp.where(self_mask, jnp.inf, 0.0).astype(xc.dtype)

    def one_protein(y):
      yq = y[qc]                                               # (Q,)
      dy = jnp.abs(yq[:, None] - y[None, :])                   # (Q, N)
      d = jnp.maximum(dx, dy[None]) + penalty[None]            # self excluded
      kth = -jax.lax.top_k(-d, k)[0][..., -1]                  # (C, Q)
      r = kth[..., None]
      # sklearn: radius = nextafter(kth, 0) then query_radius(dist <= r),
      # count includes the query point itself, minus one afterwards — i.e.
      # strictly-closer-than-kth over all points, self included, minus 1.
      nx = jnp.sum(dx < r, axis=-1) - 1.0
      ny = jnp.sum(dy[None] < r, axis=-1) - 1.0
      sx = jnp.sum(digamma(nx + 1.0) * valid, axis=-1)         # (C,)
      sy = jnp.sum(digamma(ny + 1.0) * valid, axis=-1)
      return sx, sy

    return jax.lax.map(one_protein, ys)                        # 2 × (P, C)

  return _mi_block


def knn_mutual_information(X: np.ndarray,
                           Y: np.ndarray,
                           n_neighbors: int = 3,
                           random_state: int = 8,
                           noise: float = 1e-5,
                           chunk: Optional[int] = None,
                           qblock: Optional[int] = None,
                           max_cells: Optional[int] = None,
                           mem_budget_bytes: int = 2 << 30) -> np.ndarray:
  """MI matrix between every column of ``X`` (N×G) and of ``Y`` (N×P).

  Returns a (G, P) float64 array of Kraskov kNN MI estimates (nats).
  The pairwise computation is tiled ``chunk`` genes × ``qblock`` query
  cells per dispatch (defaults sized so the (C, Q, N) float32 working set
  fits ``mem_budget_bytes``), so memory stays bounded at any N; one
  kernel compile is reused across all tiles because shapes are padded.
  ``max_cells`` subsamples cells with a seeded permutation before
  estimation (the estimator is a mean over cells; at 20k cells a 5k
  subsample agrees to ~1e-2 nats — see
  benchmarks/results_analysis_matrices.md).
  """
  from scipy.special import digamma as _dg  # host finalization
  X = np.asarray(X, np.float64)
  Y = np.asarray(Y, np.float64)
  if max_cells is not None and X.shape[0] > max_cells:
    sel = np.random.RandomState(random_state).permutation(
        X.shape[0])[:max_cells]
    X, Y = X[sel], Y[sel]
  n, g = X.shape
  p = Y.shape[1]
  if qblock is None:
    qblock = min(n, 2048)
  if chunk is None:
    # dx + d + comparisons live concurrently → ~4 tile-sized f32 buffers
    chunk = max(1, min(g, mem_budget_bytes // max(1, 4 * 4 * qblock * n)))
  rng = np.random.RandomState(random_state)
  # sklearn _estimate_mi: scale(with_mean=False) then tie-breaking jitter
  def _prep(A):
    sd = A.std(axis=0)
    A = A / np.where(sd > 0, sd, 1.0)
    amp = noise * np.maximum(1.0, np.mean(np.abs(A), axis=0))
    return (A + amp * rng.standard_normal(A.shape)).astype(np.float32)
  Xs = _prep(X)
  Ys = _prep(Y)

  import jax

  kernel = _build_kernel(n, int(n_neighbors), int(qblock))
  pad = (-g) % chunk
  if pad:
    # pad with the first column: same compiled shape, results discarded
    Xs = np.concatenate([Xs, np.repeat(Xs[:, :1], pad, axis=1)], axis=1)
  # loop-invariant operands live on device ONCE: remote-attached chips
  # pay a full RPC per host→device transfer, and the query-block loop
  # would otherwise re-upload the unchanged gene tile ~n/qblock times
  # (and the protein matrix on every dispatch)
  ys = jax.device_put(Ys.T)  # (P, N): all proteins ride every dispatch
  sx = np.zeros((g + pad, p))
  sy = np.zeros((g + pad, p))
  for lo in range(0, g + pad, chunk):
    xc = jax.device_put(Xs[:, lo:lo + chunk].T)
    for qlo in range(0, n, qblock):
      bx, by = kernel(xc, ys, np.int32(qlo))
      sx[lo:lo + chunk] += np.asarray(bx).T
      sy[lo:lo + chunk] += np.asarray(by).T
  base = float(_dg(float(n)) + _dg(float(n_neighbors)))
  mi = base - sx[:g] / n - sy[:g] / n
  return np.maximum(mi, 0.0)
