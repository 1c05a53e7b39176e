"""Device-accelerated Kraskov kNN MI (`ops.knn_mi`) vs sklearn.

The JAX backend reimplements sklearn's ``_compute_mi_cc`` (the estimator
behind the reference's MI matrix, ``_single_cell_analysis.py:1147-1196``)
as one batched device computation. Contract:

  * continuous data (no ties): near-exact agreement — the only deviations
    are float32 boundary flips;
  * tied count data: agreement within the estimator's OWN tie-break noise,
    measured in-test as sklearn-vs-sklearn across jitter seeds;
  * the analysis-layer ``backend='jax'`` path returns the same frame shape
    and caches under the same key as the sklearn path.
"""

import numpy as np
import pytest
from sklearn.feature_selection import mutual_info_regression

from sisua_tpu.ops.knn_mi import knn_mutual_information


def _sklearn_matrix(X, Y, random_state=8):
  return np.stack([mutual_info_regression(X, Y[:, j],
                                          random_state=random_state)
                   for j in range(Y.shape[1])], axis=1)


def test_continuous_matches_sklearn():
  rng = np.random.RandomState(0)
  n, g, p = 300, 16, 3
  z = rng.randn(n, 4)
  X = z @ rng.randn(4, g) + 0.5 * rng.randn(n, g)
  Y = z @ rng.randn(4, p) + 0.5 * rng.randn(n, p)
  ours = knn_mutual_information(X, Y)
  ref = _sklearn_matrix(X, Y)
  assert ours.shape == (g, p)
  assert np.abs(ours - ref).max() < 0.01
  assert np.corrcoef(ours.ravel(), ref.ravel())[0, 1] > 0.999


def test_counts_within_estimator_tie_noise():
  rng = np.random.RandomState(1)
  n, g, p = 400, 12, 3
  z = rng.gamma(2.0, 1.0, size=(n, 2))
  X = rng.poisson(z @ rng.uniform(0.3, 2.0, (2, g))).astype(float)
  Y = rng.poisson(z @ rng.uniform(0.3, 2.0, (2, p))).astype(float)
  ours = knn_mutual_information(X, Y)
  ref = _sklearn_matrix(X, Y, random_state=8)
  ref2 = _sklearn_matrix(X, Y, random_state=9)
  # sklearn's own spread across jitter seeds is the noise floor on tied
  # data; the device backend must sit within ~that envelope
  floor = np.abs(ref - ref2).max()
  assert np.abs(ours - ref).max() <= max(2.0 * floor, 0.05)
  # independence structure must be preserved: dependent pairs dominate
  assert np.corrcoef(ours.ravel(), ref.ravel())[0, 1] > 0.75


def test_independent_pairs_near_zero():
  rng = np.random.RandomState(2)
  X = rng.randn(500, 6)
  Y = rng.randn(500, 2)
  mi = knn_mutual_information(X, Y)
  assert mi.min() >= 0.0
  assert mi.max() < 0.1


def test_chunking_invariant():
  rng = np.random.RandomState(3)
  X = rng.randn(150, 10)
  Y = rng.randn(150, 2) + 0.5 * X[:, :2]
  full = knn_mutual_information(X, Y, chunk=10)
  tiled = knn_mutual_information(X, Y, chunk=3)  # pads 10 → 12
  np.testing.assert_allclose(full, tiled, atol=1e-6)


def test_query_blocking_invariant():
  """Query-axis tiling (the scale-safety mechanism) is exact: partial
  digamma sums over cell blocks reassemble the same statistic."""
  rng = np.random.RandomState(4)
  X = rng.randn(150, 8)
  Y = rng.randn(150, 2) + 0.5 * X[:, :2]
  full = knn_mutual_information(X, Y, qblock=150)
  tiled = knn_mutual_information(X, Y, qblock=64)  # 3 blocks, last padded
  np.testing.assert_allclose(full, tiled, atol=1e-5)


def test_eager_mode_no_nan():
  """The self-exclusion mask must be IEEE-safe: under ``disable_jit`` the
  old ``eye * inf`` construction evaluated 0*inf = NaN off-diagonal and
  silently poisoned every distance (ADVICE r4)."""
  import jax
  from sisua_tpu.ops.knn_mi import _build_kernel
  _build_kernel.cache_clear()
  rng = np.random.RandomState(5)
  X = rng.randn(60, 4)
  Y = rng.randn(60, 2) + 0.5 * X[:, :2]
  with jax.disable_jit():
    mi = knn_mutual_information(X, Y)
  _build_kernel.cache_clear()
  assert np.isfinite(mi).all()
  ref = _sklearn_matrix(X, Y)
  assert np.abs(mi - ref).max() < 0.15


def test_max_cells_subsample():
  rng = np.random.RandomState(6)
  z = rng.randn(3000, 2)
  X = z @ rng.randn(2, 6) + 0.5 * rng.randn(3000, 6)
  Y = z @ rng.randn(2, 2) + 0.5 * rng.randn(3000, 2)
  full = knn_mutual_information(X, Y, max_cells=None)
  sub = knn_mutual_information(X, Y, max_cells=1000)
  # subsampled estimate tracks the full one (estimator is a mean over
  # cells; 1/3 subsample adds ~k/sqrt(n) noise)
  assert np.abs(full - sub).max() < 0.1
  assert np.corrcoef(full.ravel(), sub.ravel())[0, 1] > 0.98


@pytest.mark.slow
def test_20k_cells_bounded_memory():
  """Atlas-scale guard (VERDICT r4 §weak 4): 20k cells must run without
  materializing the (N, N) tile — peak working set is bounded by the
  chunk × qblock × N budget, here forced to 256 MiB."""
  rng = np.random.RandomState(7)
  z = rng.randn(20000, 2)
  X = z @ rng.randn(2, 2) + 0.5 * rng.randn(20000, 2)
  Y = z @ rng.randn(2, 2) + 0.5 * rng.randn(20000, 2)
  mi = knn_mutual_information(X, Y, mem_budget_bytes=256 << 20)
  assert mi.shape == (2, 2)
  assert np.isfinite(mi).all()
  # dependent pairs must dominate the (jointly-driven) structure
  assert mi.min() >= 0.0 and mi.max() > 0.2


def test_analysis_layer_jax_backend():
  from sisua_tpu.data import generate_synthetic
  sco = generate_synthetic(n_cells=200, n_genes=30, n_proteins=4, seed=0)
  df = sco.get_mutual_information(omic1="transcriptomic", omic2="proteomic",
                                  backend="jax")
  assert df.shape == (30, 4)
  assert np.isfinite(df.values).all() and (df.values >= 0).all()
  # cached under the standard key — second call returns the same frame
  df2 = sco.get_mutual_information(omic1="transcriptomic",
                                   omic2="proteomic")
  assert df2 is df


def test_analysis_layer_backends_agree():
  """Both analysis-layer backends compute the tie-broken (float64)
  estimator: a float32 container must NOT push the sklearn path into the
  vanishing-jitter tie artifact (measured 6× inflated MI)."""
  from sisua_tpu.data import generate_synthetic
  sco = generate_synthetic(n_cells=250, n_genes=40, n_proteins=4, seed=1)
  a, b = sco.copy(), sco.copy()
  dj = a.get_mutual_information("transcriptomic", "proteomic",
                                backend="jax").values
  ds = b.get_mutual_information("transcriptomic", "proteomic").values
  assert np.abs(dj - ds).max() < 0.08
  assert abs(dj.mean() - ds.mean()) < 0.02
