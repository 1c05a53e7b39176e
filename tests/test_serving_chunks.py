"""Out-of-core SERVING: datasets whose dense upload exceeds the device
budget score in fixed-size row chunks through the same cached executable.
`SISUA_TPU_SERVING_BUDGET` forces a tiny budget so small data exercises
the chunk machinery; a deterministic model (DCA + mse) makes chunked ≡
unchunked an exact equality."""

import os

import numpy as np
import pytest

from sisua_tpu.models import DeepCountAutoencoder, RVmeta
from sisua_tpu.nn import NetConf

N, D, B = 700, 24, 64  # N deliberately not a multiple of the chunk size


@pytest.fixture()
def dca():
  rng = np.random.default_rng(0)
  X = rng.poisson(rng.gamma(2.0, 2.0, size=(N, D))).astype(np.float32)
  m = DeepCountAutoencoder(RVmeta(D, "mse", name="rna"), seed=1,
                           encoder=NetConf((16,)), decoder=NetConf((16,)))
  m.fit(X, epochs=2, batch_size=B, valid_freq=0, patience=0)
  return m, X


def _forced_budget():
  # each serving chunk ≈ budget/2 rounded to batches → 2 batches/chunk
  return str(4 * B * 4 * D)


def test_predict_mean_chunked_matches_unchunked(dca):
  m, X = dca
  x1, z1 = m.predict_mean(X)
  feeder = m._to_feeder(X, 256, 0.0, shuffle=False)
  os.environ["SISUA_TPU_SERVING_BUDGET"] = _forced_budget()
  try:
    assert len(m._serving_chunks(feeder)) > 1
    x2, z2 = m.predict_mean(X)
  finally:
    del os.environ["SISUA_TPU_SERVING_BUDGET"]
  np.testing.assert_array_equal(x2[0], x1[0])
  np.testing.assert_array_equal(z2[0], z1[0])
  assert x2[0].shape == (N, D)


def test_predict_device_cached_chunked_matches(dca):
  m, X = dca
  pX1, qZ1 = m.predict(X, device_cache=True)
  os.environ["SISUA_TPU_SERVING_BUDGET"] = _forced_budget()
  try:
    pX2, qZ2 = m.predict(X, device_cache=True)
  finally:
    del os.environ["SISUA_TPU_SERVING_BUDGET"]
  np.testing.assert_array_equal(np.asarray(pX2.mean()),
                                np.asarray(pX1.mean()))
  np.testing.assert_array_equal(np.asarray(qZ2.mean()),
                                np.asarray(qZ1.mean()))
  assert np.asarray(pX2.mean()).shape[-2:] == (N, D)


def test_compute_llk_chunked_matches(dca):
  m, X = dca
  t = {"orig": [X]}
  r1 = m.compute_llk(X, t)
  os.environ["SISUA_TPU_SERVING_BUDGET"] = _forced_budget()
  try:
    r2 = m.compute_llk(X, t)
  finally:
    del os.environ["SISUA_TPU_SERVING_BUDGET"]
  for k in r1:
    np.testing.assert_allclose(r2[k], r1[k], rtol=1e-6)


def test_tiny_dataset_never_chunks_below_one_batch(dca):
  """batch_size > n_obs with a forced tiny budget must NOT produce a
  zero-batch chunk (regression: wrap-pad shorter than rows_per → k=0 →
  ZeroDivisionError)."""
  m, X = dca
  os.environ["SISUA_TPU_SERVING_BUDGET"] = "100"
  try:
    x2, z2 = m.predict_mean(X[:20], batch_size=64)
  finally:
    del os.environ["SISUA_TPU_SERVING_BUDGET"]
  assert x2[0].shape == (20, D)
  x1, _ = m.predict_mean(X[:20], batch_size=64)
  np.testing.assert_array_equal(x2[0], x1[0])


def test_norm_expr_chunked_matches(dca):
  m, X = dca
  e1 = m.get_normalized_expression(X)
  os.environ["SISUA_TPU_SERVING_BUDGET"] = _forced_budget()
  try:
    e2 = m.get_normalized_expression(X)
  finally:
    del os.environ["SISUA_TPU_SERVING_BUDGET"]
  np.testing.assert_array_equal(e2, e1)
  assert e2.shape == (N, D)


def test_int16_validation_scans_once_per_source(dca, monkeypatch):
  """The 'auto' int16 verdict must be computed once per feeder, not once
  per serving chunk — out-of-core serving would otherwise rescan the full
  dataset for every chunk (review finding)."""
  import sisua_tpu.ops.sparse as sparse_ops
  m, X = dca
  calls = []
  real = sparse_ops.int16_exact
  monkeypatch.setattr(sparse_ops, "int16_exact",
                      lambda v: calls.append(1) or real(v))
  os.environ["SISUA_TPU_SERVING_BUDGET"] = _forced_budget()
  try:
    feeder = m._to_feeder(X, B, 0.0, shuffle=False)
    chunks = m._serving_chunks(feeder)
    assert chunks is not None and len(chunks) > 1
    m.predict_mean(X, batch_size=B)
  finally:
    del os.environ["SISUA_TPU_SERVING_BUDGET"]
  # one scan per consumed source for the whole chunked call
  assert len(calls) == 1, f"int16_exact ran {len(calls)} times"
