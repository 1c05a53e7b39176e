"""Out-of-core device training: datasets larger than the HBM budget train
through pinned + streamed chunks (windowed shuffle, double-buffered uploads)
instead of falling back to the slow per-step streaming loop.

The budget is forced tiny via ``hbm_budget_bytes`` so a small synthetic
dataset exercises the full chunk machinery on the CPU backend."""

import jax
import numpy as np
import pytest

from sisua_tpu.data.feeder import DataFeeder
from sisua_tpu.models import VAE, RVmeta
from sisua_tpu.nn import NetConf
from sisua_tpu.train.trainer import Trainer

N, D, B = 1024, 32, 64
# f32 dataset = N*4*D = 131072 bytes; BUDGET holds half of it → the planner
# carves budget//8 = 64-row chunks: 16 chunks, 8 fit, 6 pinned (2 reserved
# for the rotating double buffer), 10 streamed per epoch
BUDGET = 65536


def _counts(seed=0, n=N, d=D):
  rng = np.random.default_rng(seed)
  rate = rng.gamma(2.0, 2.0, size=(n, d))
  return rng.poisson(rate).astype(np.float32)


def _model(seed=1):
  return VAE(RVmeta(D, "zinb", name="rna"), seed=seed,
             encoder=NetConf((16,)), decoder=NetConf((16,)))


def test_plan_partitions_and_residency():
  feeder = DataFeeder([_counts()], batch_size=B, labels_percent=0.0)
  tr = Trainer(step_core=lambda s, b, k: (s, {}), device_cache=True,
               hbm_budget_bytes=BUDGET)
  assert not tr._fits_device(feeder)
  plan = tr._plan_out_of_core(feeder)
  assert plan == {"chunk_rows": 64, "n_chunks": 16, "n_resident": 6}
  # even one batch over budget → no plan (caller falls back to streaming)
  tr_tiny = Trainer(step_core=None, device_cache=True,
                    hbm_budget_bytes=B * 4 * D // 2)
  assert tr_tiny._plan_out_of_core(feeder) is None
  # non-dividing tail: chunks cover every row, duplication < one chunk
  feeder_odd = DataFeeder([_counts(n=1000)], batch_size=B,
                          labels_percent=0.0)
  plan_odd = tr._plan_out_of_core(feeder_odd)
  R, S = plan_odd["chunk_rows"], plan_odd["n_chunks"]
  assert S * R >= 1000 and S * R - 1000 < R


def test_out_of_core_trains_and_matches_resident_quality():
  """Forced out-of-core training must converge to the same loss region as
  fully device-resident training on the identical dataset (the chunked
  windowed shuffle differs step-by-step but not in quality)."""
  X = _counts()
  m_res = _model()
  m_res.fit(X, epochs=8, batch_size=B, device_cache=True, verbose=False)
  m_oc = _model()
  m_oc.fit(X, epochs=8, batch_size=B, device_cache=True,
           hbm_budget_bytes=BUDGET, verbose=False)
  l_res = m_res.history["loss"]
  l_oc = m_oc.history["loss"]
  assert len(l_oc) == 8
  assert l_oc[-1] < l_oc[0], "out-of-core loss did not decrease"
  assert abs(l_oc[-1] - l_res[-1]) / abs(l_res[-1]) < 0.05, (l_oc, l_res)
  assert "cells_per_sec" in m_oc.history


def test_out_of_core_deterministic():
  X = _counts()
  runs = []
  for _ in range(2):
    m = _model(seed=3)
    m.fit(X, epochs=4, batch_size=B, device_cache=True,
          hbm_budget_bytes=BUDGET, verbose=False)
    runs.append(np.asarray(m.history["loss"]))
  np.testing.assert_array_equal(runs[0], runs[1])


def test_sparse_upload_matches_dense_upload():
  """A sparse (CSR) dataset streams its out-of-core chunks as padded
  triplets + on-device scatter; the densified chunks must be value-exact,
  so the loss trajectory matches the dense-upload run bit-for-bit."""
  import scipy.sparse as sp
  from sisua_tpu.train import trainer as trainer_mod

  rng = np.random.default_rng(2)
  X = rng.poisson(0.25, size=(N, D)).astype(np.float32)  # ~78% zeros
  assert (X == 0).mean() > 0.5
  m_dense = _model(seed=11)
  m_dense.fit(X, epochs=4, batch_size=B, device_cache=True,
              hbm_budget_bytes=BUDGET, verbose=False)
  m_sparse = _model(seed=11)
  captured = {}
  orig = trainer_mod.Trainer._fit_out_of_core
  def spy(self, *a, **k):
    out = orig(self, *a, **k)
    captured.update(self._oc_plan)
    return out
  trainer_mod.Trainer._fit_out_of_core = spy
  try:
    m_sparse.fit(sp.csr_matrix(X), epochs=4, batch_size=B,
                 device_cache=True, hbm_budget_bytes=BUDGET, verbose=False)
  finally:
    trainer_mod.Trainer._fit_out_of_core = orig
  assert captured["sparse_sources"] == [True], captured
  np.testing.assert_allclose(m_sparse.history["loss"],
                             m_dense.history["loss"], rtol=1e-6)


def test_sparse_upload_int16_exact():
  """int16 chunk storage composes with sparse upload (counts scatter-add
  in int16 exactly)."""
  import scipy.sparse as sp
  rng = np.random.default_rng(3)
  X = rng.poisson(0.25, size=(N, D)).astype(np.float32)
  m16 = _model(seed=13)
  m16.fit(sp.csr_matrix(X), epochs=4, batch_size=B, device_cache=True,
          device_dtype="int16", hbm_budget_bytes=BUDGET // 2, verbose=False)
  m32 = _model(seed=13)
  m32.fit(sp.csr_matrix(X), epochs=4, batch_size=B, device_cache=True,
          device_dtype="float32", hbm_budget_bytes=BUDGET, verbose=False)
  np.testing.assert_allclose(m16.history["loss"], m32.history["loss"],
                             rtol=1e-5)


def test_serving_sparse_upload_matches_dense():
  """The device-cached serving paths upload CSR sources as triplets; the
  on-device densify must be value-exact, so results are bit-identical to
  the dense-upload run under a pinned rng."""
  import scipy.sparse as sp
  from sisua_tpu.ops import sparse as sparse_ops

  rng = np.random.default_rng(4)
  X = rng.poisson(0.25, size=(512, D)).astype(np.float32)
  m = _model(seed=17)
  m.fit(X, epochs=2, batch_size=B, valid_freq=0, patience=0)
  calls = []
  orig = sparse_ops.csr_row_triplets
  def spy(*a, **k):
    calls.append(1)
    return orig(*a, **k)
  sparse_ops.csr_row_triplets = spy
  try:
    r = m._rng
    xd, zd = m.predict_mean(X, sample_shape=(4,), input_dtype=None)
    assert not calls  # dense input → dense pad path
    m._rng = r
    xs_, zs_ = m.predict_mean(sp.csr_matrix(X), sample_shape=(4,),
                              input_dtype=None)
    assert calls  # sparse input → triplet upload engaged
  finally:
    sparse_ops.csr_row_triplets = orig
  np.testing.assert_array_equal(xs_[0], xd[0])
  np.testing.assert_array_equal(zs_[0], zd[0])


@pytest.mark.slow
def test_out_of_core_int16_and_validation():
  """Compressed chunk storage + a validation feeder + early-stop patience
  all work on the out-of-core path."""
  X = _counts()
  Xv = _counts(seed=9, n=256)
  m = _model(seed=5)
  m.fit(X, valid=Xv, epochs=6, batch_size=B, device_cache=True,
        device_dtype="int16", valid_freq=0, patience=50,
        hbm_budget_bytes=BUDGET // 2,  # int16 halves bytes/row
        verbose=False)
  assert len(m.history["loss"]) == 6
  assert "val_loss" in m.history
  assert np.isfinite(m.history["val_loss"]).all()


def test_out_of_core_semi_supervised_and_checkpoint(tmp_path):
  """labels_percent masking, callbacks, and checkpoint-on-best all ride
  the out-of-core path."""
  from sisua_tpu.data.synthetic import generate_synthetic
  from sisua_tpu.models import SISUA
  from sisua_tpu.train.trainer import TrainingCallback

  sco = generate_synthetic(n_cells=N, n_genes=D, n_proteins=4, seed=3)
  m = SISUA([RVmeta(D, "zinb", name="rna"),
             RVmeta(4, "nb", name="adt")], seed=21,
            encoder=NetConf((16,)), decoder=NetConf((16,)))
  seen = []
  class Spy(TrainingCallback):
    def on_epoch_end(self, epoch, logs):
      seen.append(dict(logs))
  m.fit(sco, epochs=5, batch_size=B, labels_percent=0.5,
        device_cache=True, hbm_budget_bytes=BUDGET,
        callbacks=[Spy()], checkpoint_path=str(tmp_path / "ck"),
        verbose=False)
  assert len(seen) == 5 and all("loss" in s for s in seen)
  l = m.history["loss"]
  assert np.isfinite(np.asarray(l)).all() and l[-1] < l[0]
  assert (tmp_path / "ck").exists()
  # reload the checkpoint and predict
  m2 = SISUA([RVmeta(D, "zinb", name="rna"),
              RVmeta(4, "nb", name="adt")], seed=21,
             encoder=NetConf((16,)), decoder=NetConf((16,)))
  m2.load_weights(str(tmp_path / "ck"), raise_notfound=True)
  outs, qZ = m2.predict(sco[np.arange(32)])
  qz0 = qZ[0] if isinstance(qZ, (list, tuple)) else qZ
  assert qz0.batch_shape == (32,)


@pytest.mark.slow
def test_out_of_core_on_data_mesh():
  """Out-of-core + data-parallel mesh: chunks shard over the 'data' axis,
  training stays finite and converges."""
  from sisua_tpu.parallel import create_mesh
  X = _counts()
  m = _model(seed=7)
  mesh = create_mesh()  # all 8 virtual devices on 'data'
  m.fit(X, epochs=4, batch_size=B, device_cache=True, mesh=mesh,
        hbm_budget_bytes=BUDGET // 8,  # per-shard budget; aggregate = BUDGET
        verbose=False)
  l = m.history["loss"]
  assert len(l) == 4 and np.isfinite(np.asarray(l)).all() and l[-1] < l[0]
