"""SOLO — doublet detection on a trained latent (scvi-tools surface).

Fast tier: doublet simulation invariants (distinct partners, additive
counts), fit/predict shapes, soft/hard predict contract, determinism under
a fixed seed. Slow tier: the detection protocol — held-out simulated
doublets rank above observed singlets (calibrated AUC 0.92 at this budget;
threshold 0.8 for seed margin).
"""

import numpy as np
import pytest

from sisua_tpu.data import generate_citeseq
from sisua_tpu.models import SCVI, SOLO
from sisua_tpu.models.solo import _simulate_doublets
from sisua_tpu.nn import NetConf
from sisua_tpu.rv import RVmeta


def _fitted_scvi(x, epochs=2, seed=1):
  m = SCVI(RVmeta(x.shape[1], "zinbd", name="rna"), seed=seed,
           encoder=NetConf((32,)), decoder=NetConf((32,)))
  m.fit(x, epochs=epochs, batch_size=64, verbose=False)
  return m


def test_simulate_doublets_invariants():
  rng = np.random.default_rng(0)
  x = rng.poisson(3.0, (50, 20)).astype(np.float32)
  d = _simulate_doublets(x, 200, rng)
  assert d.shape == (200, 20)
  # every doublet's library is the sum of two observed libraries —
  # bounded by twice the max and at least twice the min observed library
  libs = x.sum(-1)
  dlibs = d.sum(-1)
  assert (dlibs <= 2 * libs.max() + 1e-6).all()
  assert (dlibs >= 2 * libs.min() - 1e-6).all()
  # counts are additive (non-negative integers summing two profiles)
  assert (d >= 0).all()
  assert np.allclose(d, np.round(d))


def test_fit_predict_contract():
  sco = generate_citeseq(n_cells=300, n_genes=40, n_proteins=4, seed=0)
  x = sco.numpy()
  scvi = _fitted_scvi(x)
  solo = SOLO.from_scvi_model(scvi, seed=0)
  with pytest.raises(AssertionError):
    solo.predict_doublet_proba(x)  # predict before fit
  solo.fit(x, epochs=5, verbose=False)
  proba = solo.predict_doublet_proba(x)
  assert proba.shape == (300,)
  assert ((proba >= 0) & (proba <= 1)).all()
  # accepts the container directly too
  proba_sco = solo.predict_doublet_proba(sco)
  np.testing.assert_allclose(proba_sco, proba, rtol=1e-5)
  # hard predict thresholds the soft one
  hard = solo.predict(x, soft=False, threshold=0.5)
  np.testing.assert_array_equal(hard, proba >= 0.5)


def test_seed_determinism():
  sco = generate_citeseq(n_cells=200, n_genes=30, n_proteins=4, seed=1)
  x = sco.numpy()
  scvi = _fitted_scvi(x)
  p1 = SOLO(scvi, seed=3).fit(x, epochs=4, verbose=False) \
      .predict_doublet_proba(x)
  p2 = SOLO(scvi, seed=3).fit(x, epochs=4, verbose=False) \
      .predict_doublet_proba(x)
  np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_detects_simulated_doublets():
  sco = generate_citeseq(n_cells=600, n_genes=60, n_proteins=4, seed=0)
  x = sco.numpy()
  scvi = _fitted_scvi(x, epochs=8)
  solo = SOLO.from_scvi_model(scvi, seed=0)
  solo.fit(x, epochs=30, verbose=False)
  p_singlet = solo.predict_doublet_proba(x)
  rng = np.random.default_rng(7)
  i = rng.integers(0, x.shape[0], 200)
  j = rng.integers(0, x.shape[0], 200)
  p_doublet = solo.predict_doublet_proba(x[i] + x[j])
  scores = np.r_[p_singlet, p_doublet]
  labels = np.r_[np.zeros(x.shape[0]), np.ones(200)]
  order = np.argsort(scores)
  ranks = np.empty(len(scores))
  ranks[order] = np.arange(len(scores))
  auc = (ranks[labels == 1].mean() - (200 - 1) / 2) / x.shape[0]
  assert auc >= 0.8, f"doublet AUC {auc:.3f}"
  assert p_doublet.mean() > p_singlet.mean() + 0.2
