"""PeakVI — Bernoulli accessibility VAE (scvi-tools `PEAKVI` surface):
coercion/binarization semantics, fit on structured synthetic ATAC,
accessibility estimates recovering the generating probabilities, depth
factor behavior, and the save/load round-trip."""

import numpy as np
import pytest

from sisua_tpu.data import OMIC, SingleCellOMIC
from sisua_tpu.models import PEAKVI, get_model
from sisua_tpu.nn import NetConf
from sisua_tpu.rv import RVmeta

N_CELLS, N_PEAKS = 500, 200


def _synthetic_atac(seed=0):
  """3 latent programs over peaks + per-cell depth; returns (counts, true_p)."""
  rng = np.random.RandomState(seed)
  W = rng.rand(3, N_PEAKS) < 0.25
  prog = rng.randint(0, 3, size=N_CELLS)
  depth = rng.uniform(0.3, 1.0, size=(N_CELLS, 1))
  p = 0.05 + 0.85 * W[prog] * depth
  X = (rng.rand(N_CELLS, N_PEAKS) < p).astype(np.float32)
  # raw fragment counts (the model must binarize internally)
  X = X * rng.poisson(2, (N_CELLS, N_PEAKS)).clip(1)
  return X.astype(np.float32), (W[prog] * depth)


def _model(seed=1):
  return PEAKVI(RVmeta(N_PEAKS, "zinb", name="atac"), seed=seed,
                encoder=NetConf((32,)), decoder=NetConf((32,)))


def test_peakvi_registry_and_coercion():
  assert get_model("peakvi") is PEAKVI
  m = _model()
  assert m.outputs[0].posterior == "bernoulli"
  assert not m.outputs[0].projection  # composed-logit direct decode
  assert not m.log_norm


def test_peakvi_binarizes_targets():
  import jax.numpy as jnp
  m = _model()
  batch = {"inputs": [jnp.asarray([[0.0, 3.0, 1.0], [2.0, 0.0, 0.0]])]}
  t = m._loss_targets(batch)[0]
  np.testing.assert_array_equal(np.asarray(t), [[0, 1, 1], [1, 0, 0]])


def test_peakvi_fit_and_estimates():
  from scipy.stats import spearmanr
  X, true_p = _synthetic_atac()
  m = _model()
  m.fit(X, epochs=10, batch_size=64, verbose=False)
  losses = np.asarray(m.history["loss"], np.float64)
  assert np.isfinite(losses).all() and losses[-1] < losses[0]
  est = m.get_accessibility_estimates(X)
  assert est.shape == X.shape
  assert (est > 0).all() and (est < 1).all()
  rho = spearmanr(est.ravel(), true_p.ravel()).statistic
  assert rho > 0.3, rho  # measured ≈0.6 on this generator


def test_peakvi_on_singlecellomic_atac():
  X, _ = _synthetic_atac(seed=2)
  sco = SingleCellOMIC(X, omic=OMIC.atac, name="synthetic_atac")
  m = _model()
  m.fit(sco, epochs=3, batch_size=64, verbose=False)
  outs, qZ = m.predict(sco, batch_size=128)
  pX = outs[0] if isinstance(outs, (tuple, list)) else outs
  assert pX.batch_shape[0] == N_CELLS
  # forward likelihood is a per-peak Bernoulli: mean in (0,1)
  mu = np.asarray(pX.mean())
  assert (mu >= 0).all() and (mu <= 1).all()


def test_peakvi_region_flag_and_depth_free():
  X, _ = _synthetic_atac(seed=3)
  m = _model()
  m.fit(X, epochs=2, batch_size=64, verbose=False)
  with_r = m.get_accessibility_estimates(X)
  no_r = m.get_accessibility_estimates(X, region=False)
  # dropping the per-peak factor can only raise the probability
  assert (no_r >= with_r - 1e-6).all()


def test_peakvi_save_load_roundtrip(tmp_path):
  from sisua_tpu.models import load_model
  X, _ = _synthetic_atac(seed=4)
  m = _model()
  m.fit(X, epochs=2, batch_size=64, verbose=False)
  e1 = m.get_accessibility_estimates(X)
  m.save_weights(str(tmp_path / "ck"))
  m2 = load_model(str(tmp_path / "ck"))
  assert isinstance(m2, PEAKVI)
  e2 = m2.get_accessibility_estimates(X)
  np.testing.assert_allclose(e1, e2, atol=1e-5)
