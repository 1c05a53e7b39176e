"""CellAssign — marker-based cell-type assignment (scvi-tools surface).

All default tier (the model is a small GLM mixture, seconds to fit):
marker-matrix validation, fit/predict contracts, pandas in/out, seed
determinism, and the assignment protocol itself — types recovered at ~100%
accuracy from exclusive marker panels, marker fold-changes positive where
(and only where) ρ says so, and an unmarked "other" column absorbing cells
without marker elevation.
"""

import numpy as np
import pytest

from sisua_tpu.models import CellAssign


def _simulate(n=900, n_types=3, markers_per_type=5, n_bg=15, fold=8.0,
              seed=0, other_frac=0.0):
  """Exclusive marker panels over NB counts; optionally a fraction of
  cells from an unmarked 'other' population at baseline rates."""
  rng = np.random.default_rng(seed)
  G = n_types * markers_per_type + n_bg
  C = n_types + (1 if other_frac > 0 else 0)
  rho = np.zeros((G, C), np.float32)
  for c in range(n_types):
    rho[c * markers_per_type:(c + 1) * markers_per_type, c] = 1.0
  true = rng.integers(0, C, n) if other_frac == 0 else np.where(
      rng.random(n) < other_frac, C - 1, rng.integers(0, n_types, n))
  base = rng.uniform(0.5, 3.0, G)
  mu = np.tile(base, (n, 1))
  for c in range(n_types):
    sel = true == c
    mu[np.ix_(sel, np.where(rho[:, c] > 0)[0])] *= fold
  lib = rng.uniform(0.7, 1.4, n)[:, None]
  theta = 4.0
  p = theta / (theta + mu * lib)
  x = rng.negative_binomial(theta, p).astype(np.float32)
  return x, rho, true


def test_marker_matrix_validation():
  with pytest.raises(AssertionError):
    CellAssign(np.array([[0.5, 0.2]], np.float32))  # non-binary
  with pytest.raises(AssertionError):
    CellAssign(np.zeros((4, 2), np.float32))        # no marked type
  ca = CellAssign(np.eye(3, dtype=np.float32))
  with pytest.raises(AssertionError):
    ca.predict(np.zeros((2, 3), np.float32))        # predict before fit
  with pytest.raises(AssertionError):
    ca.fit(np.zeros((10, 5), np.float32))           # gene-count mismatch


def test_assignment_accuracy_and_fold_changes():
  x, rho, true = _simulate()
  ca = CellAssign(rho, seed=0)
  ca.fit(x, epochs=80, batch_size=256)
  losses = np.asarray(ca.history["loss"])
  assert np.isfinite(losses).all()
  assert losses[-1] < losses[0]
  gamma = ca.predict(x)
  assert gamma.shape == (x.shape[0], rho.shape[1])
  np.testing.assert_allclose(gamma.sum(-1), 1.0, atol=1e-4)
  acc = (gamma.argmax(-1) == true).mean()
  assert acc >= 0.95, f"assignment accuracy {acc:.3f}"
  fc = ca.get_fold_changes()
  assert (fc[rho > 0] >= ca.min_delta - 1e-6).all()
  assert (fc[rho == 0] == 0).all()
  assert fc[rho > 0].mean() > 1.0  # true fold 8 → log-FC ≈ 2


def test_other_type_absorbs_unmarked_cells():
  x, rho, true = _simulate(other_frac=0.3, seed=2)
  ca = CellAssign(rho, seed=0)
  ca.fit(x, epochs=80, batch_size=256)
  pred = ca.predict(x).argmax(-1)
  other = rho.shape[1] - 1
  # recall on the unmarked population (baseline-rate cells)
  recall = (pred[true == other] == other).mean()
  assert recall >= 0.8, f"'other' recall {recall:.3f}"
  acc = (pred == true).mean()
  assert acc >= 0.85


def test_pandas_roundtrip_and_determinism():
  pd = pytest.importorskip("pandas")
  x, rho, true = _simulate(n=300, seed=3)
  genes = [f"G{i}" for i in range(rho.shape[0])]
  types = [f"T{c}" for c in range(rho.shape[1])]
  ca = CellAssign(pd.DataFrame(rho, index=genes, columns=types), seed=1)
  ca.fit(x, epochs=30, batch_size=128)
  gamma = ca.predict(x)
  assert list(gamma.columns) == types
  hard = ca.predict(x, hard=True)
  assert set(hard) <= set(types)
  fc = ca.get_fold_changes()
  assert list(fc.index) == genes
  # determinism under the same seed
  ca2 = CellAssign(pd.DataFrame(rho, index=genes, columns=types), seed=1)
  ca2.fit(x, epochs=30, batch_size=128)
  np.testing.assert_allclose(ca2.predict(x).values, gamma.values,
                             rtol=1e-4, atol=1e-5)
