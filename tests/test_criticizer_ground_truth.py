"""Ground-truth pins for the Criticizer disentanglement suite (VERDICT r1 #9).

The distribution layer is pinned against scipy/torch; these tests pin the
disentanglement metrics the same way — on constructed (latents, factors)
cases where the metric values are analytically known:

  * perfectly disentangled: latents are a permuted copy of the factors
    (plus pure-noise dims) → MIG/DCI/SAP/RDS/RMS/betavae/factorvae ≈ 1 (SAP
    ≈ factor entropy, its unnormalized analogue), TC ≈ 0.
  * fully entangled: every latent is the same mixture of all factors →
    MIG/RDS/RMS ≈ 0.
  * Gaussian TC: for a 2-d Gaussian with correlation ρ,
    TC = −½·log(1−ρ²) exactly.
  * monotonicity: corrupting the latent-factor correspondence with noise
    must decrease MIG monotonically.

Protocol references: Higgins 2017 (betavae), Kim & Mnih 2018 (factorvae),
Chen 2018 (MIG), Eastwood & Williams 2018 (DCI), Kumar 2018 (SAP); consumed
by the reference's on_eval (/root/reference/sisua/train.py:177-190).
"""

import numpy as np
import pytest

from sisua_tpu.analysis.criticizer import Criticizer


N, K, NOISE_DIMS = 4000, 4, 3


def _factors(rng, n=N, k=K, levels=5):
  return rng.integers(0, levels, size=(n, k)).astype(np.float64)


@pytest.fixture(scope="module")
def disentangled():
  """Latents = permuted factor copies + independent noise dims."""
  rng = np.random.default_rng(0)
  F = _factors(rng)
  perm = np.array([2, 0, 3, 1])
  Z = np.concatenate([F[:, perm],
                      rng.normal(size=(N, NOISE_DIMS))], axis=1)
  # tiny jitter so the "continuous" latent columns don't have degenerate
  # variance yet stay essentially bijective with their factor
  Z[:, :K] += rng.normal(0, 1e-3, size=(N, K))
  return Criticizer(Z, F, n_bins=5, seed=1)


@pytest.fixture(scope="module")
def entangled():
  """Every latent is the SAME mixture of all factors (plus tiny jitter):
  no latent is more informative about any factor than another."""
  rng = np.random.default_rng(1)
  F = _factors(rng)
  mix = F.sum(1, keepdims=True)
  Z = np.repeat(mix, 5, axis=1) + rng.normal(0, 1e-3, size=(N, 5))
  return Criticizer(Z, F, n_bins=5, seed=1)


def test_mig_perfect(disentangled):
  # each factor's top-MI latent is its exact copy (MI = H), runner-up ≈ 0
  assert disentangled.cal_mutual_info_gap()["mig"] > 0.85


def test_mig_entangled(entangled):
  assert entangled.cal_mutual_info_gap()["mig"] < 0.1


def test_dci_perfect(disentangled):
  s = disentangled.cal_dci_scores()
  assert s["disentanglement"] > 0.85
  assert s["completeness"] > 0.85
  assert s["informativeness"] > 0.95


def test_sap_equals_factor_entropy(disentangled):
  """SAP here is the unnormalized MI gap: top1 = H(factor) (exact copy),
  top2 ≈ 0, so SAP ≈ mean factor entropy."""
  s = disentangled.cal_separated_attr_predictability()["sap"]
  h = []
  for j in range(K):
    _, cnt = np.unique(disentangled.factor_codes[:, j], return_counts=True)
    p = cnt / cnt.sum()
    h.append(-np.sum(p * np.log(p)))
  np.testing.assert_allclose(s, np.mean(h), rtol=0.1)


def test_relative_strengths(disentangled, entangled):
  assert disentangled.cal_relative_disentanglement_strength()["rds"] > 0.8
  assert disentangled.cal_relative_mutual_strength()["rms"] > 0.8
  assert entangled.cal_relative_disentanglement_strength()["rds"] < 0.1
  assert entangled.cal_relative_mutual_strength()["rms"] < 0.1


def test_interventional_scores_perfect(disentangled):
  assert disentangled.cal_betavae_score()["betavae"] > 0.9
  assert disentangled.cal_factorvae_score()["factorvae"] > 0.9


def test_tc_gaussian_analytic():
  """2-d Gaussian with correlation ρ: TC = −½ log(1−ρ²) exactly."""
  rho = 0.8
  rng = np.random.default_rng(2)
  cov = np.array([[1.0, rho], [rho, 1.0]])
  Z = rng.multivariate_normal([0, 0], cov, size=200_000)
  F = rng.integers(0, 3, size=(len(Z), 2)).astype(np.float64)
  crit = Criticizer(Z, F)
  expected = -0.5 * np.log(1 - rho**2)
  np.testing.assert_allclose(crit.cal_total_correlation()["tc"], expected,
                             rtol=0.05)


def test_tc_independent_is_zero(disentangled):
  # permuted-copy latents of independent factors are themselves independent
  assert disentangled.cal_total_correlation()["tc"] < 0.05


def test_mig_monotone_in_noise():
  """Resampling a growing fraction of each latent's entries must strictly
  erode MIG."""
  rng = np.random.default_rng(3)
  F = _factors(rng)
  migs = []
  for frac in (0.0, 0.5, 0.95):
    Z = F.copy() + rng.normal(0, 1e-3, F.shape)
    m = rng.random(F.shape) < frac
    Z[m] = rng.integers(0, 5, size=int(m.sum()))
    migs.append(Criticizer(Z, F, seed=1).cal_mutual_info_gap()["mig"])
  assert migs[0] > migs[1] > migs[2]


def test_degenerate_single_factor_column():
  """A single factor column must not crash any metric and must keep DCI
  scores inside [0, 1] (log(n_factors) normalizer is 0 when n_factors=1)."""
  rng = np.random.default_rng(4)
  F = rng.integers(0, 4, size=(400, 1)).astype(np.float64)
  Z = np.concatenate([F + rng.normal(0, 0.01, F.shape),
                      rng.normal(size=(400, 2))], axis=1)
  crit = Criticizer(Z, F, seed=1)
  scores = crit.cal_all_scores()
  assert 0.0 <= scores["disentanglement"] <= 1.0
  assert 0.0 <= scores["completeness"] <= 1.0
  assert 0.0 <= scores["betavae"] <= 1.0  # majority-vote fallback
  assert np.isfinite(scores["sap"]) and np.isfinite(scores["mig"])


def test_single_latent_dimension():
  """d=1 latents: top-2 gaps degrade to top-1 instead of IndexError."""
  rng = np.random.default_rng(5)
  F = rng.integers(0, 4, size=(400, 2)).astype(np.float64)
  Z = (F[:, :1] + rng.normal(0, 0.01, (400, 1)))
  crit = Criticizer(Z, F, seed=1)
  scores = crit.cal_all_scores()
  assert all(np.isfinite(v) for v in scores.values())


def test_clustering_scores_cached():
  rng = np.random.default_rng(6)
  F = rng.integers(0, 3, size=(300, 2)).astype(np.float64)
  crit = Criticizer(rng.normal(size=(300, 4)), F, seed=1)
  first = crit.cal_clustering_scores()
  assert crit.cal_clustering_scores() is first  # cached, not recomputed
