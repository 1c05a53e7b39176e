"""Criticizer — disentanglement metrics over (latents, factors).

Re-provides the `[odin]` ``Criticizer`` capability the reference's
``on_eval`` consumes (``/root/reference/sisua/train.py:177-190``): the nine
score functions ``cal_clustering_scores``, ``cal_dci_scores``,
``cal_mutual_info_gap``, ``cal_total_correlation``,
``cal_separated_attr_predictability``, ``cal_relative_disentanglement_
strength``, ``cal_relative_mutual_strength``, ``cal_betavae_score``,
``cal_factorvae_score``, plus the correlation/MI matrices used by
Posterior's heatmaps.

All metrics are implemented from their published definitions:
  * BetaVAE score (Higgins et al. 2017): logistic regression on |z₁−z₂|
    of latent pairs sharing one fixed factor.
  * FactorVAE score (Kim & Mnih 2018): majority-vote on the argmin of
    per-dim variance of latents with one factor fixed.
  * MIG (Chen et al. 2018): normalized gap between the two largest
    latent-factor mutual informations.
  * DCI (Eastwood & Williams 2018): disentanglement/completeness from
    gradient-boosted-tree importance matrices + informativeness.
  * SAP (Kumar et al. 2018): gap of the two best per-factor R²/accuracies.
  * Total correlation: Σ entropy(marginals) − entropy(joint), gaussian
    approximation on latents.
  * Relative disentanglement/mutual strength: per-factor contrast
    (top-1 − top-2)/top-1 of the |spearman| (resp. MI) latent-factor matrix —
    the odin-style relative variants.

Host-side sklearn/numpy; latents are device-independent numpy arrays.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

__all__ = ["Criticizer", "discretize_factors"]


def discretize_factors(factors: np.ndarray, n_bins: int = 5) -> np.ndarray:
  """Quantile-bin continuous factor columns into integer codes."""
  factors = np.asarray(factors)
  out = np.zeros(factors.shape, np.int32)
  for j in range(factors.shape[1]):
    col = factors[:, j]
    uniq = np.unique(col)
    if len(uniq) <= n_bins:  # already categorical
      out[:, j] = np.searchsorted(uniq, col)
    else:
      qs = np.quantile(col, np.linspace(0, 1, n_bins + 1)[1:-1])
      out[:, j] = np.digitize(col, qs)
  return out


def _discrete_mutual_info(z_binned: np.ndarray, f_codes: np.ndarray
                          ) -> np.ndarray:
  """(n_latents, n_factors) MI matrix between binned latents and factors."""
  from sklearn.metrics import mutual_info_score
  d, k = z_binned.shape[1], f_codes.shape[1]
  mi = np.zeros((d, k))
  for i in range(d):
    for j in range(k):
      mi[i, j] = mutual_info_score(z_binned[:, i], f_codes[:, j])
  return mi


def _entropy(codes: np.ndarray) -> np.ndarray:
  out = np.zeros(codes.shape[1])
  for j in range(codes.shape[1]):
    _, cnt = np.unique(codes[:, j], return_counts=True)
    p = cnt / cnt.sum()
    out[j] = -np.sum(p * np.log(p + 1e-12))
  return out


class Criticizer:
  """Holds (latents, factors) and computes the metric suite.

  ``latents``: (n_cells, n_latents) representation means.
  ``factors``: (n_cells, n_factors) ground-truth generative factors (counts,
  one-hot or continuous — discretized internally).
  """

  def __init__(self,
               latents: np.ndarray,
               factors: np.ndarray,
               factor_names: Optional[Sequence[str]] = None,
               n_bins: int = 5,
               seed: int = 8):
    self.latents = np.asarray(latents, np.float64)
    self.factors = np.asarray(factors, np.float64)
    assert self.latents.shape[0] == self.factors.shape[0]
    self.factor_names = list(factor_names) if factor_names is not None else \
        [f"factor{i}" for i in range(self.factors.shape[1])]
    self.n_bins = int(n_bins)
    self.seed = int(seed)
    self.factor_codes = discretize_factors(self.factors, n_bins)
    self.latent_codes = discretize_factors(self.latents, max(n_bins, 10))
    self._rng = np.random.RandomState(seed)
    self._cache: Dict[str, object] = {}

  # ------------------------------------------------------------- matrices
  def create_correlation_matrix(self, method: str = "spearman"
                                ) -> np.ndarray:
    """(n_latents, n_factors) correlation matrix."""
    from scipy import stats as sp_stats
    key = f"corr_{method}"
    if key in self._cache:
      return self._cache[key]
    z, f = self.latents, self.factors
    if method == "spearman":
      z = np.apply_along_axis(sp_stats.rankdata, 0, z)
      f = np.apply_along_axis(sp_stats.rankdata, 0, f)
    zc = (z - z.mean(0)) / (z.std(0) + 1e-12)
    fc = (f - f.mean(0)) / (f.std(0) + 1e-12)
    m = (zc.T @ fc) / len(z)
    self._cache[key] = m
    return m

  def create_mutualinfo_matrix(self) -> np.ndarray:
    if "mi" not in self._cache:
      self._cache["mi"] = _discrete_mutual_info(self.latent_codes,
                                                self.factor_codes)
    return self._cache["mi"]

  def create_importance_matrix(self) -> Tuple[np.ndarray, np.ndarray]:
    """(importance matrix, per-factor test accuracy) via gradient-boosted
    trees (the DCI protocol)."""
    if "imp" in self._cache:
      return self._cache["imp"]
    from sklearn.ensemble import GradientBoostingClassifier
    n = len(self.latents)
    idx = self._rng.permutation(n)
    cut = int(0.8 * n)
    tr, te = idx[:cut], idx[cut:]
    d, k = self.latents.shape[1], self.factor_codes.shape[1]
    imp = np.zeros((d, k))
    acc = np.zeros(k)
    for j in range(k):
      y = self.factor_codes[:, j]
      if len(np.unique(y[tr])) < 2:
        continue
      clf = GradientBoostingClassifier(n_estimators=30, max_depth=3,
                                       random_state=self.seed)
      clf.fit(self.latents[tr], y[tr])
      imp[:, j] = clf.feature_importances_
      acc[j] = clf.score(self.latents[te], y[te])
    self._cache["imp"] = (imp, acc)
    return imp, acc

  # --------------------------------------------------------------- metrics
  def cal_mutual_info_gap(self) -> Dict[str, float]:
    mi = self.create_mutualinfo_matrix()
    h = _entropy(self.factor_codes)
    gaps = []
    for j in range(mi.shape[1]):
      if h[j] <= 0:
        continue
      top2 = np.sort(mi[:, j])[-2:]
      gap = top2[-1] - (top2[0] if len(top2) > 1 else 0.0)
      gaps.append(gap / h[j])
    return {"mig": float(np.mean(gaps)) if gaps else 0.0}

  def cal_dci_scores(self) -> Dict[str, float]:
    imp, acc = self.create_importance_matrix()
    eps = 1e-11
    # normalized entropy; a 1-outcome distribution has entropy 0 (dividing
    # by log(1)≈0 would blow the score outside [0,1])
    def _norm_entropy(p, axis, n):
      ent = -np.sum(p * np.log(p + eps), axis)
      return ent / np.log(n) if n > 1 else np.zeros_like(ent)
    # disentanglement: 1 − entropy of each latent's importance profile
    p_d = imp / (imp.sum(1, keepdims=True) + eps)
    ent_d = _norm_entropy(p_d, 1, imp.shape[1])
    rel = imp.sum(1) / (imp.sum() + eps)
    disent = float(np.sum(rel * (1.0 - ent_d)))
    # completeness: per factor over latents
    p_c = imp / (imp.sum(0, keepdims=True) + eps)
    ent_c = _norm_entropy(p_c, 0, imp.shape[0])
    complete = float(np.mean(1.0 - ent_c))
    return {"disentanglement": disent, "completeness": complete,
            "informativeness": float(np.mean(acc)), "dci": float(
                np.mean([disent, complete, np.mean(acc)]))}

  def cal_total_correlation(self) -> Dict[str, float]:
    """Gaussian TC of the latent representation: ½(Σ log σ²ᵢ − log|Σ|)."""
    z = self.latents - self.latents.mean(0)
    cov = (z.T @ z) / (len(z) - 1) + 1e-8 * np.eye(z.shape[1])
    sign, logdet = np.linalg.slogdet(cov)
    tc = 0.5 * (np.sum(np.log(np.diag(cov))) - logdet)
    return {"tc": float(max(tc, 0.0))}

  def cal_separated_attr_predictability(self) -> Dict[str, float]:
    """SAP: mean over factors of (best − second-best) single-latent
    predictability."""
    # same discrete-MI matrix as MIG — reuse the cached computation
    score = self.create_mutualinfo_matrix()
    k = score.shape[1]
    gaps = []
    for j in range(k):
      top2 = np.sort(score[:, j])[-2:]
      gaps.append(top2[-1] - (top2[0] if len(top2) > 1 else 0.0))
  # (SAP on discrete MI — continuous-factor R² variant collapses here
  #  because factors are count/one-hot omics)
    return {"sap": float(np.mean(gaps))}

  def cal_betavae_score(self, n_samples: int = 2000, batch_size: int = 16
                        ) -> Dict[str, float]:
    """Higgins interventional metric on observational data: for a sampled
    factor j, pair cells sharing the same discretized value of j, average
    |z₁−z₂| over a mini-batch, classify j from the averaged difference."""
    cache_key = ("betavae", n_samples, batch_size)
    if cache_key in self._cache:
      return self._cache[cache_key]
    # dedicated RandomState → the score is a pure function of (data, seed,
    # n_samples, batch_size) no matter how many metrics ran before it
    rng = np.random.RandomState(self.seed + 1)
    X, y = self._interventional_features(n_samples, batch_size,
                                         use_argmin=False, rng=rng)
    cut = int(0.8 * len(X))
    if len(X) == 0 or cut == 0:
      out = {"betavae": 0.0}
    elif len(np.unique(y[:cut])) < 2:
      # degenerate (single factor column / single attainable class): a
      # majority-vote classifier is exact, which is what LogisticRegression
      # would converge to if sklearn allowed single-class fits
      maj = np.bincount(y[:cut].astype(int)).argmax()
      te = y[cut:] if len(y) > cut else y[:cut]
      out = {"betavae": float(np.mean(te == maj))}
    else:
      from sklearn.linear_model import LogisticRegression
      clf = LogisticRegression(max_iter=500, random_state=self.seed)
      clf.fit(X[:cut], y[:cut])
      Xte, yte = (X[cut:], y[cut:]) if len(X) > cut else (X[:cut], y[:cut])
      out = {"betavae": float(clf.score(Xte, yte))}
    self._cache[cache_key] = out
    return out

  def cal_factorvae_score(self, n_samples: int = 2000, batch_size: int = 16
                          ) -> Dict[str, float]:
    """Kim & Mnih majority-vote metric: argmin of the per-dim variance of
    normalized latents within a fixed-factor batch votes for the factor."""
    cache_key = ("factorvae", n_samples, batch_size)
    if cache_key in self._cache:
      return self._cache[cache_key]
    rng = np.random.RandomState(self.seed + 2)
    z_std = self.latents.std(0) + 1e-12
    votes = np.zeros((self.latents.shape[1], self.factor_codes.shape[1]))
    samples = []
    k = self.factor_codes.shape[1]
    for _ in range(n_samples):
      j = rng.randint(k)
      rows = self._rows_sharing_factor(j, batch_size, rng)
      if rows is None:
        continue
      zb = self.latents[rows] / z_std
      dim = int(np.argmin(zb.var(0)))
      samples.append((dim, j))
    if not samples:
      self._cache[cache_key] = {"factorvae": 0.0}
      return self._cache[cache_key]
    cut = int(0.8 * len(samples))
    for dim, j in samples[:cut]:
      votes[dim, j] += 1
    classifier = votes.argmax(1)
    correct = sum(int(classifier[dim] == j) for dim, j in samples[cut:])
    out = {"factorvae": correct / max(1, len(samples) - cut)}
    self._cache[cache_key] = out
    return out

  def cal_relative_disentanglement_strength(self) -> Dict[str, float]:
    """odin-style relative strength on the |spearman| matrix: mean over
    factors of (top1 − top2)/top1."""
    m = np.abs(self.create_correlation_matrix("spearman"))
    return {"rds": self._relative_strength(m)}

  def cal_relative_mutual_strength(self) -> Dict[str, float]:
    m = self.create_mutualinfo_matrix()
    return {"rms": self._relative_strength(m)}

  @staticmethod
  def _relative_strength(m: np.ndarray) -> float:
    vals = []
    for j in range(m.shape[1]):
      top2 = np.sort(m[:, j])[-2:]
      second = top2[0] if len(top2) > 1 else 0.0
      if top2[-1] > 0:
        vals.append((top2[-1] - second) / top2[-1])
    return float(np.mean(vals)) if vals else 0.0

  def cal_clustering_scores(self) -> Dict[str, float]:
    if "clustering" not in self._cache:
      from .latent import clustering_scores
      # dominant factor id as the label
      labels = np.argmax(self.factors, 1) if self.factors.shape[1] > 1 else \
          self.factor_codes[:, 0]
      self._cache["clustering"] = clustering_scores(self.latents, labels,
                                                    seed=self.seed)
    return self._cache["clustering"]

  def cal_all_scores(self) -> Dict[str, float]:
    out: Dict[str, float] = {}
    for fn in (self.cal_clustering_scores, self.cal_dci_scores,
               self.cal_mutual_info_gap, self.cal_total_correlation,
               self.cal_separated_attr_predictability,
               self.cal_relative_disentanglement_strength,
               self.cal_relative_mutual_strength, self.cal_betavae_score,
               self.cal_factorvae_score):
      out.update(fn())
    return out

  # ---------------------------------------------------------------- helpers
  def _rows_sharing_factor(self, j: int, batch_size: int,
                           rng: Optional[np.random.RandomState] = None
                           ) -> Optional[np.ndarray]:
    rng = rng if rng is not None else self._rng
    codes = self.factor_codes[:, j]
    val = codes[rng.randint(len(codes))]
    pool = np.nonzero(codes == val)[0]
    if len(pool) < 2:
      return None
    return rng.choice(pool, size=min(batch_size, len(pool)),
                      replace=len(pool) < batch_size)

  def _interventional_features(self, n_samples: int, batch_size: int,
                               use_argmin: bool,
                               rng: Optional[np.random.RandomState] = None):
    rng = rng if rng is not None else self._rng
    X, y = [], []
    k = self.factor_codes.shape[1]
    for _ in range(n_samples):
      j = rng.randint(k)
      rows = self._rows_sharing_factor(j, 2 * batch_size, rng)
      if rows is None or len(rows) < 2:
        continue
      half = len(rows) // 2
      z1, z2 = self.latents[rows[:half]], self.latents[rows[half:2 * half]]
      X.append(np.mean(np.abs(z1 - z2), 0))
      y.append(j)
    return np.asarray(X), np.asarray(y)
