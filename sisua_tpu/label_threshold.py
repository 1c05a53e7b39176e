"""ProbabilisticEmbedding — GMM-based probabilization of protein counts.

Capability parity with ``/root/reference/sisua/label_threshold.py``: per
protein column (1) normalize — optionally drop zeros, IQR-clip, log-norm
``log1p(x/sum·1e4)`` — (2) fit a 2-component diagonal GMM (8 inits, 120 EM
iters, with a mean-threshold fallback when the empirical covariance is
degenerate), then (3) ``predict`` binarizes at the lower bound of the
``|ci_threshold|`` normal confidence interval of the positive (higher-mean)
component, and ``predict_proba`` averages the responsibilities of the
positive components. Downstream protein-level F1 metrics binarize through
this, so semantics match exactly (reference :107-298).

Host-side (sklearn GMM): this runs once per dataset on CPU; it is not a TPU
hot path.
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional, Tuple

import numpy as np
from scipy import stats

__all__ = ["ProbabilisticEmbedding", "main"]


def _clipping_quartile(x: np.ndarray, alpha: float = 1.5,
                       test_mode: bool = False) -> np.ndarray:
  x = x.astype("float32")
  q1, q3 = np.percentile(x, 25), np.percentile(x, 75)
  iqr = q3 - q1
  low, high = q1 - alpha * iqr, q3 + alpha * iqr
  if test_mode:  # clamp (keeps alignment with the input rows)
    x = np.clip(x, low, high)
  else:  # drop (training-time)
    x = x[(low <= x) & (x <= high)]
  return x


def _log_norm(x: np.ndarray, scale_factor: float = 1e4) -> np.ndarray:
  x = x.astype("float32")
  s = np.sum(x)
  return np.log1p(x / (s + np.finfo(np.float32).eps) * scale_factor)


class _DummyGMM:
  """Mean-threshold fallback for degenerate fits (reference :89-102)."""

  def __init__(self):
    self.means_ = None
    self.precisions_ = None

  def fit(self, X):
    self.means_ = np.array([np.mean(X)])
    self.precisions_ = np.array([1.0 / max(np.var(X), 1e-12)])
    return self

  def predict(self, X):
    return (X >= self.means_[0]).astype(np.float32).ravel()

  def predict_proba(self, X):
    return self.predict(X)


class ProbabilisticEmbedding:
  """Per-feature GMM thresholding: binary and probabilistic labels."""

  def __init__(self,
               n_components_per_class: int = 2,
               positive_component: int = 1,
               log_norm: bool = True,
               clip_quartile: float = 0.0,
               remove_zeros: bool = True,
               ci_threshold: float = -0.68,
               random_state: int = 8,
               verbose: bool = False):
    assert positive_component > 0
    assert 0.0 <= abs(ci_threshold) <= 1.0
    self.n_components_per_class = int(n_components_per_class)
    self.positive_component = int(positive_component)
    self.log_norm = bool(log_norm)
    self.clip_quartile = float(clip_quartile)
    self.remove_zeros = bool(remove_zeros)
    self.ci_threshold = float(ci_threshold)
    self.random_state = random_state
    self.verbose = bool(verbose)
    self._models: List[Tuple[np.ndarray, object]] = []

  # ------------------------------------------------------------------ props
  @property
  def n_classes(self) -> int:
    return len(self._models)

  @staticmethod
  def _stack_ragged(cols: List[np.ndarray]) -> np.ndarray:
    """hstack per-feature component columns, NaN-padding features whose
    fit degenerated to the 1-component _DummyGMM fallback."""
    k = max(c.shape[0] for c in cols)
    cols = [np.pad(c, ((0, k - c.shape[0]), (0, 0)),
                   constant_values=np.nan) for c in cols]
    return np.hstack(cols)

  @property
  def means(self) -> np.ndarray:
    return self._stack_ragged([gmm.means_.ravel()[order][:, None]
                               for order, gmm in self._models])

  @property
  def precisions(self) -> np.ndarray:
    return self._stack_ragged([gmm.precisions_.ravel()[order][:, None]
                               for order, gmm in self._models])

  # ------------------------------------------------------------------- core
  def normalize(self, x: np.ndarray, test_mode: bool = False) -> np.ndarray:
    if x.ndim > 1:
      x = x.ravel()
    n = len(x)
    assert np.all(x >= 0), "Only support non-negative values"
    if self.remove_zeros and not test_mode:
      x = x[x > 0]
      if len(x) != n:  # keep a single zero as anchor
        x = np.concatenate([[0], x], axis=0)
    if self.clip_quartile > 0:
      x = _clipping_quartile(x, alpha=self.clip_quartile, test_mode=test_mode)
    if self.log_norm:
      x = _log_norm(x)
    return x

  def fit(self, X: np.ndarray) -> "ProbabilisticEmbedding":
    from sklearn.mixture import GaussianMixture
    assert X.ndim == 2, f"Expect a matrix, given: {X.shape}"
    self._models = []  # sklearn refit semantics: fit() resets prior state
    for i in range(X.shape[1]):
      x_train = self.normalize(X[:, i], test_mode=False)
      try:
        if len(x_train) < 2 * self.n_components_per_class:
          raise ValueError("too few samples for a GMM fit")
        gmm = GaussianMixture(n_components=self.n_components_per_class,
                              covariance_type="diag", init_params="kmeans",
                              n_init=8, max_iter=120,
                              random_state=self.random_state)
        gmm.fit(x_train[:, None])
      except ValueError:
        # any degenerate column (all-zero → 1 anchor sample, constant
        # values → ill-defined covariance, …) → mean-threshold fallback
        gmm = _DummyGMM().fit(x_train[:, None])
      order = np.argsort(np.asarray(gmm.means_).ravel())
      self._models.append((order, gmm))
    return self

  def fit_transform(self, X, return_probabilities: bool = True) -> np.ndarray:
    self.fit(X)
    return self.predict_proba(X) if return_probabilities else self.predict(X)

  def _predict(self, X: np.ndarray, threshold: Optional[float]) -> np.ndarray:
    assert X.shape[1] == self.n_classes, "Number of classes mismatch"
    cols = []
    for i, (order, gmm) in enumerate(self._models):
      x_test = self.normalize(X[:, i], test_mode=True)
      if isinstance(gmm, _DummyGMM):
        out = gmm.predict(x_test)
      elif threshold is not None:
        pos = order[self.positive_component]
        ci = stats.norm.interval(
            abs(threshold),
            loc=gmm.means_.ravel()[pos],
            scale=np.sqrt(1.0 / gmm.precisions_.ravel()[pos]))
        cut = ci[0] if threshold < 0 else ci[1]
        out = (x_test >= cut).astype("float32")
      else:
        probas = gmm.predict_proba(x_test[:, None]).T[order]
        out = np.mean(probas[self.positive_component:], axis=0)
      cols.append(out[:, None])
    return np.concatenate(cols, axis=1)

  def predict(self, X: np.ndarray) -> np.ndarray:
    """Binary labels via CI thresholding."""
    return self._predict(X, threshold=self.ci_threshold)

  def predict_proba(self, X: np.ndarray) -> np.ndarray:
    """Probabilistic labels: positive-component responsibilities."""
    return self._predict(X, threshold=None)

  def score_samples(self, X: np.ndarray) -> np.ndarray:
    scores = []
    for x, (order, gmm) in zip(X.T, self._models):
      x = self.normalize(x, test_mode=True)
      if isinstance(gmm, _DummyGMM):
        s = -0.5 * (x - gmm.means_[0]) ** 2 * gmm.precisions_[0]
      else:
        s = gmm.score_samples(x[:, None])
      scores.append(np.asarray(s).ravel()[:, None])
    return np.mean(np.hstack(scores), axis=1)

  def score(self, X, y=None) -> float:
    return float(self.score_samples(X).mean())

  # ----------------------------------------------------------------- figures
  def plot_distribution(self, X: np.ndarray, labels=None, path=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    n = X.shape[1]
    labels = labels if labels is not None else [f"#{i}" for i in range(n)]
    ncol = min(4, n)
    nrow = int(np.ceil(n / ncol))
    fig, axes = plt.subplots(nrow, ncol, figsize=(4 * ncol, 3 * nrow),
                             squeeze=False)
    ybin = self.predict(X)
    for i in range(n):
      ax = axes[i // ncol][i % ncol]
      x = self.normalize(X[:, i], test_mode=True)
      ax.hist(x, bins=80, density=True, alpha=0.6)
      ax.hist(x[ybin[:, i] > 0.5], bins=80, density=True, alpha=0.4)
      ax.set_title(str(labels[i]), fontsize=8)
    fig.tight_layout()
    if path:
      fig.savefig(path, dpi=120)
      plt.close(fig)
    return fig

  plot_diagnosis = plot_distribution  # diagnostic alias

  def boxplot(self, X: np.ndarray, labels=None, path=None):
    """Per-feature three-panel boxplots — original / nonzeros / normalized —
    the fitting diagnostics of the reference (label_threshold.py:420-466)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    X = np.atleast_2d(np.asarray(X, np.float64))
    if X.shape[0] == 1:
      X = X.T
    n = X.shape[1]
    labels = labels if labels is not None else [f"#{i}" for i in range(n)]
    style = dict(whis=1.5, flierprops={"marker": ".", "markersize": 8},
                 showmeans=True, meanline=True)
    fig, axes = plt.subplots(n, 3, figsize=(4.5, 3 * n), squeeze=False)
    for i, (x, name) in enumerate(zip(X.T, labels)):
      axes[i][0].boxplot(x, tick_labels=["Original"], **style)
      axes[i][0].set_ylabel(str(name))
      nz = x[x > 0]
      axes[i][1].boxplot(nz if nz.size else x, tick_labels=["NonZeros"],
                         **style)
      axes[i][2].boxplot(self.normalize(x, test_mode=False),
                         tick_labels=["Normalized"], **style)
    fig.tight_layout()
    if path:
      fig.savefig(path, dpi=120)
      plt.close(fig)
    return fig

  # -------------------------------------------------------------------- io
  def save(self, path: str):
    with open(path, "wb") as f:
      pickle.dump(self, f)

  @staticmethod
  def load(path: str) -> "ProbabilisticEmbedding":
    with open(path, "rb") as f:
      return pickle.load(f)


# ---------------------------------------------------------------------------
# CLI (bin/sisua-embed equivalent; reference :472-583)
# ---------------------------------------------------------------------------
def main(argv=None):
  import argparse
  p = argparse.ArgumentParser(
      "sisua-embed", description="GMM probabilistic embedding of protein "
      "labels: dataset name or CSV → y_bin / y_prob pickles + figures")
  p.add_argument("input", help="dataset name (registry) or CSV path")
  p.add_argument("-o", "--outpath", default="/tmp/sisua_embed")
  p.add_argument("--ci", type=float, default=-0.68)
  p.add_argument("--components", type=int, default=2)
  p.add_argument("--no-figures", action="store_true")
  args = p.parse_args(argv)

  if os.path.isfile(args.input):
    import pandas as pd
    from .utils.io_utils import load_data_from_csv
    df = load_data_from_csv(args.input)
    X, names = df.values, list(df.columns)
  else:
    from .data import get_dataset
    sco = get_dataset(args.input)
    from .data.const import OMIC
    assert "proteomic" in sco.omics, f"{args.input} has no proteomic omic"
    X = sco.numpy(OMIC.proteomic)
    names = list(sco.get_var_names(OMIC.proteomic))

  pe = ProbabilisticEmbedding(n_components_per_class=args.components,
                              ci_threshold=args.ci)
  pe.fit(X)
  os.makedirs(args.outpath, exist_ok=True)
  with open(os.path.join(args.outpath, "y_bin"), "wb") as f:
    pickle.dump(pe.predict(X), f)
  with open(os.path.join(args.outpath, "y_prob"), "wb") as f:
    pickle.dump(pe.predict_proba(X), f)
  pe.save(os.path.join(args.outpath, "model.pkl"))
  if not args.no_figures:
    pe.plot_distribution(X, labels=names,
                         path=os.path.join(args.outpath, "distribution.png"))
  print(f"Saved y_bin, y_prob, model.pkl to {args.outpath}")


if __name__ == "__main__":
  main()
