"""Training-time metric callbacks (computed every ``freq`` epochs).

Capability parity with ``/root/reference/sisua/analysis/sc_metrics.py``:
a base ``SingleCellMetric`` callback that (1) caches a corrupted copy of the
eval dataset, (2) runs model prediction, (3) delegates to ``call()`` and
injects the returned scalars into the epoch logs — plus the four concrete
metrics ``NegativeLogLikelihood`` (:215-241), ``ImputationError`` (:244-284),
``CorrelationScores`` (:287-348) and ``ClusteringScores`` (:351-402).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..data.const import OMIC
from ..train.trainer import TrainingCallback
from .imputation import (correlation_scores, imputation_mean_score,
                         imputation_score)
from .latent import clustering_scores

__all__ = [
    "SingleCellMetric", "NegativeLogLikelihood", "ImputationError",
    "CorrelationScores", "ClusteringScores",
]


class SingleCellMetric(TrainingCallback):
  """Base callback: corrupt-once, predict every ``freq`` epochs, score."""

  def __init__(self, extras=None, sco=None, freq: int = 3,
               dropout_rate: float = 0.2, retain_rate: float = 0.2,
               sample_shape: int = 2, batch_size: int = 256,
               name: Optional[str] = None, verbose: bool = False):
    self.sco = sco
    self.extras = extras
    self.freq = int(freq)
    self.dropout_rate = float(dropout_rate)
    self.retain_rate = float(retain_rate)
    self.sample_shape = int(sample_shape)
    self.batch_size = int(batch_size)
    self.verbose = verbose
    self._name = name or type(self).__name__
    self._corrupted = None

  @property
  def name(self):
    return self._name

  def _prepare(self):
    if self._corrupted is None:
      self._corrupted = self.sco.corrupt(dropout_rate=self.dropout_rate,
                                         retain_rate=self.retain_rate,
                                         inplace=False)
    return self._corrupted

  def call(self, y_true, pX, qZ) -> Dict[str, float]:
    raise NotImplementedError

  def on_epoch_end(self, epoch: int, logs: Dict):
    if self.sco is None or (epoch % self.freq) != 0:
      return
    cor = self._prepare()
    pX, qZ = self.model.predict(cor, sample_shape=(self.sample_shape,),
                                batch_size=self.batch_size)
    y_true = [self.sco.numpy(o)
              for o in list(self.sco.omics)[: self.model.n_outputs]]
    scores = self.call(y_true, pX, qZ)
    for k, v in scores.items():
      logs[f"{self.name}_{k}" if k else self.name] = float(v)
    if self.verbose:
      print(f"[{self.name}] epoch {epoch}:",
            {k: round(float(v), 4) for k, v in scores.items()})


def _first(x):
  return x[0] if isinstance(x, (tuple, list)) else x


def _mc_mean(dist) -> np.ndarray:
  m = np.asarray(dist.mean())
  if m.ndim > 2:
    m = m.mean(axis=tuple(range(m.ndim - 2)))
  return m


class NegativeLogLikelihood(SingleCellMetric):
  """-log p(x_true | x_corrupted) per output (reference :215-241)."""

  def call(self, y_true, pX, qZ):
    from scipy.special import logsumexp
    pX = pX if isinstance(pX, (tuple, list)) else (pX,)
    out = {}
    for i, (x, dist) in enumerate(zip(y_true, pX)):
      lp = np.asarray(dist.log_prob(x))
      if lp.ndim > 1:
        lp = logsumexp(lp, 0) - np.log(lp.shape[0])
      out[f"nllk{i}" if i else "nllk"] = -float(lp.mean())
    return out


class ImputationError(SingleCellMetric):
  """Median/mean imputation error on the main omic (reference :244-284)."""

  def call(self, y_true, pX, qZ):
    from .posterior import _unwrap_imputed
    dist = _first(pX)
    imp = _mc_mean(_unwrap_imputed(dist))
    org = y_true[0]
    cor = self._prepare().numpy(list(self.sco.omics)[0])
    return {"med": imputation_score(org, imp),
            "mean": imputation_mean_score(org, cor, imp)}


class CorrelationScores(SingleCellMetric):
  """Marker gene↔protein spearman/pearson on imputed RNA (:287-348)."""

  def call(self, y_true, pX, qZ):
    from .posterior import _unwrap_imputed
    assert "proteomic" in self.sco.omics, \
        "CorrelationScores requires a proteomic omic"
    imp = _mc_mean(_unwrap_imputed(_first(pX)))
    corr = correlation_scores(
        imp, self.sco.numpy(OMIC.proteomic),
        self.sco.get_var_names(list(self.sco.omics)[0]),
        self.sco.get_var_names(OMIC.proteomic))
    if not corr:
      return {}
    return {"spearman": float(np.mean([v[0] for v in corr.values()])),
            "pearson": float(np.mean([v[1] for v in corr.values()]))}


class ClusteringScores(SingleCellMetric):
  """ASW/ARI/NMI/UCA of latents vs a label omic (:351-402)."""

  def __init__(self, label_omic: Optional[str] = None, **kwargs):
    super().__init__(**kwargs)
    self.label_omic = label_omic

  def call(self, y_true, pX, qZ):
    label_omic = self.label_omic
    if label_omic is None:
      for cand in ("celltype", "disease", "progenitor"):
        if cand in self.sco.omics:
          label_omic = cand
          break
    if label_omic is None:
      return {}
    labels = np.argmax(self.sco.numpy(label_omic), 1)
    z = _first(qZ)
    return clustering_scores(np.asarray(z.mean()), labels)
