"""Posterior — the evaluation hub: corrupt → predict → score → plot.

Capability parity with ``/root/reference/sisua/analysis/posterior.py``
(1153 LoC): construct from a trained model + a test ``SingleCellOMIC`` with
≥1 omic; corrupt a copy with the benchmark protocol (dropout 0.2 / retain
0.2, binomial — :108-164); run MCMC prediction (sample_shape=10, :172-182);
build an *analysis dataset* containing, per output omic,

  * ``i<omic>``  — imputed posterior means (ZeroInflated unwrapped to its
    count distribution, the 'imputed' convention of :210-220),
  * ``o<omic>``  — the original uncorrupted counts,
  * ``latent``   — reduced latent means (:243-253),

plus a ``Criticizer`` per factor (label) omic (:166-170, 304-375).

Metric families (cached):
  * ``cal_llk``            4-way imputed/reconstructed × original/corrupted
                           log-likelihood with logsumexp MC averaging (:918-938)
  * ``cal_marginal_llk``   importance-sampled marginal LLK (:940-976)
  * ``cal_imputation_scores`` (:978-993)
  * ``cal_pearson / cal_spearman / cal_mutual_information / cal_importance``
                           marker gene↔protein association (:995-1080)
  * ``cal_betavae / cal_factorvae / cal_mig / cal_dci`` (:1082-1127)
  * ``get_correlation_matrix`` (:855-916)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import dist as D
from ..data.const import OMIC
from ..utils.visualization import Visualizer
from .criticizer import Criticizer
from .imputation import (correlation_scores, imputation_mean_score,
                         imputation_score, imputation_std_score,
                         plot_imputation)
from .latent import (clustering_scores, plot_distance_heatmap,
                     plot_latents_binary, plot_latents_protein_pairs,
                     streamline_classifier)

__all__ = ["Posterior"]

_FACTOR_OMICS = ("proteomic", "celltype", "disease", "progenitor", "tissue")


def _dist_mean(dist) -> np.ndarray:
  m = np.asarray(dist.mean())
  if m.ndim > 2:  # average MC sample dims
    m = m.mean(axis=tuple(range(m.ndim - 2)))
  return m


def _unwrap_imputed(dist):
  """ZeroInflated → count distribution mean (reference :210-220)."""
  base = dist.base if isinstance(dist, D.Independent) else dist
  if isinstance(base, D.ZeroInflated):
    return base.count_distribution
  return base


class Posterior(Visualizer):
  """Posterior analysis of a trained SingleCellModel on a test set."""

  def __init__(self,
               scm,
               sco,
               dropout_rate: float = 0.2,
               retain_rate: float = 0.2,
               corruption_distribution: str = "binomial",
               sample_shape: int = 10,
               batch_size: int = 256,
               seed: int = 8,
               device_cache: bool = False,
               mesh=None,
               verbose: bool = False):
    self.scm = scm
    self.sco_original = sco
    self.sample_shape = int(sample_shape)
    self.batch_size = int(batch_size)
    self.mesh = mesh
    # mesh implies the one-executable device paths (cells shard over 'data')
    self.device_cache = bool(device_cache) or mesh is not None
    self.verbose = bool(verbose)
    self.seed = int(seed)
    self._cache: Dict[str, object] = {}
    # --- corruption of the main omic (denoising benchmark)
    self.dropout_rate = float(dropout_rate)
    self.retain_rate = float(retain_rate)
    self.corruption_distribution = corruption_distribution
    self.sco_corrupted = sco.corrupt(
        dropout_rate=dropout_rate, retain_rate=retain_rate,
        distribution=corruption_distribution, inplace=False, seed=seed)
    self._initialize()

  # ------------------------------------------------------------------ build
  def _initialize(self):
    scm, sco = self.scm, self.sco_corrupted
    # pair model output heads with dataset omics BY NAME when possible —
    # the same rule fit/predict use (models/base.py::_to_feeder); a
    # positional zip mis-scores every head when the container's omic
    # order differs from the model's output order (e.g. h5ad round-trip)
    avail = set(sco.omics)
    rv_names = [rv.name for rv in scm.outputs]
    if all(n in avail for n in rv_names):
      omics = list(rv_names)
    else:
      omics = list(sco.omics)[: scm.n_outputs]
    self.output_omics = omics
    # predictions on corrupted and original data
    self.pX_cor, self.qZ_cor = scm.predict(
        sco, sample_shape=(self.sample_shape,), batch_size=self.batch_size,
        device_cache=self.device_cache, mesh=self.mesh)
    self.pX_org, self.qZ_org = scm.predict(
        self.sco_original, sample_shape=(self.sample_shape,),
        batch_size=self.batch_size, device_cache=self.device_cache,
        mesh=self.mesh)
    pX = self.pX_cor if isinstance(self.pX_cor, (tuple, list)) \
        else (self.pX_cor,)
    qZ = self.qZ_cor if isinstance(self.qZ_cor, (tuple, list)) \
        else (self.qZ_cor,)
    # --- analysis dataset: imputed + original omics + latent
    ana = self.sco_original.copy()
    for omic_name, dist in zip(omics, pX):
      imputed_mean = _dist_mean(_unwrap_imputed(dist))
      var_names = self.sco_original.get_var_names(omic_name)
      try:
        ana.add_omic(OMIC.parse(f"i{omic_name}"), imputed_mean, var_names)
      except ValueError:  # omic kind without an imputed mirror
        pass
    # reduced latent means
    zmeans = [np.asarray(q.mean()) for q in qZ]
    latent = np.concatenate(zmeans, -1) if len(zmeans) > 1 else zmeans[0]
    ana.add_omic(OMIC.latent, latent,
                 [f"z{i}" for i in range(latent.shape[1])])
    self.sco_analysis = ana
    self.latents = latent
    # --- criticizers per factor omic
    self.criticizers: Dict[str, Criticizer] = {}
    for f in self.factor_omics:
      self.criticizers[f] = Criticizer(
          latent, self.sco_original.numpy(f),
          factor_names=list(self.sco_original.get_var_names(f)),
          seed=self.seed)

  # -------------------------------------------------------------- properties
  @property
  def name(self) -> str:
    return getattr(self, "_name", None) or \
        f"{self.scm.id}_{self.sco_original.name}"

  @name.setter
  def name(self, value: str):
    # ResultsSheet dedupes colliding posterior names (two runs of the same
    # architecture on the same dataset would otherwise collapse to one row)
    self._name = str(value)

  @property
  def dataset(self):
    """The enriched analysis dataset: original omics + imputed mirrors +
    latent omic (the reference Posterior's ``dataset``, :394-396)."""
    return self.sco_analysis

  @property
  def n_latents(self) -> int:
    return int(self.latents.shape[1])

  @property
  def n_outputs(self) -> int:
    return len(self.output_omics)

  # ------------------------------------------------------------ data access
  def get_data(self, omic, data_type: str = "auto"):
    """Extract an array or predicted distribution (reference :274-302).

    data_type one of {'imputed', 'original', 'corrupted', 'reconstructed',
    'auto'} (or a list; first found wins): 'imputed' = prediction from the
    corrupted input, 'reconstructed' = prediction from the original input,
    'original'/'corrupted' = the raw arrays. For the latent omic,
    'corrupted'/'auto' is the posterior on corrupted data."""
    omic = OMIC.parse(omic).name
    dists_cor = self.pX_cor if isinstance(self.pX_cor, (tuple, list)) \
        else (self.pX_cor,)
    dists_org = self.pX_org if isinstance(self.pX_org, (tuple, list)) \
        else (self.pX_org,)
    types = [data_type] if isinstance(data_type, str) else list(data_type)
    for dtype in [str(t).lower().strip() for t in types]:
      if omic == "latent":
        if dtype in ("corrupted", "imputed", "auto"):
          return self.qZ_cor
        if dtype in ("original", "reconstructed"):
          return self.qZ_org
        continue
      if dtype in ("imputed", "reconstructed"):
        dists = dists_cor if dtype == "imputed" else dists_org
        for name, d in zip(self.output_omics, dists):
          if name == omic:
            return d
      elif dtype == "original" and omic in self.sco_original.omics:
        return self.sco_original.numpy(omic)
      elif dtype == "corrupted" and omic in self.sco_corrupted.omics:
        return self.sco_corrupted.numpy(omic)
      elif dtype == "auto":
        if omic in self.sco_analysis.omics:
          return self.sco_analysis.numpy(omic)
        for name, d in zip(self.output_omics, dists_cor):
          if f"i{name}" == omic:
            return d
    raise ValueError(
        f"No data found for OMIC: {omic}-{data_type}; outputs="
        f"{self.output_omics}, omics={list(self.sco_analysis.omics)}")

  def get_criticizer(self, factor_omic: str = "proteomic") -> Criticizer:
    """The per-factor-omic Criticizer (reference :304-376); built in
    ``_initialize`` for every factor omic, created on demand otherwise —
    including for IMPUTED factor omics (``i<omic>``, values from the
    analysis dataset), the reference's imputed-variant criticizers
    (posterior.py:166-170)."""
    factor_omic = OMIC.parse(factor_omic).name
    if factor_omic not in self.criticizers:
      if factor_omic in self.sco_original.omics:
        src = self.sco_original
      else:
        assert factor_omic in self.sco_analysis.omics, \
            (f"No omic {factor_omic} in {list(self.sco_original.omics)} "
             f"or {list(self.sco_analysis.omics)}")
        src = self.sco_analysis
      self.criticizers[factor_omic] = Criticizer(
          self.latents, src.numpy(factor_omic),
          factor_names=list(src.get_var_names(factor_omic)),
          seed=self.seed)
    return self.criticizers[factor_omic]

  def get_marker_pairs(self, omic1="transcriptomic", omic2="proteomic",
                       var_names1=None, var_names2=None,
                       remove_duplicated: bool = True):
    """Marker pairs of the analysis dataset (reference :258-272)."""
    return self.sco_analysis.get_marker_pairs(
        omic1, omic2, var_names1, var_names2,
        remove_duplicated=remove_duplicated)

  @property
  def main_omic(self) -> str:
    return self.output_omics[0]

  @property
  def factor_omics(self) -> List[str]:
    return [o for o in self.sco_original.omics if o in _FACTOR_OMICS]

  @property
  def is_semi_supervised(self) -> bool:
    return self.scm.is_semi_supervised

  # ------------------------------------------------------------------- LLK
  def cal_llk(self) -> Dict[str, float]:
    """4-way log-likelihood: {imputed|reconstructed} × {original|corrupted};
    MC samples averaged with logsumexp − log S (reference :918-938)."""
    if "llk" in self._cache:
      return self._cache["llk"]
    if self.device_cache:
      out = self._cal_llk_on_device()
      self._cache["llk"] = out
      return out
    from scipy.special import logsumexp
    out = {}
    S = self.sample_shape
    for tag, pX in (("cor", self.pX_cor), ("org", self.pX_org)):
      dists = pX if isinstance(pX, (tuple, list)) else (pX,)
      for omic_name, dist in zip(self.output_omics, dists):
        x_org = self.sco_original.numpy(omic_name)
        x_cor = self.sco_corrupted.numpy(omic_name)
        for data_tag, x in (("org", x_org), ("cor", x_cor)):
          lp = np.asarray(dist.log_prob(x))          # (S, n)
          if lp.ndim > 1:
            lp = logsumexp(lp, axis=0) - np.log(S)
          out[f"llk_{omic_name}_pred{tag}_data{data_tag}"] = float(lp.mean())
    self._cache["llk"] = out
    return out

  def _cal_llk_on_device(self) -> Dict[str, float]:
    """device_cache variant of cal_llk: the 4-way LLK computes inside one
    executable per prediction source — no distribution params ship to the
    host (``SingleCellModel.compute_llk``)."""
    targets = {
        "dataorg": [self.sco_original.numpy(o) for o in self.output_omics],
        "datacor": [self.sco_corrupted.numpy(o) for o in self.output_omics],
    }
    out: Dict[str, float] = {}
    for tag, source in (("cor", self.sco_corrupted),
                        ("org", self.sco_original)):
      vals = self.scm.compute_llk(source, targets,
                                  sample_shape=(self.sample_shape,),
                                  batch_size=self.batch_size,
                                  mesh=self.mesh)
      for key, v in vals.items():
        data_tag, output_i = key.split("_output")
        omic_name = self.output_omics[int(output_i)]
        out[f"llk_{omic_name}_pred{tag}_{data_tag}"] = v
    return out

  def cal_marginal_llk(self, sample_shape: int = 100) -> Dict[str, float]:
    """Importance-sampled marginal log-likelihood (reference :940-976)."""
    key = f"marginal_llk_{int(sample_shape)}"
    if key in self._cache:
      return self._cache[key]
    mllk = self.scm.marginal_log_prob(self.sco_original,
                                      sample_shape=sample_shape,
                                      batch_size=8)
    out = {f"marginal_llk_{self.main_omic}": float(np.mean(mllk))}
    self._cache[key] = out
    return out

  # -------------------------------------------------------------- imputation
  def cal_imputation_scores(self) -> Dict[str, float]:
    """Denoising scores on the main omic (reference :978-993)."""
    if "imputation" in self._cache:
      return self._cache["imputation"]
    org = self.sco_original.numpy(self.main_omic)
    cor = self.sco_corrupted.numpy(self.main_omic)
    imp = self.sco_analysis.numpy(f"i{self.main_omic}")
    out = {
        "imputation_med": imputation_score(org, imp),
        "imputation_mean": imputation_mean_score(org, cor, imp),
        "imputation_std": imputation_std_score(org, cor, imp),
    }
    self._cache["imputation"] = out
    return out

  # ------------------------------------------------------------ correlation
  def _marker_correlations(self, imputed: bool = True):
    key = f"marker_corr_{imputed}"
    if key not in self._cache:
      if "proteomic" not in self.sco_original.omics:
        self._cache[key] = {}
      else:
        X = (self.sco_analysis.numpy(f"i{self.main_omic}") if imputed
             else self.sco_original.numpy(self.main_omic))
        y = self.sco_original.numpy("proteomic")
        self._cache[key] = correlation_scores(
            X, y, self.sco_original.get_var_names(self.main_omic),
            self.sco_original.get_var_names("proteomic"))
    return self._cache[key]

  def cal_spearman(self, imputed: bool = True) -> Dict[str, float]:
    corr = self._marker_correlations(imputed)
    out = {f"spearman_{k}": v[0] for k, v in corr.items()}
    if corr:
      out["spearman_mean"] = float(np.mean([v[0] for v in corr.values()]))
    return out

  def cal_pearson(self, imputed: bool = True) -> Dict[str, float]:
    corr = self._marker_correlations(imputed)
    out = {f"pearson_{k}": v[1] for k, v in corr.items()}
    if corr:
      out["pearson_mean"] = float(np.mean([v[1] for v in corr.values()]))
    return out

  def cal_protein_prediction(self) -> Dict[str, float]:
    """Direct protein prediction (semi-supervised models only): per-protein
    pearson/spearman of the model's imputed proteomic posterior mean
    (``iproteomic``) against the TRUE antibody counts — the reference's
    core SISUA-vs-unsupervised claim, evaluable only for models with a
    protein output head."""
    if "protein_pred" in self._cache:
      return self._cache["protein_pred"]
    if ("proteomic" not in self.sco_original.omics
        or "iproteomic" not in self.sco_analysis.omics):
      self._cache["protein_pred"] = {}
      return {}
    from scipy import stats as sp_stats
    y = self.sco_original.numpy("proteomic")
    yhat = self.sco_analysis.numpy("iproteomic")
    names = self.sco_original.get_var_names("proteomic")
    out: Dict[str, float] = {}
    pear, spear = [], []
    for j, nm in enumerate(names):
      if np.std(y[:, j]) == 0 or np.std(yhat[:, j]) == 0:
        continue
      p = float(sp_stats.pearsonr(yhat[:, j], y[:, j])[0])
      s = float(sp_stats.spearmanr(yhat[:, j], y[:, j])[0])
      out[f"protein_pearson_{nm}"] = p
      out[f"protein_spearman_{nm}"] = s
      pear.append(p)
      spear.append(s)
    if pear:
      out["protein_pearson_mean"] = float(np.mean(pear))
      out["protein_spearman_mean"] = float(np.mean(spear))
    self._cache["protein_pred"] = out
    return out

  def cal_mutual_information(self, factor_omic: str = "proteomic"
                             ) -> Dict[str, float]:
    crt = self.criticizers.get(factor_omic)
    if crt is None:
      return {}
    mi = crt.create_mutualinfo_matrix()
    return {f"mi_{factor_omic}": float(mi.max(0).mean())}

  def cal_importance(self, factor_omic: str = "proteomic"
                     ) -> Dict[str, float]:
    crt = self.criticizers.get(factor_omic)
    if crt is None:
      return {}
    imp, acc = crt.create_importance_matrix()
    return {f"importance_acc_{factor_omic}": float(np.mean(acc))}

  def get_correlation_matrix(self, method: str = "spearman",
                             factor_omic: str = "proteomic") -> np.ndarray:
    crt = self.criticizers.get(factor_omic)
    assert crt is not None, f"no criticizer for {factor_omic}"
    if method in ("spearman", "pearson"):
      return crt.create_correlation_matrix(method)
    if method in ("mutual_info", "mi"):
      return crt.create_mutualinfo_matrix()
    if method in ("importance", "average", "lasso"):
      return crt.create_importance_matrix()[0]
    raise ValueError(f"unknown method {method}")

  # -------------------------------------------------------- disentanglement
  def _crt_metric(self, fn_name: str) -> Dict[str, float]:
    out = {}
    for f, crt in self.criticizers.items():
      for k, v in getattr(crt, fn_name)().items():
        out[f"{k}_{f}"] = v
    return out

  def cal_betavae(self) -> Dict[str, float]:
    return self._crt_metric("cal_betavae_score")

  def cal_factorvae(self) -> Dict[str, float]:
    return self._crt_metric("cal_factorvae_score")

  def cal_mig(self) -> Dict[str, float]:
    return self._crt_metric("cal_mutual_info_gap")

  def cal_dci(self) -> Dict[str, float]:
    return self._crt_metric("cal_dci_scores")

  def cal_clustering_scores(self) -> Dict[str, float]:
    return self._crt_metric("cal_clustering_scores")

  def cal_disentanglement_full(self) -> Dict[str, float]:
    return self._crt_metric("cal_all_scores")

  # ------------------------------------------------------------ classifier
  def cal_protein_classification(self) -> Dict[str, float]:
    """Per-protein F1 from latents (streamline_classifier protocol)."""
    if "proteomic" not in self.sco_original.omics:
      return {}
    if "protein_f1" in self._cache:
      return self._cache["protein_f1"]
    _, _, ybin = self.sco_original.probabilistic_embedding("proteomic")
    n = len(self.latents)
    cut = int(0.8 * n)
    rng = np.random.RandomState(self.seed)
    idx = rng.permutation(n)
    tr, te = idx[:cut], idx[cut:]
    train_s, test_s = streamline_classifier(
        self.latents[tr], ybin[tr], self.latents[te], ybin[te],
        self.sco_original.get_var_names("proteomic"))
    out = {f"f1_{k}": v for k, v in test_s.items()}
    self._cache["protein_f1"] = out
    return out

  def save_scores(self, path: Optional[str] = None) -> Dict[str, float]:
    """All scalar metric families in one dict (optionally JSON-dumped)."""
    scores = {}
    for fn in (self.cal_llk, self.cal_imputation_scores, self.cal_spearman,
               self.cal_pearson, self.cal_protein_prediction,
               self.cal_mutual_information,
               self.cal_protein_classification, self.cal_mig, self.cal_dci,
               self.cal_clustering_scores):
      try:
        scores.update(fn())
      except Exception as e:  # metric families degrade independently
        if self.verbose:
          print(f"[posterior] {fn.__name__} failed: {e}")
    if path is not None:
      import json
      with open(path, "w") as f:
        json.dump(scores, f, indent=2)
    return scores

  # ----------------------------------------------------------------- plots
  def plot_scatter(self, color_by: Optional[str] = None, algo: str = "tsne"):
    """Latent embedding scatter colored by a factor omic — including the
    IMPUTED factors (``i<omic>``, present on the analysis dataset), matching
    the reference grid ``scatter_latent_{factor|ifactor}_{tsne|umap}``
    (evaluate.py:106-119)."""
    color_by = color_by or (self.factor_omics[0] if self.factor_omics
                            else None)
    if color_by is None:
      tag = "none"
    else:
      try:
        tag = OMIC.parse(color_by).name
      except ValueError:
        tag = str(color_by)  # obs column / clustering key (visualizer
        # resolves these through its first _process_omics branch)
    self.sco_analysis.plot_scatter(X=OMIC.latent, color_by=color_by,
                                   algo=algo,
                                   title=f"{self.name}_latent_{tag}_{algo}")
    self.figures.update(self.sco_analysis.figures)
    self.sco_analysis.figures.clear()
    return self

  def plot_imputation_scatter(self):
    org = self.sco_original.numpy(self.main_omic)
    imp = self.sco_analysis.numpy(f"i{self.main_omic}")
    self.add_figure(f"{self.name}_imputation",
                    plot_imputation(org, imp, title=self.name))
    return self

  def plot_distance_heatmap(self, factor_omic: Optional[str] = None,
                            omic: Optional[str] = None):
    """Group-centroid distance heatmap. ``omic=None`` → latent space (the
    round-1 behavior); an omic name (``transcriptomic`` /
    ``itranscriptomic``) → distances in that omic's expression space,
    the reference's ``distheatmap_{omic}_{factor}`` grid
    (evaluate.py:133-139, posterior.py:532-552)."""
    factor_omic = factor_omic or (self.factor_omics[0]
                                  if self.factor_omics else None)
    if factor_omic is None:
      return self
    if omic is not None:
      if OMIC.parse(omic).name not in self.sco_analysis.omics:
        return self
      return self._delegate(
          "plot_distance_heatmap",
          rename=(f"{self.name}_distheatmap_{OMIC.parse(omic).name}_"
                  f"{OMIC.parse(factor_omic).name}"),
          X=omic, group_by=factor_omic)
    labels = np.argmax(self.sco_original.numpy(factor_omic), 1)
    names = self.sco_original.get_var_names(factor_omic)
    self.add_figure(
        f"{self.name}_distance_{factor_omic}",
        plot_distance_heatmap(self.latents, np.asarray(names)[labels],
                              title=self.name))
    return self

  def plot_correlation_matrix(self, method: str = "spearman",
                              factor_omic: str = "proteomic",
                              omic1: Optional[str] = None):
    """Correlation heatmap. ``omic1=None`` → latent × factor (round-1
    behavior, methods spearman/pearson/mi/importance). An omic name
    (``transcriptomic`` / ``itranscriptomic``) → marker-pair correlation
    between that omic's genes and the factor omic, the reference's
    ``{spearman|pearson|mutual_information}_{omic1}_{omic2}`` grid
    (evaluate.py:141-152, posterior.py:554-589)."""
    if omic1 is not None:
      o1 = OMIC.parse(omic1).name
      f = OMIC.parse(factor_omic).name
      if o1 not in self.sco_analysis.omics or f not in self.sco_analysis.omics:
        return self
      delegate = {"spearman": "plot_spearman_matrix",
                  "pearson": "plot_pearson_matrix",
                  "mi": "plot_mutual_information",
                  "mutual_information": "plot_mutual_information"}[method]
      return self._delegate(delegate,
                            rename=f"{self.name}_{method}_{o1}_{f}",
                            omic1=o1, omic2=f)
    if factor_omic not in self.criticizers:
      return self
    import matplotlib.pyplot as plt
    m = self.get_correlation_matrix(method, factor_omic)
    fig, ax = plt.subplots(figsize=(8, 5))
    vmax = np.abs(m).max() or 1.0
    im = ax.imshow(m, aspect="auto", cmap="coolwarm", vmin=-vmax, vmax=vmax)
    ax.set_xlabel(factor_omic)
    ax.set_ylabel("latent dim")
    ax.set_xticks(range(m.shape[1]))
    ax.set_xticklabels(self.sco_original.get_var_names(factor_omic),
                       rotation=90, fontsize=6)
    ax.set_title(f"{method} latent×{factor_omic}")
    fig.colorbar(im, ax=ax)
    self.add_figure(f"{self.name}_{method}_{factor_omic}", fig)
    return self

  def plot_latents_protein_pairs(self):
    if "proteomic" not in self.sco_original.omics:
      return self
    fig = plot_latents_protein_pairs(
        self.latents, self.sco_original.numpy("proteomic"),
        self.sco_original.get_var_names("proteomic"), title=self.name)
    if fig is not None:
      self.add_figure(f"{self.name}_protein_pairs", fig)
    return self

  def plot_latents_binary(self):
    if "proteomic" not in self.sco_original.omics:
      return self
    _, _, ybin = self.sco_original.probabilistic_embedding("proteomic")
    self.add_figure(
        f"{self.name}_latent_binary",
        plot_latents_binary(self.latents, ybin,
                            self.sco_original.get_var_names("proteomic"),
                            title=self.name))
    return self

  def plot_learning_curves(self, summary_steps: int = 1):
    import matplotlib.pyplot as plt
    hist = self.scm.history
    if not hist:
      return self
    fig, ax = plt.subplots(figsize=(7, 4))
    for k in ("loss", "val_loss"):
      if k in hist:
        ax.plot(hist[k], label=k)
    ax.set_xlabel("epoch")
    ax.legend()
    ax.set_title(f"{self.name} learning curves")
    self.add_figure(f"{self.name}_learning_curves", fig)
    return self

  def plot_confusion_matrix(self, factor_omic: Optional[str] = None):
    factor_omic = factor_omic or ("celltype" if "celltype" in
                                  self.sco_original.omics else None)
    if factor_omic is None:
      return self
    import matplotlib.pyplot as plt
    true = np.argmax(self.sco_original.numpy(factor_omic), 1)
    ana = self.sco_analysis
    pred = ana.clustering(OMIC.latent, n_clusters=int(true.max() + 1),
                          algo="kmeans", matching_labels=factor_omic)
    k = int(max(true.max(), pred.max()) + 1)
    cm = np.zeros((k, k))
    for t, p in zip(true, pred):
      cm[t, p] += 1
    fig, ax = plt.subplots(figsize=(5, 5))
    im = ax.imshow(cm, cmap="Blues")
    ax.set_xlabel("cluster")
    ax.set_ylabel(factor_omic)
    fig.colorbar(im, ax=ax)
    self.add_figure(f"{self.name}_confusion_{factor_omic}", fig)
    return self

  def plot_disentanglement(self, factor_omic: Optional[str] = None):
    """Per-criticizer summary: |spearman| latent×factor heatmap + the full
    metric-suite bar chart (reference plot_disentanglement family)."""
    import matplotlib.pyplot as plt
    factors = ([factor_omic] if factor_omic is not None
               else list(self.criticizers))
    for f in factors:
      try:
        crt = self.get_criticizer(f)  # builds imputed-factor criticizers
      except (AssertionError, ValueError):
        continue
      m = np.abs(crt.create_correlation_matrix("spearman"))
      scores = crt.cal_all_scores()
      fig, axes = plt.subplots(1, 2, figsize=(12, 4),
                               gridspec_kw={"width_ratios": [1, 1.4]})
      im = axes[0].imshow(m, aspect="auto", cmap="viridis", vmin=0, vmax=1)
      axes[0].set_xlabel(f)
      axes[0].set_ylabel("latent dim")
      axes[0].set_title("|spearman| latent × factor")
      fig.colorbar(im, ax=axes[0])
      names = list(scores)
      axes[1].bar(range(len(names)), [scores[k] for k in names])
      axes[1].set_xticks(range(len(names)))
      axes[1].set_xticklabels(names, rotation=45, fontsize=7, ha="right")
      axes[1].set_title("disentanglement suite")
      fig.tight_layout()
      self.add_figure(f"{self.name}_disentanglement_{f}", fig)
    return self

  def _delegate(self, method: str, rename: Optional[str] = None, **kwargs):
    """Run a visualizer method on the analysis dataset and absorb its
    figures (optionally renamed with this posterior's tag)."""
    getattr(self.sco_analysis, method)(**kwargs)
    for k, fig in self.sco_analysis.figures.items():
      self.add_figure(rename or f"{self.name}_{k}", fig)
    self.sco_analysis.figures.clear()
    return self

  def plot_violins(self, omic: Optional[str] = None,
                   group_by: Optional[str] = None):
    """Marker-variable violins on the analysis dataset (imputed omic)."""
    omic = omic or f"i{self.main_omic}"
    group = group_by or (self.factor_omics[0] if self.factor_omics else None)
    if group is None or omic not in self.sco_analysis.omics:
      return self
    return self._delegate("plot_stacked_violins", X=omic, group_by=group)

  def plot_heatmap(self, omic: Optional[str] = None,
                   group_by: Optional[str] = None):
    """Grouped marker heatmap (original or imputed omic)."""
    omic = omic or f"i{self.main_omic}"
    group = group_by or (self.factor_omics[0] if self.factor_omics else None)
    if group is None or omic not in self.sco_analysis.omics:
      return self
    return self._delegate("plot_heatmap", X=omic, group_by=group)

  def plot_dendrogram(self, omic: Optional[str] = None,
                      group_by: Optional[str] = None):
    """Ward-linkage dendrogram heatmap of group centroids."""
    omic = omic or f"i{self.main_omic}"
    group = group_by or (self.factor_omics[0] if self.factor_omics else None)
    if group is None or omic not in self.sco_analysis.omics:
      return self
    return self._delegate(
        "plot_dendrogram_heatmap",
        rename=f"{self.name}_dendrogram_{omic}_{OMIC.parse(group).name}",
        X=omic, group_by=group)

  def plot_dotplot(self, omic: Optional[str] = None,
                   group_by: Optional[str] = None):
    omic = omic or f"i{self.main_omic}"
    group = group_by or (self.factor_omics[0] if self.factor_omics else None)
    if group is None or omic not in self.sco_analysis.omics:
      return self
    return self._delegate("plot_dotplot", X=omic, group_by=group)

  def plot_correlation_scatter(self, imputed: bool = True):
    """Top marker gene↔protein scatter pairs, on the original or the
    imputed transcriptome (reference plot_correlation_scatter grid)."""
    if "proteomic" not in self.sco_original.omics:
      return self
    omic1 = f"i{self.main_omic}" if imputed else self.main_omic
    if omic1 not in self.sco_analysis.omics:
      return self
    return self._delegate("plot_correlation_scatter", omic1=omic1,
                          omic2="proteomic")

  def plot_divergence(self, algo: str = "pca"):
    """Latent embedding colored by each protein's level."""
    if "proteomic" not in self.sco_original.omics:
      return self
    return self._delegate("plot_divergence", X=OMIC.latent, omic="proteomic",
                          algo=algo)

  def plot_disentanglement_scatter(self, factor_omic: str = "proteomic",
                                   pairs=None, n_pairs: int = 6):
    """Latent 2-D embedding colored by the log-contrast of opposing factor
    pairs (reference plot_disentanglement_scatter with
    PROTEIN_PAIR_NEGATIVE)."""
    src = (self.sco_original if factor_omic in self.sco_original.omics
           else self.sco_analysis)  # imputed factors live on the analysis sco
    if factor_omic not in src.omics:
      return self
    import matplotlib.pyplot as plt
    from ..data.const import PROTEIN_PAIR_NEGATIVE
    from ..data.utils import standardize_protein_name
    raw_names = list(map(str, src.get_var_names(factor_omic)))
    # knowledge-base pairs use standardized protein names; raw names stay
    # valid for explicitly passed pairs
    name_idx = {}
    for i, n in enumerate(raw_names):
      name_idx.setdefault(standardize_protein_name(n), i)
    for i, n in enumerate(raw_names):
      name_idx.setdefault(n, i)
    if pairs is None:
      pairs = [(a, b) for a, b in PROTEIN_PAIR_NEGATIVE
               if a in name_idx and b in name_idx]
    pairs = [p for p in pairs
             if p[0] in name_idx and p[1] in name_idx][:n_pairs]
    if not pairs:
      return self
    emb = self.sco_analysis.dimension_reduce(OMIC.latent, n_components=2,
                                             algo="pca")
    y = np.log1p(src.numpy(factor_omic))
    ncol = 3
    nrow = int(np.ceil(len(pairs) / ncol))
    fig, axes = plt.subplots(nrow, ncol, figsize=(3.6 * ncol, 3 * nrow),
                             squeeze=False)
    for k, (a, b) in enumerate(pairs):
      ax = axes[k // ncol][k % ncol]
      contrast = y[:, name_idx[a]] - y[:, name_idx[b]]
      sc = ax.scatter(emb[:, 0], emb[:, 1], c=contrast, s=4, cmap="coolwarm",
                      linewidths=0)
      ax.set_title(f"{a} − {b}", fontsize=8)
      fig.colorbar(sc, ax=ax)
    for k in range(len(pairs), nrow * ncol):
      axes[k // ncol][k % ncol].axis("off")
    fig.tight_layout()
    self.add_figure(f"{self.name}_disentanglement_scatter_{factor_omic}",
                    fig)
    return self

  def plot_llk_bars(self):
    """4-way imputed/reconstructed × original/corrupted LLK bar chart."""
    import matplotlib.pyplot as plt
    llk = self.cal_llk()
    if not llk:
      return self
    fig, ax = plt.subplots(figsize=(6, 4))
    names = list(llk)
    ax.bar(range(len(names)), [llk[k] for k in names])
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation=30, fontsize=7, ha="right")
    ax.set_ylabel("log-likelihood")
    ax.set_title(f"{self.name} 4-way LLK")
    fig.tight_layout()
    self.add_figure(f"{self.name}_llk", fig)
    return self

  def plot_protein_prediction(self, n_proteins: int = 9):
    """Predicted vs true ADT scatter grid (semi-supervised models)."""
    if ("proteomic" not in self.sco_original.omics
        or "iproteomic" not in self.sco_analysis.omics):
      return self
    import matplotlib.pyplot as plt
    y = np.log1p(self.sco_original.numpy("proteomic"))
    yhat = np.log1p(self.sco_analysis.numpy("iproteomic"))
    names = self.sco_original.get_var_names("proteomic")
    n = min(n_proteins, y.shape[1])
    ncol = 3
    nrow = int(np.ceil(n / ncol))
    fig, axes = plt.subplots(nrow, ncol, figsize=(3.2 * ncol, 3 * nrow),
                             squeeze=False)
    for k in range(n):
      ax = axes[k // ncol][k % ncol]
      ax.scatter(y[:, k], yhat[:, k], s=4, alpha=0.3, linewidths=0)
      lim = max(y[:, k].max(), yhat[:, k].max())
      ax.plot([0, lim], [0, lim], "r--", lw=0.8)
      ax.set_title(str(names[k]), fontsize=8)
      ax.set_xlabel("true (log1p)", fontsize=7)
      ax.set_ylabel("predicted", fontsize=7)
    for k in range(n, nrow * ncol):
      axes[k // ncol][k % ncol].axis("off")
    fig.tight_layout()
    self.add_figure(f"{self.name}_protein_prediction", fig)
    return self

  def plot_series(self, omic: Optional[str] = None):
    """Original vs imputed sorted-expression series. Default: top-variance
    genes of the main omic. An explicit factor omic (``proteomic`` …)
    renders the reference's ``series_{factor}_{ifactor}`` original-vs-
    imputed marker series (evaluate.py:89-95, posterior.py:628-653)."""
    from ..utils.plot_utils import plot_series_statistics
    import matplotlib.pyplot as plt
    name = self.main_omic if omic is None else OMIC.parse(omic).name
    if (name not in self.sco_original.omics
        or f"i{name}" not in self.sco_analysis.omics):
      return self
    org = self.sco_original.numpy(name)
    imp = self.sco_analysis.numpy(f"i{name}")
    fig, ax = plt.subplots(figsize=(8, 4))
    plot_series_statistics({"original": org.sum(0), "imputed": imp.sum(0)},
                           title=f"{self.name} {name}", ax=ax)
    key = (f"{self.name}_series" if omic is None
           else f"{self.name}_series_{name}")
    self.add_figure(key, fig)
    return self

  def plot_all(self, full: bool = False):
    """Render the figure battery.

    ``full=False``: the standard 10-figure summary. ``full=True``: the
    reference's per-factor-omic figure grid (``evaluate.py:71-152``) — for
    every factor omic (proteomic/celltype/disease/progenitor) the scatter/
    violin/heatmap/dendrogram/distance/confusion/correlation panels on both
    the original and imputed omics, plus the protein-pair, divergence,
    disentanglement-scatter, LLK and protein-prediction figures — ≥20
    distinct figure types on a 2-omic model."""
    (self.plot_learning_curves().plot_imputation_scatter()
     .plot_scatter(algo="pca").plot_distance_heatmap()
     .plot_correlation_matrix().plot_latents_protein_pairs()
     .plot_latents_binary().plot_confusion_matrix()
     .plot_disentanglement().plot_series())
    if not full:
      return self
    self.plot_llk_bars().plot_protein_prediction()
    self.plot_divergence()
    if not self.factor_omics:
      # RNA-only dataset: the per-factor loop below never runs, but the
      # full grid still owes the latent tsne scatter it always rendered
      self.plot_scatter(algo="tsne")
    ana_omics = self.sco_analysis.omics
    # the reference treats proteomic as the continuous factor and the
    # one-hot omics as binary factors (evaluate.py:78-84)
    binary = ("disease", "progenitor", "celltype")
    for f in self.factor_omics:
      fi = f"i{f}"
      has_imputed = fi in ana_omics
      # scatter: latent embedding × {tsne, umap} colored by the factor and
      # (when the model predicts it) by the imputed factor
      for algo in ("tsne", "umap"):
        self.plot_scatter(color_by=f, algo=algo)
        if has_imputed:
          self.plot_scatter(color_by=fi, algo=algo)
      # original-vs-imputed factor series (series_{factor}_{ifactor})
      if has_imputed:
        self.plot_series(omic=f)
      # violins/heatmaps: {main, imain} × {factor, ifactor} groupings
      groups = [f] + ([fi] if has_imputed else [])
      for om in (self.main_omic, f"i{self.main_omic}"):
        for g in groups:
          self.plot_violins(omic=om, group_by=g)
          self.plot_heatmap(omic=om, group_by=g)
      self.plot_dendrogram(group_by=f)
      self.plot_dotplot(group_by=f)
      self.plot_distance_heatmap(factor_omic=f)
      self.plot_confusion_matrix(factor_omic=f)
      # latent × factor correlation heatmaps (all four methods)
      for method in ("spearman", "pearson", "mi", "importance"):
        self.plot_correlation_matrix(method=method, factor_omic=f)
      self.plot_disentanglement(factor_omic=f)
      if has_imputed:
        self.plot_disentanglement(factor_omic=fi)
      if f in binary:
        # distheatmap_{main|imain}_{binary factor} (evaluate.py:133-139)
        for om in (self.main_omic, f"i{self.main_omic}"):
          self.plot_distance_heatmap(factor_omic=f, omic=om)
      else:
        # continuous factor: marker-pair omic×factor correlation heatmaps
        # and gene↔protein correlation scatters (evaluate.py:141-152)
        for om in (self.main_omic, f"i{self.main_omic}"):
          for method in ("spearman", "pearson"):
            self.plot_correlation_matrix(method=method, factor_omic=f,
                                         omic1=om)
        self.plot_disentanglement_scatter(factor_omic=f)
        if has_imputed:
          self.plot_disentanglement_scatter(factor_omic=fi)
        for imputed in (False, True):
          self.plot_correlation_scatter(imputed=imputed)
    return self

  def __repr__(self):
    return (f"Posterior({self.scm.id} on {self.sco_original.name}, "
            f"cells={self.sco_original.n_obs}, "
            f"factors={self.factor_omics})")
