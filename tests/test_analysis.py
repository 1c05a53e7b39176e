"""Analysis layer: Posterior pipeline, metric families, Criticizer suite,
callbacks, ResultsSheet (mirrors the evaluation flow of reference
``sisua/analysis``)."""

import numpy as np
import pytest

from sisua_tpu.analysis import (ClusteringScores, CorrelationScores,
                                Criticizer, ImputationError,
                                NegativeLogLikelihood, Posterior,
                                ResultsSheet, clustering_scores,
                                imputation_mean_score, imputation_score,
                                streamline_classifier,
                                unsupervised_clustering_accuracy)
from sisua_tpu.data import OMIC
from sisua_tpu.models import SISUA, VAE, NetConf, RVmeta


@pytest.fixture(scope="module")
def trained(splits_module):
  train, test = splits_module
  small = dict(encoder=NetConf((32, 32), batchnorm=True),
               decoder=NetConf((32, 32), batchnorm=True))
  vae = VAE(RVmeta(train.n_vars, "zinb", name="rna"), **small)
  vae.fit(train, epochs=4, batch_size=64)
  return vae, train, test


@pytest.fixture(scope="module")
def splits_module(request):
  from sisua_tpu.data import generate_synthetic
  sco = generate_synthetic(n_cells=600, n_genes=80, n_proteins=8,
                           n_celltypes=4, seed=5218)
  return sco.split(0.8, seed=1)


@pytest.fixture(scope="module")
def posterior(trained):
  vae, train, test = trained
  return vae.create_posterior(test, sample_shape=4)


def test_posterior_analysis_dataset(posterior):
  assert "itranscriptomic" in posterior.sco_analysis.omics
  assert "latent" in posterior.sco_analysis.omics
  assert posterior.factor_omics == ["proteomic", "celltype"]
  assert set(posterior.criticizers) == {"proteomic", "celltype"}


@pytest.mark.smoke
def test_posterior_llk_four_way(posterior):
  llk = posterior.cal_llk()
  assert len(llk) == 4
  assert all(np.isfinite(v) for v in llk.values())
  # reconstructing corrupted data must be at least as easy as original
  assert llk["llk_transcriptomic_predcor_datacor"] >= \
      llk["llk_transcriptomic_predcor_dataorg"]


def test_posterior_imputation_scores(posterior):
  s = posterior.cal_imputation_scores()
  assert set(s) == {"imputation_med", "imputation_mean", "imputation_std"}
  assert all(v >= 0 for v in s.values())


def test_posterior_correlations_and_f1(posterior):
  sp = posterior.cal_spearman()
  assert "spearman_mean" in sp  # synthetic proteins use real marker names
  f1 = posterior.cal_protein_classification()
  assert "f1_F1macro" in f1 and 0 <= f1["f1_F1macro"] <= 1


def test_posterior_marginal_llk(posterior):
  m = posterior.cal_marginal_llk(sample_shape=8)
  assert np.isfinite(m["marginal_llk_transcriptomic"])


def test_criticizer_full_suite(posterior):
  crt = posterior.criticizers["celltype"]
  scores = crt.cal_all_scores()
  expected = {"ASW", "ARI", "NMI", "UCA", "disentanglement", "completeness",
              "informativeness", "dci", "mig", "tc", "sap", "rds", "rms",
              "betavae", "factorvae"}
  assert expected <= set(scores)
  assert all(np.isfinite(v) for v in scores.values())
  assert 0 <= scores["betavae"] <= 1 and 0 <= scores["factorvae"] <= 1


def test_criticizer_scores_reproducible(posterior):
  """betavae/factorvae draw from dedicated seeded RNGs and cache: repeat
  calls (and calls after other metrics advanced the shared RNG) must
  return identical numbers."""
  crt = posterior.criticizers["celltype"]
  b1 = crt.cal_betavae_score()["betavae"]
  f1 = crt.cal_factorvae_score()["factorvae"]
  crt._rng.randint(10**6, size=100)  # perturb the shared stream
  assert crt.cal_betavae_score()["betavae"] == b1
  assert crt.cal_factorvae_score()["factorvae"] == f1


def test_marginal_llk_cache_keyed_by_samples(posterior):
  """Different sample_shape must not silently return the cached value of
  a previous setting."""
  m8 = posterior.cal_marginal_llk(sample_shape=8)
  m64 = posterior.cal_marginal_llk(sample_shape=64)
  # estimates differ (higher S → tighter bound); equality would mean the
  # cache ignored sample_shape
  assert m8 != m64


def test_criticizer_matrices(posterior):
  crt = posterior.criticizers["celltype"]
  corr = crt.create_correlation_matrix("spearman")
  mi = crt.create_mutualinfo_matrix()
  assert corr.shape == mi.shape
  assert np.abs(corr).max() <= 1.0 + 1e-6


def test_posterior_figures(posterior, tmp_path):
  posterior.plot_all()
  posterior.save_figures(str(tmp_path))
  import os
  assert len(os.listdir(tmp_path)) >= 6


def test_callbacks_inject_metrics(splits_module):
  train, test = splits_module
  small = dict(encoder=NetConf((16,)), decoder=NetConf((16,)))
  cbs = [NegativeLogLikelihood(sco=test, freq=1),
         ImputationError(sco=test, freq=1),
         CorrelationScores(sco=test, freq=2),
         ClusteringScores(sco=test, freq=2)]
  m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), **small)
  m.fit(train, epochs=3, batch_size=64, callbacks=cbs)
  h = m.history
  assert "NegativeLogLikelihood_nllk" in h
  assert "ImputationError_med" in h
  assert "CorrelationScores_spearman" in h
  assert "ClusteringScores_ARI" in h


@pytest.mark.slow
def test_results_sheet(trained, tmp_path):
  vae, train, test = trained
  small = dict(encoder=NetConf((16,)), decoder=NetConf((16,)))
  sisua = SISUA([RVmeta(train.n_vars, "zinb", name="rna"),
                 RVmeta(train.get_dim(OMIC.proteomic), "nb", name="adt")],
                **small)
  sisua.fit(train, epochs=3, batch_size=64, labels_percent=0.5)
  rs = ResultsSheet(vae.create_posterior(test, sample_shape=2),
                    sisua.create_posterior(test, sample_shape=2))
  df = rs.get_scores()
  assert df.shape[0] == 2 and df.shape[1] > 10
  rs.save_scores(str(tmp_path / "scores"))
  import os
  assert (tmp_path / "scores.csv").exists()
  assert (tmp_path / "scores.html").exists()
  # dunder surface + the comparison figure families (reference :226-657)
  assert len(rs) == 2 and rs[sisua.name] is rs[1] and list(rs) == rs.posteriors
  assert sisua.name in rs.summary()
  (rs.plot_comparison_f1().plot_correlation_marker_pairs()
     .boxplot_f1().boxplot_spearman().boxplot_pearson().boxplot_cluster()
     .barplot_f1().barplot_spearman().barplot_pearson().barplot_cluster()
     .plot_scores("imputation").plot_latents_binary_scatter())
  names = set(rs.figures)
  for frag in ("compare_classifier_f1", "correlation_marker_pairs",
               "boxplot_classifier", "barplot_cluster", "scores_imputation"):
    assert any(frag in n for n in names), (frag, sorted(names))
  rs.save_plots(str(tmp_path / "figs"))
  assert len(os.listdir(tmp_path / "figs")) >= 10


def test_metric_functions():
  rng = np.random.default_rng(0)
  org = rng.poisson(4, (50, 20)).astype(float)
  imp = org + rng.normal(0, 0.5, org.shape)
  cor = org.copy()
  cor[:25] = 0  # half the cells corrupted
  assert imputation_score(org, org) == 0.0
  assert imputation_mean_score(org, cor, imp) >= 0
  acc, _ = unsupervised_clustering_accuracy(
      np.array([0, 0, 1, 1]), np.array([1, 1, 0, 0]))
  assert acc == 1.0  # permutation-invariant
  z = np.concatenate([rng.normal(0, 1, (40, 3)), rng.normal(5, 1, (40, 3))])
  labels = np.array([0] * 40 + [1] * 40)
  cs = clustering_scores(z, labels)
  assert cs["ARI"] > 0.9 and cs["UCA"] > 0.9


@pytest.mark.slow
def test_posterior_no_factor_omics():
  """Factor-dependent families degrade to {} without crashing."""
  from sisua_tpu.data import SingleCellOMIC
  rng = np.random.default_rng(0)
  sco = SingleCellOMIC(rng.poisson(2, (200, 40)).astype(np.float32))
  m = VAE(RVmeta(40, "zinb", name="rna"), encoder=NetConf((16,)),
          decoder=NetConf((16,)))
  m.fit(sco, epochs=2, batch_size=50)
  post = m.create_posterior(sco, sample_shape=2)
  assert post.factor_omics == []
  assert post.cal_spearman() == {} and post.cal_mig() == {}
  assert "imputation_med" in post.save_scores()


@pytest.mark.slow
def test_cal_llk_on_device_matches_host(splits, small_nets):
  """Posterior(device_cache=True) computes the 4-way LLK inside one
  executable per prediction source (no distribution params shipped to the
  host); values match the host path within MC noise."""
  from sisua_tpu.models import VAE, RVmeta
  train, test = splits
  m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), **small_nets)
  m.fit(train, epochs=3, batch_size=64)
  host = m.create_posterior(test, sample_shape=10).cal_llk()
  dev = m.create_posterior(test, sample_shape=10,
                           device_cache=True).cal_llk()
  assert set(host) == set(dev)
  for k in host:
    assert abs(host[k] - dev[k]) / max(abs(host[k]), 1.0) < 0.05, \
        (k, host[k], dev[k])


@pytest.mark.slow
def test_posterior_full_figure_grid(splits, small_nets):
  """The full per-factor grid (reference evaluate.py:71-152 +
  posterior.py:445-852) renders the ENUMERATED figure set on a 2-omic
  semi-supervised model (VERDICT r2 #7): every reference figure type, per
  factor omic, on both the original and imputed omics — see the
  figure-parity checklist in MIGRATING.md."""
  import matplotlib
  matplotlib.use("Agg")
  from sisua_tpu.models import SISUA, RVmeta
  train, test = splits
  m = SISUA([RVmeta(train.n_vars, "zinb", name="rna"),
             RVmeta(train.get_dim("proteomic"), "nb", name="adt")],
            **small_nets)
  m.fit(train, epochs=2, batch_size=128, valid_freq=0, patience=0)
  post = m.create_posterior(test, sample_shape=3)
  post.plot_all(full=True)
  n = post.name
  # exact keys (deterministic names)
  exact = [
      # ---- summary battery
      f"{n}_learning_curves", f"{n}_imputation", f"{n}_protein_pairs",
      f"{n}_latent_binary", f"{n}_series", f"{n}_llk",
      f"{n}_protein_prediction",
      # ---- scatter_latent_{factor|ifactor}_{tsne|umap|pca}
      f"{n}_latent_proteomic_pca",
      f"{n}_latent_proteomic_tsne", f"{n}_latent_proteomic_umap",
      f"{n}_latent_iproteomic_tsne", f"{n}_latent_iproteomic_umap",
      f"{n}_latent_celltype_tsne", f"{n}_latent_celltype_umap",
      # ---- series_{factor}_{ifactor}
      f"{n}_series_proteomic",
      # ---- latent distance + omic-space distheatmap (binary factor)
      f"{n}_distance_proteomic", f"{n}_distance_celltype",
      f"{n}_distheatmap_transcriptomic_celltype",
      f"{n}_distheatmap_itranscriptomic_celltype",
      # ---- latent×factor correlation (4 methods) per factor
      f"{n}_spearman_proteomic", f"{n}_pearson_proteomic",
      f"{n}_mi_proteomic", f"{n}_importance_proteomic",
      f"{n}_spearman_celltype", f"{n}_pearson_celltype",
      f"{n}_mi_celltype", f"{n}_importance_celltype",
      # ---- marker-pair omic×factor correlation heatmaps (continuous)
      f"{n}_spearman_transcriptomic_proteomic",
      f"{n}_pearson_transcriptomic_proteomic",
      f"{n}_spearman_itranscriptomic_proteomic",
      f"{n}_pearson_itranscriptomic_proteomic",
      # ---- gene↔protein correlation scatters (corrscat grid)
      f"{n}_transcriptomic_proteomic_corr_scatter",
      f"{n}_itranscriptomic_proteomic_corr_scatter",
      # ---- disentanglement incl. the imputed-factor variant
      f"{n}_disentanglement_proteomic", f"{n}_disentanglement_iproteomic",
      f"{n}_disentanglement_celltype",
      f"{n}_disentanglement_scatter_proteomic",
      f"{n}_disentanglement_scatter_iproteomic",
      # ---- confusion + dendrogram + divergence
      f"{n}_confusion_proteomic", f"{n}_confusion_celltype",
      f"{n}_dendrogram_itranscriptomic_proteomic",
      f"{n}_dendrogram_itranscriptomic_celltype",
      f"{n}_latent_proteomic_divergence",
  ]
  missing = [k for k in exact if k not in post.figures]
  assert not missing, (missing, sorted(post.figures))
  # violins/heatmaps/dotplots carry the argument grid in their keys —
  # match fragments: {main, imain} × {factor, ifactor} per plot family
  names = sorted(post.figures)
  frags = []
  for om in ("transcriptomic", "itranscriptomic"):
    for g in ("proteomic", "iproteomic", "celltype"):
      frags.append(f"violin_{om}_{g}")
      frags.append(f"heatmap_{om}_{g}")
  frags += ["dotplot_itranscriptomic_proteomic",
            "dotplot_itranscriptomic_celltype"]
  for frag in frags:
    assert any(frag in k for k in names), (frag, names)
  assert len(post.figures) >= 55, len(post.figures)
  import matplotlib.pyplot as plt
  plt.close("all")


@pytest.mark.slow
def test_posterior_on_mesh_matches_single_device(splits, small_nets):
  """create_posterior(mesh=...) runs the corrupt→predict→score pipeline
  data-parallel over the 8-device mesh; every metric family matches the
  single-device device-cached run within MC noise."""
  from sisua_tpu.models import VAE, RVmeta
  from sisua_tpu.parallel import create_mesh
  train, test = splits
  m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), seed=3, **small_nets)
  m.fit(train, epochs=3, batch_size=64)
  mesh = create_mesh()

  rng = m._rng
  single = m.create_posterior(test, sample_shape=6, device_cache=True)
  m._rng = rng
  meshed = m.create_posterior(test, sample_shape=6, mesh=mesh)
  assert meshed.device_cache  # mesh implies the one-executable paths

  rng2 = m._rng  # pin MC draws for the two cal_llk passes
  llk_s = single.cal_llk()
  m._rng = rng2
  llk_m = meshed.cal_llk()
  assert set(llk_s) == set(llk_m)
  for k in llk_s:
    np.testing.assert_allclose(llk_m[k], llk_s[k], rtol=1e-3), k
  imp_s, imp_m = (single.cal_imputation_scores(),
                  meshed.cal_imputation_scores())
  for k in imp_s:
    np.testing.assert_allclose(imp_m[k], imp_s[k], rtol=1e-2, atol=1e-3)
  # latent space identical → clustering scores identical
  np.testing.assert_allclose(meshed.latents, single.latents,
                             rtol=2e-4, atol=2e-4)


def test_posterior_accessor_surface(posterior):
  """Round-2 Posterior accessors (reference posterior.py:258-412)."""
  import numpy as np
  assert posterior.dataset is posterior.sco_analysis
  assert posterior.n_latents == posterior.latents.shape[1]
  assert posterior.n_outputs == len(posterior.output_omics)
  # get_data: arrays for original/corrupted, distributions for predictions
  main = posterior.main_omic
  org = posterior.get_data(main, "original")
  cor = posterior.get_data(main, "corrupted")
  assert org.shape == cor.shape and not np.allclose(org, cor)
  imp = posterior.get_data(main, "imputed")
  rec = posterior.get_data(main, "reconstructed")
  assert hasattr(imp, "log_prob") and hasattr(rec, "log_prob")
  auto = posterior.get_data(main, "auto")
  assert auto.shape == org.shape
  # latent: corrupted posterior by default
  assert posterior.get_data("latent") is posterior.qZ_cor
  assert posterior.get_data("latent", "original") is posterior.qZ_org
  # first-found list semantics
  got = posterior.get_data(main, ["missing-type", "original"])
  np.testing.assert_allclose(got, org)
  with pytest.raises(ValueError):
    posterior.get_data(main, "missing-type")
  # criticizer accessor returns the cached instance
  crit = posterior.get_criticizer("celltype")
  assert crit is posterior.criticizers["celltype"]
  # marker pairs delegate to the analysis dataset
  pairs = posterior.get_marker_pairs()
  assert isinstance(pairs, list)


def test_imputation_helper_functions():
  from sisua_tpu.analysis.imputation import (get_imputed_indices,
                                             plot_imputation_series)
  rng = np.random.default_rng(0)
  x = rng.poisson(3, (30, 8)).astype(float)
  xi = x.copy()
  xi[[2, 5, 7]] += 1.0
  ids = get_imputed_indices(x, xi)
  assert ids.tolist() == [2, 5, 7]
  fig = plot_imputation_series(x, xi, title="t")
  assert len(fig.axes) == 4
  import matplotlib.pyplot as plt
  plt.close(fig)
