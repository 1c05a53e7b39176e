"""Bayesian differential expression (scvi-tools surface, beyond-reference):
`model.differential_expression` change/vanilla modes, one-vs-rest stacking,
and agreement of the posterior lfc with the empirical group fold change."""

import numpy as np
import pytest
from scipy import stats as sp_stats

from sisua_tpu.data import generate_synthetic
from sisua_tpu.models import SCVI, NetConf, RVmeta


@pytest.fixture(scope="module")
def de_setup():
  sco = generate_synthetic(n_cells=800, n_genes=60, n_proteins=5,
                           n_celltypes=3, seed=7)
  ct = np.argmax(sco.numpy("celltype"), axis=1)
  sco.obs["ct"] = [f"type{i}" for i in ct]
  m = SCVI(RVmeta(sco.n_vars, "nbd", name="rna"),
           latents=RVmeta(8, "diag", True, "latents"),
           encoder=NetConf((32, 32), batchnorm=True), seed=1)
  m.fit(sco, epochs=8, batch_size=64)
  return sco, m


def test_de_change_mode_matches_empirical_lfc(de_setup):
  sco, m = de_setup
  df = m.differential_expression(sco, "ct", group1="type0", mode="change",
                                 sample_shape=(5,), n_pairs=2000,
                                 max_cells=96, seed=3)
  assert df.shape[0] == sco.n_vars
  for col in ("proba_de", "bayes_factor", "lfc_mean", "lfc_median",
              "lfc_std", "scale1", "scale2"):
    assert col in df.columns and np.isfinite(df[col]).all(), col
  assert ((df["proba_de"] >= 0) & (df["proba_de"] <= 1)).all()
  assert list(df.index) == list(np.asarray(sco.var_names, str))
  # posterior lfc must track the empirical group fold change of the counts
  x = np.asarray(sco.numpy(), np.float64)
  g1 = np.asarray(sco.obs["ct"]) == "type0"
  emp = (np.log2(x[g1].mean(0) + 1.0) - np.log2(x[~g1].mean(0) + 1.0))
  rho = sp_stats.spearmanr(emp, df["lfc_median"].values).statistic
  assert rho > 0.5, rho
  # MC stability: a fresh set of posterior draws (the model's rng advances
  # per call) must reproduce the per-gene ranking
  df2 = m.differential_expression(sco, "ct", group1="type0", mode="change",
                                  sample_shape=(5,), n_pairs=2000,
                                  max_cells=96, seed=3)
  rho2 = sp_stats.spearmanr(df["lfc_median"].values,
                            df2["lfc_median"].values).statistic
  assert rho2 > 0.9, rho2


def test_de_vanilla_mode_and_two_groups(de_setup):
  sco, m = de_setup
  df = m.differential_expression(sco, "ct", group1="type0", group2="type1",
                                 mode="vanilla", sample_shape=(5,),
                                 n_pairs=1000, max_cells=64, seed=0)
  assert "proba_m1" in df.columns and "bayes_factor" in df.columns
  assert ((df["proba_m1"] >= 0) & (df["proba_m1"] <= 1)).all()
  assert np.isfinite(df["bayes_factor"]).all()


def test_de_one_vs_rest_stacks_all_levels(de_setup):
  sco, m = de_setup
  df = m.differential_expression(sco, "ct", mode="change",
                                 sample_shape=(3,), n_pairs=500,
                                 max_cells=48, seed=0)
  assert sorted(set(df["group1"])) == ["type0", "type1", "type2"]
  assert df.shape[0] == 3 * sco.n_vars


def test_de_errors(de_setup):
  sco, m = de_setup
  with pytest.raises(KeyError):
    m.differential_expression(sco, "nope", group1="type0")
  with pytest.raises(ValueError):
    m.differential_expression(sco, "ct", group1="absent-level")
  with pytest.raises(TypeError):
    m.differential_expression(np.zeros((10, sco.n_vars)), "ct",
                              group1="type0")


def test_norm_expr_reduce_mc_consistent(de_setup):
  """reduce_mc=False returns per-draw scales whose draw-average matches the
  on-device MC average (same rng → same draws)."""
  import jax
  sco, m = de_setup
  sub = sco[np.arange(40)]
  m._rng = jax.random.key(123, impl=m.prng)
  full = m.get_normalized_expression(sub, sample_shape=(4,),
                                     reduce_mc=False)
  m._rng = jax.random.key(123, impl=m.prng)
  red = m.get_normalized_expression(sub, sample_shape=(4,))
  assert full.shape == (4, 40, sco.n_vars)
  np.testing.assert_allclose(full.mean(0), red, atol=1e-5)
