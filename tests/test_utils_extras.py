"""Utils, baselines, hyper-parameter search, label_threshold, export gates."""

import os

import numpy as np
import pytest

from sisua_tpu.label_threshold import ProbabilisticEmbedding, _DummyGMM
from sisua_tpu.utils import (UnitTimer, dimension_reduction,
                             filtering_experiment_path,
                             thresholding_by_sparsity, save_data_to_csv)


def test_probabilistic_embedding_semantics():
  rng = np.random.default_rng(0)
  # bimodal protein counts: clear negative + positive populations
  neg = rng.poisson(2, (300, 3))
  pos = rng.poisson(80, (200, 3))
  X = np.concatenate([neg, pos]).astype(np.float64)
  pe = ProbabilisticEmbedding()
  pe.fit(X)
  ybin = pe.predict(X)
  yprob = pe.predict_proba(X)
  assert ybin.shape == X.shape and set(np.unique(ybin)) <= {0.0, 1.0}
  assert (yprob >= 0).all() and (yprob <= 1).all()
  # the positive population must be labeled positive far more often; the
  # CI cut (-0.68) sits at the positive component's 68%-interval lower
  # bound, so ~16% of true positives fall below it by construction
  assert ybin[300:].mean() > 0.75 and ybin[:300].mean() < 0.2
  # responsibilities separate the populations cleanly
  assert yprob[300:].mean() > 0.95 and yprob[:300].mean() < 0.05
  # ordered component means
  assert (pe.means[0] <= pe.means[1]).all()
  # score is a finite average log-likelihood
  assert np.isfinite(pe.score(X))


def test_dummy_gmm_fallback():
  d = _DummyGMM().fit(np.ones((10, 1)))
  assert (d.predict(np.array([0.5, 2.0])) == np.array([0, 1])).all()


def test_pe_all_zero_column_and_refit():
  """An all-zero protein column (1 anchor sample after zero-removal) must
  fall back to _DummyGMM, not crash; fit() twice must reset state; the
  means/precisions tables pad the 1-component fallback columns."""
  rng = np.random.default_rng(3)
  X = np.concatenate([rng.poisson(2, (200, 2)),
                      rng.poisson(60, (100, 2))]).astype(np.float64)
  X = np.concatenate([X, np.zeros((300, 1))], axis=1)  # dead 3rd protein
  pe = ProbabilisticEmbedding()
  pe.fit(X)
  assert pe.n_classes == 3
  assert isinstance(pe._models[2][1], _DummyGMM)
  ybin = pe.predict(X)
  assert ybin.shape == X.shape
  m = pe.means
  assert m.shape == (2, 3) and np.isnan(m[1, 2])  # padded fallback column
  pe.fit(X)                                        # sklearn refit semantics
  assert pe.n_classes == 3
  assert pe.predict(X).shape == X.shape


def test_thresholding_by_sparsity():
  rng = np.random.default_rng(1)
  w = rng.random((40, 25))
  target = (rng.random((40, 25)) > 0.7)
  out = thresholding_by_sparsity(w, target)
  assert abs((out == 0).mean() - (target == 0).mean()) < 0.01


def test_dimension_reduction_wrapper():
  x = np.random.default_rng(2).random((100, 20)).astype(np.float32)
  assert dimension_reduction(x, "pca", 3).shape == (100, 3)
  with pytest.raises(ValueError):
    dimension_reduction(x, "nope")


def test_filtering_experiment_path(tmp_path):
  for name in ("vae_cortex_abc12", "dca_cortex_def34", "vae_8kly_xyz99"):
    os.makedirs(tmp_path / name)
  hits = filtering_experiment_path(str(tmp_path), "vae")
  assert len(hits) == 2
  hits = filtering_experiment_path(str(tmp_path), "vae", "8kly")
  assert len(hits) == 1
  hits, datasets = filtering_experiment_path(str(tmp_path), "cortex",
                                             return_dataset=True)
  assert datasets == ["cortex"]


def test_csv_export_roundtrip(tmp_path, sco):
  import pandas as pd
  p = save_data_to_csv(sco, str(tmp_path / "x.csv.gz"))
  df = pd.read_csv(p, index_col=0)
  assert df.shape == sco.shape
  np.testing.assert_allclose(df.values[:5], sco.numpy()[:5], atol=1e-4)


def test_baseline_pipeline(sco):
  from sisua_tpu.baselines import run_baseline
  scores = run_baseline(sco, "pca", n_components=6)
  assert "ARI_celltype" in scores
  assert any(k.startswith("f1_") for k in scores)


@pytest.mark.slow
def test_hyper_search_random():
  from sisua_tpu.models.hyper_params import fit_hyper
  res = fit_hyper("vae", "synthetic", algorithm="rand", max_evals=2,
                  epochs=1,
                  space={"nlayers": (1,), "hdim": (16,), "zdim": (4, 8),
                         "learning_rate": (1e-3,)})
  assert res["best"] is not None and np.isfinite(res["loss"])
  assert len(res["trials"]) == 2


def test_interpolation_schedules():
  from sisua_tpu.interpolation import (cosine, cyclical, exp, get_interpolation,
                                       linear)
  sched = linear(vmin=0.0, vmax=2.0, norm=10)
  assert float(sched(0)) == 0.0
  assert abs(float(sched(5)) - 1.0) < 1e-6
  assert float(sched(100)) == 2.0
  assert float(cosine(norm=10)(10)) == 1.0
  cyc = cyclical("linear", norm=10)
  assert abs(float(cyc(15)) - 0.5) < 1e-6
  assert float(get_interpolation(0.5)(123)) == 0.5
  delayed = linear(norm=10, delay_in=5)
  assert float(delayed(4)) == 0.0
  # cyclical schedules must also hold vmin through the delay (regression:
  # mod wrapped the negative pre-delay phase to mid-ramp)
  cyc_delayed = cyclical("linear", norm=10, delay_in=5)
  assert float(cyc_delayed(0)) == 0.0
  assert float(cyc_delayed(4)) == 0.0
  assert abs(float(cyc_delayed(10)) - 0.5) < 1e-6
