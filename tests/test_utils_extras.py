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


def test_reference_utils_parity_batch():
  """Round-2 convenience surface: anything2image, apply_threshold,
  sparsity-matching thresholding, downsample, show_image, save_data,
  countsum plots (reference utils/others.py:124-215,
  visualization.py:44-86, plot_utils.py:45-160, io_utils.py:14-24)."""
  from sisua_tpu.utils import (anything2image, apply_threshold,
                               downsample_data, plot_countsum_comparison,
                               plot_countsum_series, save_data, show_image,
                               thresholding_by_sparsity_matching)
  rng = np.random.default_rng(0)
  img = anything2image(np.arange(10, dtype=np.float32))
  assert img.shape == (4, 4) and img[0, 0] == 0 and img.ravel()[9] == 9
  assert anything2image(np.zeros((3, 3))).shape == (3, 3)

  x = np.array([-0.2, 0.1, 0.4, 0.8, 1.0, 3.7])
  out = apply_threshold(x, 0.5)
  assert out.tolist() == [0, 0, 0, 1, 1, 3] and out.dtype == np.int32

  T = rng.poisson(0.8, (50, 30))
  W = rng.uniform(0, 1, (50, 30))
  thr, (W2, none) = thresholding_by_sparsity_matching(T, W, W, None)
  assert none is None
  assert np.sum(W >= thr) >= np.count_nonzero(T)
  assert W2.dtype == np.int32

  a = rng.normal(size=(9000, 3))
  b = rng.normal(size=(9000, 2))
  a2, n2, b2 = downsample_data(a, None, b, max_samples=1000)
  assert a2.shape == (1000, 3) and b2.shape == (1000, 2) and n2 is None
  same = downsample_data(a[:100], b[:100])
  assert same[0] is a[:100][0:100].base or same[0].shape == (100, 3)

  ax = show_image(rng.uniform(size=200), is_probability=True)
  assert ax.images  # something was drawn
  ax = show_image(rng.uniform(size=(64, 64)))
  assert ax.images[0].get_array().shape == (16, 16)  # 4x4 max-pooled

  org = rng.poisson(5, (80, 40)).astype(float)
  exp_ = org + rng.normal(0, 0.3, org.shape)
  ax = plot_countsum_series(org, (exp_, np.ones_like(org), 0.5 *
                                  np.ones_like(org)),
                            p=rng.uniform(size=org.shape), title="series")
  assert ax.get_title() == "series"
  ax = plot_countsum_comparison(org, exp_, exp_ * 1.1, title="cmp")
  assert len(ax.collections) >= 2

  import matplotlib.pyplot as plt
  plt.close("all")


def test_save_data_dispatch(tmp_path, sco):
  from sisua_tpu.utils import save_data
  out = save_data(sco, str(tmp_path / "exported"))
  assert os.path.exists(out)


def test_pe_boxplot():
  from sisua_tpu.label_threshold import ProbabilisticEmbedding
  rng = np.random.default_rng(1)
  X = np.concatenate([rng.poisson(2, (100, 2)),
                      rng.poisson(60, (80, 2))]).astype(np.float64)
  pe = ProbabilisticEmbedding().fit(X)
  fig = pe.boxplot(X, labels=["p1", "p2"])
  assert len(fig.axes) == 6  # 2 proteins x (original, nonzeros, normalized)
  import matplotlib.pyplot as plt
  plt.close(fig)


def test_data_utils_parity_batch(tmp_path):
  from sisua_tpu.data.utils import (remove_allzeros_columns, save_to_dataset,
                                    validating_dataset)
  rng = np.random.default_rng(2)
  X = rng.poisson(1, (30, 10)).astype(np.float32)
  X[:, 3] = 0
  X[:, 7] = 0
  X[0, 7] = 1  # column sum 1 -> still dropped (needs > 1)
  cols = np.array([f"g{i}" for i in range(10)])
  X2, c2 = remove_allzeros_columns(X, cols, print_log=False)
  assert X2.shape[1] == len(c2) < 10
  assert "g3" not in c2 and "g7" not in c2

  p = str(tmp_path / "ds")
  save_to_dataset(p, X, cols, y=X[:, :2], y_col=["a", "b"], print_log=False)
  validating_dataset(p)  # must not raise
  with pytest.raises(AssertionError):
    validating_dataset({"X": X, "X_col": cols[:-1],
                        "X_row": [f"c{i}" for i in range(30)]})


def test_get_dataset_summary():
  from sisua_tpu.data import get_dataset_summary
  df = get_dataset_summary(names=["synthetic1k"])
  assert len(df) == 1 and df.iloc[0]["#Cells"] == 1000
  html = get_dataset_summary(names=["synthetic1k"], return_html=True)
  assert "<table" in html


def test_evaluate_module_functions(tmp_path):
  from sisua_tpu.cli.evaluate import robust_run
  calls = []
  assert robust_run("ok", "cfg", lambda a: calls.append(a) or 42, 1) == 42
  assert calls == [1]

  class _SB:
    def __init__(self):
      self.errors = []
    def write_error(self, unique, message):
      self.errors.append((unique, message))

  sb = _SB()
  out = robust_run("boom", "cfg", lambda: 1 / 0, scoreboard=sb)
  assert out is None and len(sb.errors) == 1
  assert "ZeroDivisionError" in sb.errors[0][1]


def test_steady_window_rates():
  from sisua_tpu.utils import steady_window_rates
  # windowed history: epochs in a window share the window rate — one rate
  # per FULL window, compile window dropped, trailing partial dropped
  rates = [10., 10., 10., 10., 50., 50., 50., 50., 60., 60.]  # interval 4
  assert steady_window_rates(rates, epochs=10, interval=4) == [50.]
  rates12 = [10.] * 4 + [50.] * 4 + [60.] * 4
  assert steady_window_rates(rates12, epochs=12, interval=4) == [50., 60.]
  # per-epoch executables (epochs < interval): every epoch is its own unit
  # with a DISTINCT rate; indexing by i*interval would re-select only the
  # compile epoch (bench.py regression)
  per_epoch = [5., 40., 42., 41.]
  assert steady_window_rates(per_epoch, epochs=4, interval=8) == [40., 42., 41.]
  # interval == 1 → per-epoch as well
  assert steady_window_rates(per_epoch, epochs=4, interval=1) == [40., 42., 41.]
  # truncated history (early stop) degrades, never IndexError
  assert steady_window_rates([7.], epochs=48, interval=8) == [7.]
  assert steady_window_rates([10.] * 4 + [50.], epochs=48, interval=4) == [50.]


def test_enable_compilation_cache(tmp_path, monkeypatch):
  """Persistent-cache helper contract (VERDICT r4 §weak 5): explicit dir
  always wins, SISUA_NO_COMPILATION_CACHE opts out, CPU backends stay
  opt-in (AOT entries encode host machine features), and the call is
  idempotent."""
  from sisua_tpu.utils import others

  monkeypatch.setattr(others, "_COMP_CACHE_STATE", {"dir": None})
  monkeypatch.setenv("SISUA_NO_COMPILATION_CACHE", "1")
  assert others.enable_compilation_cache(str(tmp_path / "a")) is None

  monkeypatch.delenv("SISUA_NO_COMPILATION_CACHE")
  # CPU backend (the test environment) without an explicit dir → opt-in
  monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
  monkeypatch.delenv("SISUA_COMPILATION_CACHE_CPU", raising=False)
  assert others.enable_compilation_cache() is None

  # explicit dir wins even on CPU, creates the directory, sets jax config
  import jax
  old = jax.config.jax_compilation_cache_dir
  try:
    d = str(tmp_path / "cache")
    got = others.enable_compilation_cache(d)
    assert got == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # idempotent: second call returns the active dir, ignores a new one
    assert others.enable_compilation_cache(str(tmp_path / "other")) == d
  finally:
    # tmp_path is deleted after the test — don't leave the session's
    # cache pointed at a vanishing directory
    jax.config.update("jax_compilation_cache_dir", old)
