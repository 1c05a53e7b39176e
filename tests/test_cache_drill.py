"""One-command real-cache drill (VERDICT r2 #8).

The environment has no network, so real datasets arrive either as a
user-provided raw-download tree (the files the loaders would have
downloaded, pre-placed under ``$SISUA_DATA``-adjacent download dirs) or as
a user-provided ``.h5ad`` file. These tests pin both drills end-to-end:

  * the REGISTRY path — a fabricated raw tree for each loader family runs
    ``get_dataset(name)`` → parse → preprocess → npz + MD5-manifest cache,
    and a second call is a pure cache hit (downloads hard-disabled);
  * the H5AD path — ``get_dataset('/path/file.h5ad')`` drives the full
    ``sisua-tpu-train`` → ``sisua-evaluate`` → ``ResultsSheet`` pipeline
    documented in ``tutorials/real_data_drill.py``.

The per-loader parse tests live in ``test_loaders_offline.py``; these chain
them into the registry/CLI surface a user actually calls.
"""

import os

import numpy as np
import pytest

from sisua_tpu.data import get_dataset

from test_loaders_offline import _make_10x_archive


def _no_network(monkeypatch, mod):
  def _raise(url, out=None, **kw):
    raise AssertionError(f"network hit for {url} — cache miss")
  monkeypatch.setattr(mod, "download_file", _raise)


def test_registry_tenx_from_fake_raw_tree(tmp_path, monkeypatch):
  """get_dataset('4k') end-to-end from a pre-placed 10x archive, then a
  download-disabled cache hit."""
  import shutil

  import sisua_tpu.data.loaders.tenx as tenx
  tar_path, n_cells, n_genes, n_adt = _make_10x_archive(tmp_path, True)
  monkeypatch.setattr(tenx, "DATA_DIR", str(tmp_path / "data"))
  monkeypatch.setattr(tenx, "DOWNLOAD_DIR", str(tmp_path / "dl"))
  os.makedirs(tmp_path / "data", exist_ok=True)
  os.makedirs(tmp_path / "dl", exist_ok=True)
  expected = os.path.basename(
      tenx._matrix_url(*tenx.TENX_CATALOG["pbmc4k"], filtered=True))
  shutil.copy(tar_path, tmp_path / "dl" / expected)
  # the pre-placed archive satisfies the download step
  monkeypatch.setattr(tenx, "download_file",
                      lambda url, out, **kw: str(tar_path))
  sco = get_dataset("4k")
  assert sco.n_obs == n_cells
  assert "proteomic" in sco.omics and sco.get_dim("proteomic") == n_adt
  # second call: pure cache hit — any download attempt fails the test
  _no_network(monkeypatch, tenx)
  sco2 = get_dataset("4k")
  assert sco2 == sco  # MD5 equality


def test_registry_cortex_from_fake_raw_tree(tmp_path, monkeypatch):
  """get_dataset('cortex') from a pre-placed Linnarsson-format raw file."""
  import shutil

  import sisua_tpu.data.loaders.scvi_datasets as sd
  rng = np.random.default_rng(1)
  n_cells, n_genes = 25, 40
  classes = ["astro", "neuron", "oligo"]
  labels = [classes[i % 3] for i in range(n_cells)]
  raw = tmp_path / "cortex.txt"
  with open(raw, "w") as f:
    f.write("tissue\t\t" + "\t".join(["ctx"] * n_cells) + "\n")
    f.write("group #\t\t" + "\t".join(labels) + "\n")
    f.write("total mRNA mol\t\t" + "\t".join(["100"] * n_cells) + "\n")
    for g in range(n_genes):
      vals = rng.poisson(2, n_cells)
      f.write(f"Gene{g}\t0\t" + "\t".join(map(str, vals)) + "\n")
  monkeypatch.setattr(sd, "DATA_DIR", str(tmp_path / "data"))
  monkeypatch.setattr(sd, "DOWNLOAD_DIR", str(tmp_path / "dl"))
  os.makedirs(tmp_path / "data", exist_ok=True)
  os.makedirs(tmp_path / "dl", exist_ok=True)
  shutil.copy(raw, tmp_path / "dl" / "cortex_expression_mRNA.txt")
  monkeypatch.setattr(sd, "download_file", lambda url, out, **kw: str(raw))
  sco = get_dataset("cortex", n_top_genes=30)
  assert sco.n_obs == n_cells and sco.n_vars == 30
  assert sco.get_dim("celltype") == 3
  _no_network(monkeypatch, sd)
  sco2 = get_dataset("cortex", n_top_genes=30)
  assert sco2 == sco


def test_registry_citeseq_from_fake_raw_tree(tmp_path, monkeypatch):
  """get_dataset('cbmcciteseq') from pre-placed GEO CSV matrices."""
  import shutil

  import pandas as pd

  import sisua_tpu.data.loaders.citeseq as cs
  rng = np.random.default_rng(2)
  cells = [f"cell{i}" for i in range(18)]
  genes = [f"HUMAN_G{i}" for i in range(25)] + ["MOUSE_Bad1", "MOUSE_Bad2"]
  rna = pd.DataFrame(rng.poisson(2, (27, 18)), index=genes, columns=cells)
  rna.iloc[25:, :] = 0
  rna.iloc[:25, :3] = 0
  rna.iloc[25:, :3] = 50
  adt = pd.DataFrame(rng.poisson(30, (3, 18)),
                     index=["CD4", "CD8a", "CD3-TotalSeqB"], columns=cells)
  monkeypatch.setattr(cs, "DATA_DIR", str(tmp_path / "data"))
  monkeypatch.setattr(cs, "DOWNLOAD_DIR", str(tmp_path / "dl"))
  os.makedirs(tmp_path / "data", exist_ok=True)
  os.makedirs(tmp_path / "dl", exist_ok=True)
  rna.to_csv(tmp_path / "dl" / "cbmc_rna.csv.gz", compression="gzip")
  adt.to_csv(tmp_path / "dl" / "cbmc_adt.csv.gz", compression="gzip")
  monkeypatch.setattr(cs, "download_file", lambda url, out, **kw: out)
  sco = get_dataset("cbmcciteseqall")
  assert sco.n_obs == 15
  assert set(map(str, sco.get_var_names("proteomic"))) == {"CD4", "CD8",
                                                           "CD3"}
  _no_network(monkeypatch, cs)
  sco2 = get_dataset("cbmcciteseqall")
  assert sco2 == sco


@pytest.mark.slow
def test_h5ad_one_command_drill(tmp_path, monkeypatch):
  """The documented user pipeline against an .h5ad file:
  train CLI → evaluate CLI → ResultsSheet scores on disk
  (tutorials/real_data_drill.py)."""
  import yaml as _yaml

  from sisua_tpu.cli.evaluate import main as evaluate_main
  from sisua_tpu.data import generate_synthetic
  from sisua_tpu.data.h5ad import write_h5ad
  from sisua_tpu.train.experimenter import SisuaExperimenter

  sco = generate_synthetic(n_cells=400, n_genes=60, n_proteins=5,
                           n_celltypes=3, seed=0)
  h5ad = str(tmp_path / "user_data.h5ad")
  write_h5ad(sco, h5ad)

  cfg_path = tmp_path / "cfg.yaml"
  base = {
      "verbose": False,
      "model": {"name": "sisua", "log_norm": True, "beta": 1.0,
                "encoder": {"units": [16], "batchnorm": True},
                "decoder": {"units": [16]}},
      "dataset": {"name": h5ad, "train_percent": 0.8,
                  "labels_percent": 0.5, "batch_size": 64,
                  "dropout_rate": 0.2, "retain_rate": 0.2},
      "variables": {
          "latents": {"event_shape": 6, "posterior": "diag"},
          "transcriptomic": {"posterior": "zinb"},
          "proteomic": {"posterior": "nb"}},
      "train": {"optimizer": "adam", "learning_rate": 1e-3,
                "valid_freq": 0, "clipnorm": 100, "epochs": 2,
                "max_iter": -1, "earlystop_patience": 20},
  }
  with open(cfg_path, "w") as f:
    _yaml.safe_dump(base, f)
  exp = SisuaExperimenter(save_path=str(tmp_path / "exp"),
                          config_path=str(cfg_path))
  exp.run_config(exp.load_config())

  orig_init = SisuaExperimenter.__init__
  monkeypatch.setattr(
      "sisua_tpu.train.experimenter.SisuaExperimenter.__init__",
      lambda self, save_path=None, config_path=None, **kw: orig_init(
          self, save_path=str(tmp_path / "exp"),
          config_path=str(cfg_path), **kw))
  posteriors = evaluate_main(["-model", "sisua", "-ds", h5ad,
                              "-path", str(tmp_path / "figs"),
                              "--no-plots"])
  assert len(posteriors) == 1
  # ResultsSheet scores landed on disk; the scoreboard has the eval table
  assert os.path.isfile(tmp_path / "figs" / "scores.html") or \
      os.path.isfile(tmp_path / "figs" / "scores.csv") or \
      any(f.startswith("scores") for f in os.listdir(tmp_path / "figs"))
  df = exp.scoreboard.read_scores(f"eval_{h5ad}")
  assert len(df) == 1 and any(c.startswith("llk") for c in df.columns)
