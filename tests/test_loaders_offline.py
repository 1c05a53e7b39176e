"""Loader parse paths exercised offline with synthetic raw files.

The real downloads are network-gated, but the parsing/preprocessing logic
(10x mtx triplets, Linnarsson cortex tab file, GEO CITE-seq CSV matrices,
cache persistence) is testable by materializing tiny files in the expected
formats.
"""

import gzip
import os
import tarfile

import numpy as np
import pytest
from scipy import io as sp_io
from scipy import sparse

from sisua_tpu.data.utils import (load_from_dataset, md5_checksum,
                                  read_compressed, save_to_dataset)


def test_save_load_dataset_roundtrip(tmp_path):
  rng = np.random.default_rng(0)
  X = sparse.csr_matrix(rng.poisson(1, (30, 12)).astype(np.float32))
  y = rng.poisson(5, (30, 3)).astype(np.float32)
  path = str(tmp_path / "ds")
  save_to_dataset(path, X, [f"g{i}" for i in range(12)], y=y,
                  y_col=["a", "b", "c"], print_log=False)
  X2, X_col, X_row, y2, y_col = load_from_dataset(path)
  np.testing.assert_allclose(np.asarray(X.todense()),
                             np.asarray(X2.todense()))
  np.testing.assert_allclose(y, y2)
  assert list(y_col) == ["a", "b", "c"]
  assert len(X_row) == 30


def test_read_compressed_tar_and_gz(tmp_path):
  inner = tmp_path / "payload.txt"
  inner.write_text("hello")
  tar_path = tmp_path / "a.tar.gz"
  with tarfile.open(tar_path, "w:gz") as t:
    t.add(inner, arcname="payload.txt")
  out = read_compressed(str(tar_path), str(tmp_path / "out"))
  assert any(p.endswith("payload.txt") for p in out)
  gz_path = tmp_path / "b.txt.gz"
  with gzip.open(gz_path, "wt") as f:
    f.write("world")
  out2 = read_compressed(str(gz_path), str(tmp_path / "out2"))
  assert open(out2[0]).read() == "world"


def test_md5_checksum(tmp_path):
  p = tmp_path / "f.bin"
  p.write_bytes(b"12345")
  assert md5_checksum(str(p)) == "827ccb0eea8a706c4c34a16891f84e7b"


def _make_10x_archive(tmp_path, with_adt: bool):
  """Build a v3-style filtered_feature_bc_matrix tar.gz."""
  rng = np.random.default_rng(0)
  n_cells, n_genes, n_adt = 20, 15, 4 if with_adt else 0
  X = sparse.csr_matrix(
      rng.poisson(1.0, (n_genes + n_adt, n_cells)).astype(np.float32))
  d = tmp_path / "filtered_feature_bc_matrix"
  os.makedirs(d, exist_ok=True)
  sp_io.mmwrite(str(d / "matrix.mtx"), X.tocoo())
  with gzip.open(d / "barcodes.tsv.gz", "wt") as f:
    for i in range(n_cells):
      f.write(f"BC{i:04d}-1\n")
  with gzip.open(d / "features.tsv.gz", "wt") as f:
    for i in range(n_genes):
      f.write(f"ENSG{i:05d}\tGene{i}\tGene Expression\n")
    for i in range(n_adt):
      f.write(f"ADT{i}\tCD{i + 3}\tAntibody Capture\n")
  # 10x ships matrix.mtx.gz in v3; gzip it
  with open(d / "matrix.mtx", "rb") as fin, \
       gzip.open(d / "matrix.mtx.gz", "wb") as fout:
    fout.write(fin.read())
  os.remove(d / "matrix.mtx")
  tar_path = tmp_path / "sample_filtered_feature_bc_matrix.tar.gz"
  with tarfile.open(tar_path, "w:gz") as t:
    t.add(d, arcname="filtered_feature_bc_matrix")
  return tar_path, n_cells, n_genes, n_adt


def test_tenx_parse_path(tmp_path, monkeypatch):
  """Drive read_dataset10x's parse/preprocess path on a synthetic archive
  (download monkeypatched to the local file)."""
  import sisua_tpu.data.loaders.tenx as tenx
  tar_path, n_cells, n_genes, n_adt = _make_10x_archive(tmp_path, True)
  monkeypatch.setattr(tenx, "DATA_DIR", str(tmp_path / "data"))
  monkeypatch.setattr(tenx, "DOWNLOAD_DIR", str(tmp_path / "dl"))
  os.makedirs(tmp_path / "data", exist_ok=True)
  os.makedirs(tmp_path / "dl", exist_ok=True)
  monkeypatch.setattr(tenx, "download_file",
                      lambda url, out, **kw: str(tar_path))
  # extraction expects the tar at DOWNLOAD_DIR/<catalog filename>
  import shutil
  expected = os.path.basename(
      tenx._matrix_url(*tenx.TENX_CATALOG["pbmc4k"], filtered=True))
  shutil.copy(tar_path, tmp_path / "dl" / expected)
  sco = tenx.read_dataset10x("pbmc4k", verbose=False)
  assert sco.n_obs == n_cells
  assert "proteomic" in sco.omics
  assert sco.get_dim("proteomic") == n_adt
  assert sco.n_vars <= n_genes  # zero-count genes filtered
  # cache hit on second call (no download)
  sco2 = tenx.read_dataset10x("pbmc4k", verbose=False)
  assert sco2 == sco


def test_cortex_parse_path(tmp_path, monkeypatch):
  """Drive read_Cortex's Linnarsson-format parser on a synthetic file."""
  import sisua_tpu.data.loaders.scvi_datasets as sd
  rng = np.random.default_rng(1)
  n_cells, n_genes = 25, 40
  classes = ["astro", "neuron", "oligo"]
  labels = [classes[i % 3] for i in range(n_cells)]
  raw = tmp_path / "cortex.txt"
  with open(raw, "w") as f:
    # header rows: the parser looks for the 'group #' row (col0), values
    # start at column 2
    f.write("tissue\t\t" + "\t".join(["ctx"] * n_cells) + "\n")
    f.write("group #\t\t" + "\t".join(labels) + "\n")
    f.write("total mRNA mol\t\t" + "\t".join(["100"] * n_cells) + "\n")
    for g in range(n_genes):
      vals = rng.poisson(2, n_cells)
      f.write(f"Gene{g}\t0\t" + "\t".join(map(str, vals)) + "\n")
  monkeypatch.setattr(sd, "DATA_DIR", str(tmp_path / "data"))
  monkeypatch.setattr(sd, "DOWNLOAD_DIR", str(tmp_path / "dl"))
  os.makedirs(tmp_path / "data", exist_ok=True)
  monkeypatch.setattr(sd, "download_file", lambda url, out, **kw: str(raw))
  # the loader reads from its own path; copy raw to the expected location
  os.makedirs(tmp_path / "dl", exist_ok=True)
  import shutil
  shutil.copy(raw, tmp_path / "dl" / "cortex_expression_mRNA.txt")
  sco = sd.read_Cortex(verbose=False, n_top_genes=30)
  assert sco.n_obs == n_cells
  assert sco.n_vars == 30  # top-HVG selection applied
  assert sco.get_dim("celltype") == 3
  onehot = sco.numpy("celltype")
  np.testing.assert_allclose(onehot.sum(1), 1.0)


def test_citeseq_parse_path(tmp_path, monkeypatch):
  """Drive the GEO CITE-seq CSV parse path (human-cell filtering, ADT
  standardization)."""
  import pandas as pd
  import sisua_tpu.data.loaders.citeseq as cs
  rng = np.random.default_rng(2)
  cells = [f"cell{i}" for i in range(18)]
  genes = [f"HUMAN_G{i}" for i in range(25)] + ["MOUSE_Bad1", "MOUSE_Bad2"]
  rna = pd.DataFrame(rng.poisson(2, (27, 18)), index=genes, columns=cells)
  # clean human cells: zero mouse counts; 3 mouse-dominated cells dropped
  rna.iloc[25:, :] = 0
  rna.iloc[:25, :3] = 0
  rna.iloc[25:, :3] = 50
  adt = pd.DataFrame(rng.poisson(30, (3, 18)),
                     index=["CD4", "CD8a", "CD3-TotalSeqB"], columns=cells)
  p_rna = tmp_path / "rna.csv.gz"
  p_adt = tmp_path / "adt.csv.gz"
  rna.to_csv(p_rna, compression="gzip")
  adt.to_csv(p_adt, compression="gzip")
  monkeypatch.setattr(cs, "DATA_DIR", str(tmp_path / "data"))
  monkeypatch.setattr(cs, "DOWNLOAD_DIR", str(tmp_path / "dl"))
  os.makedirs(tmp_path / "data", exist_ok=True)
  os.makedirs(tmp_path / "dl", exist_ok=True)
  import shutil
  shutil.copy(p_rna, tmp_path / "dl" / "cbmc_rna.csv.gz")
  shutil.copy(p_adt, tmp_path / "dl" / "cbmc_adt.csv.gz")
  monkeypatch.setattr(cs, "download_file", lambda url, out, **kw: out)
  sco = cs.read_CITEseq_CBMC(verbose=False, filtered_genes=False)
  assert sco.n_obs == 15  # 3 mouse-dominated cells dropped
  assert "MOUSE_Bad1" not in set(sco.get_var_names())
  prot = set(map(str, sco.get_var_names("proteomic")))
  assert prot == {"CD4", "CD8", "CD3"}  # standardized names
