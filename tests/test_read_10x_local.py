"""User-local 10x ingestion (`read_10x_mtx` / `read_10x_h5`): scanpy's
onboarding surface without downloads — CellRanger matrix directories
(plain + gzipped, CITE-seq ADT split, peaks→atac) and v3/legacy-v2 h5
files, plus the `get_dataset(path)` dispatch."""

import gzip
import os

import numpy as np
import pytest
from scipy import io as sp_io
from scipy import sparse

from sisua_tpu.data import get_dataset, read_10x_h5, read_10x_mtx

N_CELLS, N_GENES, N_ADT = 30, 12, 3


def _make_matrix(seed=0):
  rng = np.random.RandomState(seed)
  X = rng.negative_binomial(2, 0.3, size=(N_CELLS, N_GENES + N_ADT))
  return X.astype(np.float32)


def _write_mtx_dir(d, X, gz=False, legacy_genes=False, peaks=False):
  os.makedirs(d, exist_ok=True)
  opener = gzip.open if gz else open
  sfx = ".gz" if gz else ""
  # CellRanger stores features × cells
  sp_io.mmwrite(os.path.join(d, "matrix.mtx"), sparse.csr_matrix(X.T))
  if gz:
    with open(os.path.join(d, "matrix.mtx"), "rb") as fin, \
        gzip.open(os.path.join(d, "matrix.mtx.gz"), "wb") as fout:
      fout.write(fin.read())
    os.remove(os.path.join(d, "matrix.mtx"))
  with opener(os.path.join(d, f"barcodes.tsv{sfx}"), "wt") as f:
    for i in range(X.shape[0]):
      f.write(f"CELL{i:04d}-1\n")
  if peaks:
    with opener(os.path.join(d, f"peaks.bed{sfx}"), "wt") as f:
      for j in range(X.shape[1]):
        f.write(f"chr1\t{100 * j}\t{100 * j + 50}\n")
    return
  fname = "genes.tsv" if legacy_genes else "features.tsv"
  with opener(os.path.join(d, f"{fname}{sfx}"), "wt") as f:
    for j in range(X.shape[1]):
      if legacy_genes:
        f.write(f"ENSG{j:05d}\tGene{j:03d}\n")
      else:
        kind = "Antibody Capture" if j >= N_GENES else "Gene Expression"
        f.write(f"ENSG{j:05d}\tFeat{j:03d}\t{kind}\n")


def _write_v3_h5(path, X):
  import h5py
  C = sparse.csc_matrix(X.T)  # features × cells, CSC — the 10x layout
  with h5py.File(path, "w") as f:
    g = f.create_group("matrix")
    g.create_dataset("data", data=C.data)
    g.create_dataset("indices", data=C.indices)
    g.create_dataset("indptr", data=C.indptr)
    g.create_dataset("shape", data=np.asarray(C.shape, np.int64))
    g.create_dataset("barcodes", data=np.asarray(
        [f"CELL{i:04d}-1".encode() for i in range(X.shape[0])]))
    feats = g.create_group("features")
    feats.create_dataset("name", data=np.asarray(
        [f"Feat{j:03d}".encode() for j in range(X.shape[1])]))
    feats.create_dataset("feature_type", data=np.asarray(
        [(b"Antibody Capture" if j >= N_GENES else b"Gene Expression")
         for j in range(X.shape[1])]))


def test_read_10x_mtx_citeseq_split(tmp_path):
  X = _make_matrix()
  d = str(tmp_path / "filtered_feature_bc_matrix")
  _write_mtx_dir(d, X)
  sco = read_10x_mtx(d)
  assert sco.shape == (N_CELLS, N_GENES)
  assert "proteomic" in sco.omics
  np.testing.assert_allclose(sco.numpy(), X[:, :N_GENES])
  np.testing.assert_allclose(sco.numpy("proteomic"), X[:, N_GENES:])
  assert list(sco.get_var_names("proteomic")) == [
      f"Feat{j:03d}" for j in range(N_GENES, N_GENES + N_ADT)]
  assert sco.obs_names[0] == "CELL0000-1"


def test_read_10x_mtx_gz_and_legacy(tmp_path):
  X = _make_matrix(1)
  d = str(tmp_path / "gzdir")
  _write_mtx_dir(d, X, gz=True, legacy_genes=True)
  sco = read_10x_mtx(d, name="mylib")
  # legacy genes.tsv has no feature_type column → everything is RNA
  assert sco.shape == (N_CELLS, N_GENES + N_ADT)
  assert sco.name.startswith("mylib") and "proteomic" not in sco.omics
  assert list(sco.var_names)[:2] == ["Gene000", "Gene001"]


def test_read_10x_mtx_peaks_to_atac(tmp_path):
  X = _make_matrix(2)
  d = str(tmp_path / "atacdir")
  _write_mtx_dir(d, X, peaks=True)
  sco = read_10x_mtx(d)
  assert "atac" in sco.omics and sco.current_omic == "atac"
  assert list(sco.var_names)[0] == "chr1:0:50"


def test_read_10x_h5_matches_mtx(tmp_path):
  X = _make_matrix(3)
  d = str(tmp_path / "mtxdir")
  _write_mtx_dir(d, X)
  h5 = str(tmp_path / "sample_filtered_feature_bc_matrix.h5")
  _write_v3_h5(h5, X)
  a, b = read_10x_mtx(d), read_10x_h5(h5)
  np.testing.assert_allclose(a.numpy(), b.numpy())
  np.testing.assert_allclose(a.numpy("proteomic"), b.numpy("proteomic"))
  assert list(b.var_names) == [f"Feat{j:03d}" for j in range(N_GENES)]


def test_read_10x_h5_legacy_v2(tmp_path):
  import h5py
  X = _make_matrix(4)
  path = str(tmp_path / "v2.h5")
  C = sparse.csc_matrix(X.T)
  with h5py.File(path, "w") as f:
    g = f.create_group("GRCh38")
    g.create_dataset("data", data=C.data)
    g.create_dataset("indices", data=C.indices)
    g.create_dataset("indptr", data=C.indptr)
    g.create_dataset("shape", data=np.asarray(C.shape, np.int64))
    g.create_dataset("barcodes", data=np.asarray(
        [f"C{i}".encode() for i in range(X.shape[0])]))
    g.create_dataset("genes", data=np.asarray(
        [f"ENSG{j:05d}".encode() for j in range(X.shape[1])]))
    g.create_dataset("gene_names", data=np.asarray(
        [f"G{j}".encode() for j in range(X.shape[1])]))
  sco = read_10x_h5(path)
  assert sco.shape == X.shape and "proteomic" not in sco.omics
  np.testing.assert_allclose(sco.numpy(), X)


def test_get_dataset_dispatches_local_paths(tmp_path):
  X = _make_matrix(5)
  d = str(tmp_path / "mtxdir")
  _write_mtx_dir(d, X)
  h5 = str(tmp_path / "m.h5")
  _write_v3_h5(h5, X)
  np.testing.assert_allclose(get_dataset(d).numpy(),
                             get_dataset(h5).numpy())


def test_read_10x_mtx_filtered_genes(tmp_path):
  X = _make_matrix(6)
  X[:, 2] = 0.0  # an all-zero gene
  d = str(tmp_path / "z")
  _write_mtx_dir(d, X)
  sco = read_10x_mtx(d, filtered_genes=True)
  assert sco.shape == (N_CELLS, N_GENES - 1)
  assert "Feat002" not in list(sco.var_names)
