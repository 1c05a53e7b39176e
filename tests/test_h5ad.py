"""Native .h5ad interop (AnnData on-disk spec via h5py, no anndata dep).

The reference's container is an AnnData subclass; users migrating from it
carry .h5ad files. Covers: dense + CSR X, obs index/plain/categorical
columns, obsm → omics conventions (scvi-tools 'protein_expression'),
write→read round-trip of a multi-omic container.
"""

import os

import numpy as np
import pytest
from scipy import sparse

from sisua_tpu.data import generate_synthetic, read_h5ad, write_h5ad


def test_roundtrip_multi_omic(tmp_path):
  sco = generate_synthetic(n_cells=150, n_genes=25, n_proteins=4, seed=2)
  path = str(tmp_path / "rt.h5ad")
  write_h5ad(sco, path)
  back = read_h5ad(path)
  assert set(back.omics) == set(sco.omics)
  np.testing.assert_allclose(back.numpy(), sco.numpy())
  np.testing.assert_allclose(back.numpy("proteomic"),
                             sco.numpy("proteomic"))
  assert list(back.get_var_names("proteomic")) == \
      list(sco.get_var_names("proteomic"))
  assert list(back.obs.index) == list(sco.obs.index)
  assert list(back.var_names) == list(sco.var_names)


def test_read_scvi_convention_file(tmp_path):
  """Foreign h5ad: CSR X group, categorical obs column, protein obsm."""
  h5py = pytest.importorskip("h5py")
  path = str(tmp_path / "foreign.h5ad")
  rng = np.random.default_rng(0)
  X = sparse.random(60, 20, density=0.3, format="csr",
                    random_state=0, dtype=np.float32)
  with h5py.File(path, "w") as f:
    g = f.create_group("X")
    g.attrs["encoding-type"] = "csr_matrix"
    g.attrs["shape"] = np.asarray(X.shape, np.int64)
    g.create_dataset("data", data=X.data)
    g.create_dataset("indices", data=X.indices)
    g.create_dataset("indptr", data=X.indptr)
    obs = f.create_group("obs")
    obs.attrs["_index"] = "_index"
    obs.create_dataset("_index",
                       data=np.asarray([f"c{i}" for i in range(60)],
                                       dtype="S"))
    cat = obs.create_group("batch")
    cat.create_dataset("categories", data=np.asarray(["b0", "b1"],
                                                     dtype="S"))
    cat.create_dataset("codes", data=rng.integers(0, 2, 60))
    var = f.create_group("var")
    var.attrs["_index"] = "_index"
    var.create_dataset("_index",
                       data=np.asarray([f"g{i}" for i in range(20)],
                                       dtype="S"))
    f.create_group("obsm").create_dataset(
        "protein_expression",
        data=rng.poisson(5, (60, 3)).astype(np.float32))
  sco = read_h5ad(path)
  assert "proteomic" in sco.omics
  np.testing.assert_allclose(sco.numpy(), np.asarray(X.todense()))
  assert set(sco.obs["batch"]) <= {"b0", "b1"}
  assert sco.numpy("proteomic").shape == (60, 3)
  # a trained model consumes it directly
  from sisua_tpu.models import VAE, RVmeta
  m = VAE(RVmeta(20, "zinb", name="rna"), encoder={"units": [16]},
          decoder={"units": [16]})
  m.fit(sco, epochs=1, batch_size=32, valid_freq=0, patience=0)
  assert np.isfinite(m.history["loss"]).all()


def test_obs_indices_column_not_clobbered(tmp_path):
  """A file obs column named 'indices' must not overwrite the container's
  row-provenance column (review finding)."""
  h5py = pytest.importorskip("h5py")
  path = str(tmp_path / "collide.h5ad")
  with h5py.File(path, "w") as f:
    f.create_dataset("X", data=np.ones((10, 5), np.float32))
    obs = f.create_group("obs")
    obs.attrs["_index"] = "_index"
    obs.create_dataset("_index",
                       data=np.asarray([f"c{i}" for i in range(10)],
                                       dtype="S"))
    obs.create_dataset("indices", data=np.arange(100, 110))  # foreign ints
    var = f.create_group("var")
    var.attrs["_index"] = "_index"
    var.create_dataset("_index",
                       data=np.asarray([f"g{i}" for i in range(5)],
                                       dtype="S"))
  sco = read_h5ad(path)
  np.testing.assert_array_equal(sco.obs["indices"].to_numpy(),
                                np.arange(10))  # provenance intact
  np.testing.assert_array_equal(sco.obs["file_indices"].to_numpy(),
                                np.arange(100, 110))
