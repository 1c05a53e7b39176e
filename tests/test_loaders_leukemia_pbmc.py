"""Offline parse-path tests for the pbmc8k / pbmcecc / leukemia loaders.

Completes the fake-raw-tree coverage across loader families (the other
families live in test_loaders_offline.py / test_cache_drill.py): the
derivation pipeline of `read_PBMC8k`/`read_PBMCeec` (reference
``sisua/data/data_loader/pbmc8k.py:29-131`` / ``pbmcecc.py:22``) and the
GSE132509 tar parser of `read_leukemia_BMMC` (reference
``childhood_leukemia_cALL.py:57``), incl. its cross-sample gene-alignment
branch, plus the MPAL pre-placed-cache contract
(``mixed_phenotype_acute_leukemia.py:155-291``).
"""

import gzip
import io
import os
import tarfile

import numpy as np
import pytest
from scipy import io as sp_io
from scipy import sparse

from sisua_tpu.data.const import OMIC
from sisua_tpu.data.dataset import SingleCellOMIC
from sisua_tpu.data.utils import save_to_dataset


def _fake_pbmc_base(n_ly=8, n_my=5, seed=0):
  """A tiny 10x-like container where the first n_ly cells are strongly
  lymphoid (CD3D/CD19 heavy) and the rest myeloid (LYZ/CD14 heavy)."""
  rng = np.random.default_rng(seed)
  genes = np.array(["CD3D", "CD19", "LYZ", "CD14", "ACTB", "GAPDH"])
  n = n_ly + n_my
  X = rng.poisson(1, (n, len(genes))).astype(np.float32)
  X[:n_ly, 0:2] += 50.0   # lymphoid markers
  X[n_ly:, 2:4] += 50.0   # myeloid markers
  sco = SingleCellOMIC(X, cell_id=[f"c{i}" for i in range(n)],
                       gene_id=genes, omic=OMIC.transcriptomic,
                       name="fake10x")
  return sco, n_ly, n_my


def _offline(monkeypatch, mod):
  """Force the author-bundle fetch onto its offline branch (no urllib)."""
  def _no_net(url, outpath, **kw):
    raise RuntimeError(f"offline test: refused download of {url}")
  monkeypatch.setattr(mod, "download_file", _no_net, raising=False)


@pytest.mark.parametrize("subset,expected", [("ly", 8), ("my", 5),
                                             ("full", 13)])
def test_pbmc8k_parse_path(tmp_path, monkeypatch, subset, expected):
  import sisua_tpu.data.loaders.pbmc8k as pb
  base, n_ly, n_my = _fake_pbmc_base()
  monkeypatch.setattr(pb, "DATA_DIR", str(tmp_path))
  _offline(monkeypatch, pb)
  monkeypatch.setattr(pb, "read_dataset10x",
                      lambda name, **kw: base)
  sco = pb.read_PBMC8k(subset=subset, verbose=False)
  assert sco.n_obs == expected
  # progenitor omic: binary ly/my one-hot consistent with the subset
  prog = sco.numpy(OMIC.progenitor)
  assert prog.shape == (expected, 2)
  np.testing.assert_allclose(prog.sum(1), 1.0)
  if subset == "ly":
    np.testing.assert_allclose(prog[:, 0], 1.0)
  elif subset == "my":
    np.testing.assert_allclose(prog[:, 1], 1.0)
  else:
    assert prog[:, 0].sum() == n_ly and prog[:, 1].sum() == n_my
  # no pre-placed ADT table → marker-gene surrogate proteomic omic
  assert "proteomic" in sco.omics
  assert sco.uns.get("proteomic_is_surrogate") is True
  # second call is a cache hit (read_dataset10x must not be needed)
  monkeypatch.setattr(pb, "read_dataset10x", _raise_if_called)
  sco2 = pb.read_PBMC8k(subset=subset, verbose=False)
  assert sco2.n_obs == expected


def _raise_if_called(*a, **kw):
  raise AssertionError("cache miss: loader re-ran the derivation pipeline")


def test_pbmc8k_preplaced_adt_table(tmp_path, monkeypatch):
  """A pre-placed pbmc8k_adt dataset dir overrides the surrogate."""
  import sisua_tpu.data.loaders.pbmc8k as pb
  base, n_ly, n_my = _fake_pbmc_base()
  n = n_ly + n_my
  adt = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
  save_to_dataset(os.path.join(str(tmp_path), "pbmc8k_adt"), adt,
                  ["CD3", "CD19p", "CD14p"], print_log=False)
  monkeypatch.setattr(pb, "DATA_DIR", str(tmp_path))
  _offline(monkeypatch, pb)
  monkeypatch.setattr(pb, "read_dataset10x", lambda name, **kw: base)
  sco = pb.read_PBMC8k(subset="full", verbose=False)
  assert sco.get_dim("proteomic") == 3
  assert "proteomic_is_surrogate" not in sco.uns


def test_pbmcecc_parse_path(tmp_path, monkeypatch):
  import sisua_tpu.data.loaders.pbmc8k as pb
  import sisua_tpu.data.loaders.pbmcecc as pe
  base, n_ly, n_my = _fake_pbmc_base(seed=3)
  monkeypatch.setattr(pe, "DATA_DIR", str(tmp_path))
  _offline(monkeypatch, pb)  # _fetch_author_bundle lives in pbmc8k
  monkeypatch.setattr(pe, "read_dataset10x", lambda name, **kw: base)
  sco = pe.read_PBMCeec(subset="ly", verbose=False)
  assert sco.n_obs == n_ly
  assert "proteomic" in sco.omics  # marker surrogate
  assert sco.name.startswith("pbmcecc_ly")


# ------------------------------------------------- author bundles (real ADT)

def _author_npz(path, n, seed, full=False):
  """Materialize a fake author-preprocessed bundle in the reference's npz
  schema (pbmc8k.py:60-100): ly/my carry X_filt/X_full [+_col], full
  carries X/X_col; both carry X_row + the real protein table y/y_col."""
  rng = np.random.default_rng(seed)
  genes = np.array(["CD3D", "LYZ", "ACTB", "DEADGENE", "GAPDH"])
  X = rng.poisson(2, (n, len(genes))).astype(np.float32) + 1.0
  X[:, 3] = 0.0  # all-zero column must be dropped
  y = rng.poisson(20, (n, 3)).astype(np.float32)
  y_col = np.array(["CD3", "CD4", "CD8"])
  rows = np.array([f"CELL{seed}_{i}" for i in range(n)])
  if full:
    np.savez(path, X=X, X_col=genes, X_row=rows, y=y, y_col=y_col)
  else:
    np.savez(path, X_filt=X[:, :3], X_filt_col=genes[:3], X_full=X,
             X_full_col=genes, X_row=rows, y=y, y_col=y_col)
  return X, y, y_col, rows


def _serve_downloads(monkeypatch, mod, files):
  """download_file stand-in serving pre-materialized files by basename."""
  def fake(url, outpath, **kw):
    base = os.path.basename(url)
    if base not in files:
      raise RuntimeError(f"no such bundle: {url}")
    return str(files[base])
  monkeypatch.setattr(mod, "download_file", fake)


def test_pbmc8k_author_bundle_real_adt(tmp_path, monkeypatch):
  """Networked path: the public S3 npz bundle yields REAL per-cell ADT (no
  surrogate flag), lymphoid progenitor labels, zero-column drop, and a
  cache that reloads without re-downloading."""
  import sisua_tpu.data.loaders.pbmc8k as pb
  npz = tmp_path / "pbmc8k_ly.npz"
  X, y, y_col, rows = _author_npz(str(npz), n=9, seed=1)
  monkeypatch.setattr(pb, "DATA_DIR", str(tmp_path / "data"))
  monkeypatch.setattr(pb, "DOWNLOAD_DIR", str(tmp_path / "dl"))
  monkeypatch.setattr(pb, "read_dataset10x", _raise_if_called)
  _serve_downloads(monkeypatch, pb, {"pbmc8k_ly.npz": npz})
  sco = pb.read_PBMC8k(subset="ly", verbose=False)
  assert sco.n_obs == 9
  # filtered genes minus the all-zero column
  assert list(sco.var_names) == ["CD3D", "LYZ", "ACTB"]
  np.testing.assert_allclose(sco.numpy(OMIC.proteomic), y)
  assert list(sco.get_var_names(OMIC.proteomic)) == list(y_col)
  assert "proteomic_is_surrogate" not in sco.uns
  prog = sco.numpy(OMIC.progenitor)
  names = list(sco.get_var_names(OMIC.progenitor))
  np.testing.assert_allclose(prog[:, names.index("lymphoid")], 1.0)
  # cache hit: no download, no 10x rebuild
  _offline(monkeypatch, pb)
  sco2 = pb.read_PBMC8k(subset="ly", verbose=False)
  np.testing.assert_allclose(sco2.numpy(OMIC.proteomic), y)


def test_pbmc8k_author_bundle_full_lineage(tmp_path, monkeypatch):
  """The full bundle derives ly/my membership from the ly bundle's rows
  (reference pbmc8k.py:77)."""
  import sisua_tpu.data.loaders.pbmc8k as pb
  full_npz = tmp_path / "pbmc8k_full.npz"
  _, y, _, rows = _author_npz(str(full_npz), n=12, seed=2, full=True)
  ly_npz = tmp_path / "pbmc8k_ly.npz"
  # the ly bundle's rows are the first 7 cells of the full run
  rng = np.random.default_rng(3)
  np.savez(str(ly_npz), X_filt=rng.poisson(1, (7, 2)).astype(np.float32),
           X_filt_col=np.array(["CD3D", "ACTB"]),
           X_full=rng.poisson(1, (7, 2)).astype(np.float32),
           X_full_col=np.array(["CD3D", "ACTB"]),
           X_row=rows[:7], y=y[:7], y_col=np.array(["CD3", "CD4", "CD8"]))
  monkeypatch.setattr(pb, "DATA_DIR", str(tmp_path / "data"))
  monkeypatch.setattr(pb, "DOWNLOAD_DIR", str(tmp_path / "dl"))
  monkeypatch.setattr(pb, "read_dataset10x", _raise_if_called)
  _serve_downloads(monkeypatch, pb, {"pbmc8k_full.npz": full_npz,
                                     "pbmc8k_ly.npz": ly_npz})
  sco = pb.read_PBMC8k(subset="full", verbose=False)
  assert sco.n_obs == 12
  prog = sco.numpy(OMIC.progenitor)
  names = list(sco.get_var_names(OMIC.progenitor))
  np.testing.assert_allclose(prog[:7, names.index("lymphoid")], 1.0)
  np.testing.assert_allclose(prog[7:, names.index("myeloid")], 1.0)
  np.testing.assert_allclose(sco.numpy(OMIC.proteomic), y)


def test_pbmcecc_author_bundle_real_adt(tmp_path, monkeypatch):
  import sisua_tpu.data.loaders.pbmc8k as pb
  import sisua_tpu.data.loaders.pbmcecc as pe
  npz = tmp_path / "pbmcecc_ly.npz"
  _, y, _, _ = _author_npz(str(npz), n=6, seed=4)
  monkeypatch.setattr(pe, "DATA_DIR", str(tmp_path / "data"))
  monkeypatch.setattr(pb, "DOWNLOAD_DIR", str(tmp_path / "dl"))
  monkeypatch.setattr(pe, "read_dataset10x", _raise_if_called)
  _serve_downloads(monkeypatch, pb, {"pbmcecc_ly.npz": npz})
  sco = pe.read_PBMCeec(subset="ly", verbose=False)
  assert sco.n_obs == 6
  np.testing.assert_allclose(sco.numpy(OMIC.proteomic), y)
  assert "proteomic_is_surrogate" not in sco.uns


# ---------------------------------------------------------------- leukemia

def _gz_bytes(text: str) -> bytes:
  buf = io.BytesIO()
  with gzip.GzipFile(fileobj=buf, mode="wb") as f:
    f.write(text.encode())
  return buf.getvalue()


def _mtx_gz_bytes(X) -> bytes:
  buf = io.BytesIO()
  sp_io.mmwrite(buf, sparse.coo_matrix(X))
  return _gz_bytes(buf.getvalue().decode())


def _add_bytes(tar, name, data):
  info = tarfile.TarInfo(name)
  info.size = len(data)
  tar.addfile(info, io.BytesIO(data))


def test_leukemia_bmmc_parse_path(tmp_path, monkeypatch):
  """GSE132509 tar parser: two samples with DIFFERENT gene orderings (the
  alignment branch), disease labels from sample names, gene filtering."""
  import sisua_tpu.data.loaders.leukemia as lk
  rng = np.random.default_rng(7)
  genes1 = ["TP53", "MYC", "ACTB", "RARE1"]
  # sample 2 ships a permuted gene list missing RARE1, plus a novel gene
  genes2 = ["ACTB", "TP53", "MYC", "NOVEL9"]
  # matrices are stored genes × cells in 10x triplets (loader transposes)
  X1 = rng.poisson(3, (len(genes1), 5)).astype(np.float32)
  X1[3, :] = 0.0  # RARE1 never expressed → filtered out
  X2 = rng.poisson(3, (len(genes2), 4)).astype(np.float32)
  tar_path = tmp_path / "dl" / "GSE132509_RAW.tar"
  os.makedirs(tar_path.parent, exist_ok=True)
  with tarfile.open(tar_path, "w") as t:
    for s, genes, X in [("GSM1_ETV6-RUNX1_1", genes1, X1),
                        ("GSM2_HHD_1", genes2, X2)]:
      _add_bytes(t, f"{s}.matrix.mtx.gz", _mtx_gz_bytes(X))
      _add_bytes(t, f"{s}.genes.tsv.gz",
                 _gz_bytes("".join(f"ENS{i}\t{g}\n"
                                   for i, g in enumerate(genes))))
      _add_bytes(t, f"{s}.barcodes.tsv.gz",
                 _gz_bytes("".join(f"BC{i}\n" for i in range(X.shape[1]))))
  monkeypatch.setattr(lk, "DATA_DIR", str(tmp_path / "data"))
  monkeypatch.setattr(lk, "DOWNLOAD_DIR", str(tmp_path / "dl"))
  monkeypatch.setattr(lk, "download_file",
                      lambda url, out, **kw: str(tar_path))
  sco = lk.read_leukemia_BMMC(filtered_genes=True, verbose=False)
  assert sco.n_obs == 9
  # columns follow sample 1's gene list; RARE1 dropped by the ≥0.5% filter
  assert list(sco.var_names) == ["TP53", "MYC", "ACTB"]
  X = np.asarray(sco.X.todense()) if sparse.issparse(sco.X) else sco.X
  # sample 2's rows must be column-aligned despite its permuted ordering
  np.testing.assert_allclose(X[5:, 0], X2[1], err_msg="TP53 misaligned")
  np.testing.assert_allclose(X[5:, 2], X2[0], err_msg="ACTB misaligned")
  dis = sco.numpy(OMIC.disease)
  names = list(sco.get_var_names(OMIC.disease))
  assert set(names) == {"ETV6-RUNX1", "HHD"}
  assert dis[: 5, names.index("ETV6-RUNX1")].all()
  assert dis[5:, names.index("HHD")].all()


def test_leukemia_mpal_requires_preplaced_cache(tmp_path, monkeypatch):
  """Offline contract: without an R-converted cache the loader fails with
  an actionable message; with one it loads RNA+ADT."""
  import sisua_tpu.data.loaders.leukemia as lk
  monkeypatch.setattr(lk, "DATA_DIR", str(tmp_path))
  with pytest.raises(RuntimeError, match="convert_rds"):
    lk.read_leukemia_MixedPhenotypes(omic="rna", verbose=False)
  rng = np.random.default_rng(11)
  X = rng.poisson(2, (12, 20)).astype(np.float32)
  adt = rng.poisson(9, (12, 4)).astype(np.float32)
  save_to_dataset(os.path.join(str(tmp_path), "mpal_rna_preprocessed"),
                  X, [f"g{i}" for i in range(20)], y=adt,
                  y_col=["CD3", "CD4", "CD8", "CD19"], print_log=False)
  sco = lk.read_leukemia_MixedPhenotypes(omic="rna", verbose=False)
  assert sco.n_obs == 12
  assert sco.get_dim(OMIC.proteomic) == 4
