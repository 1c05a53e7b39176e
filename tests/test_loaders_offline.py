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

pytestmark = pytest.mark.smoke  # entire file is sub-second parse-path checks

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


# ---------------------------------------------------------------------------
# round-2 loaders: real preprocess pipelines parse-tested offline
# ---------------------------------------------------------------------------
def _patch_dirs(monkeypatch, mod, tmp_path):
  monkeypatch.setattr(mod, "DATA_DIR", str(tmp_path / "data"))
  monkeypatch.setattr(mod, "DOWNLOAD_DIR", str(tmp_path / "dl"))
  os.makedirs(tmp_path / "data", exist_ok=True)
  os.makedirs(tmp_path / "dl", exist_ok=True)


def _gene_table(rng, cells, genes, scale=4.0):
  """genes-as-rows tab table with a cell-id header row (E-MTAB-3929 style)."""
  lines = ["\t" + "\t".join(cells)]
  vals = rng.poisson(scale, (len(genes), len(cells)))
  for g, row in zip(genes, vals):
    lines.append(g + "\t" + "\t".join(map(str, row)))
  return "\n".join(lines) + "\n", vals


def test_embryos_parse_path(tmp_path, monkeypatch):
  """Drive read_human_embryos' zip→tab-matrix→filters pipeline."""
  import zipfile as zf
  import sisua_tpu.data.loaders.misc as misc
  rng = np.random.default_rng(3)
  cells = [f"E{3 + i % 4}.{i % 3 + 1}.{i}" for i in range(30)]
  genes = [f"G{i}" for i in range(40)]
  erccs = [f"ERCC-{i:05d}" for i in range(5)]
  counts_txt, _ = _gene_table(rng, cells, genes, scale=4.0)
  rpkm_txt, _ = _gene_table(rng, cells, genes, scale=6.0)
  ercc_counts, _ = _gene_table(rng, cells, erccs)
  ercc_rpkm, _ = _gene_table(rng, cells, erccs)
  contents = {1: [("counts.txt", counts_txt)],
              2: [("rpkm.txt", rpkm_txt)],
              3: [("ercc.counts.txt", ercc_counts)],
              4: [("ercc.rpkm.txt", ercc_rpkm)]}
  paths = {}
  for k, files in contents.items():
    p = tmp_path / f"E-MTAB-3929.processed.{k}.zip"
    with zf.ZipFile(p, "w") as z:
      for name, text in files:
        z.writestr(name, text)
    paths[os.path.basename(str(p))] = str(p)
  _patch_dirs(monkeypatch, misc, tmp_path)
  monkeypatch.setattr(misc, "download_file",
                      lambda url, out, **kw: paths[os.path.basename(url)])
  sco = misc.read_human_embryos(verbose=False)
  assert sco.n_obs == 30
  assert 0 < sco.n_vars <= 40  # RPKM/expressing-cell filters applied
  assert "rpkm" in sco.omics and "ercc" in sco.omics
  assert sco.get_dim("ercc") == 5
  # embryonic-day labels: E3..E6 → 4 one-hot classes
  assert sco.get_dim("celltype") == 4
  np.testing.assert_allclose(sco.numpy("celltype").sum(1), 1.0)
  # second call is a pure cache hit (download_file would KeyError)
  monkeypatch.setattr(misc, "download_file",
                      lambda url, out, **kw: (_ for _ in ()).throw(
                          AssertionError("cache miss")))
  sco2 = misc.read_human_embryos(verbose=False)
  assert sco2.n_obs == sco.n_obs and sco2.n_vars == sco.n_vars


def test_centenarian_parse_path(tmp_path, monkeypatch):
  """Drive read_centenarian's gzipped-TSV + barcode-sheet pipeline."""
  import sisua_tpu.data.loaders.misc as misc
  rng = np.random.default_rng(4)
  cells = [f"BC{i:04d}" for i in range(25)]
  samples = [("SC1" if i % 3 else "CT1") for i in range(25)]
  genes = [f"ENSG{i:05d}" for i in range(30)]
  umi = tmp_path / "01.UMI.txt.gz"
  with gzip.open(umi, "wt") as f:
    f.write("\t".join(cells) + "\n")
    for g in genes:
      f.write(g + "\t" + "\t".join(
          map(str, rng.poisson(2, len(cells)))) + "\n")
  bc = tmp_path / "03.Cell.Barcodes.txt.gz"
  with gzip.open(bc, "wt") as f:
    for c, s in zip(cells, samples):
      f.write(f"{c}\t{s}\t{s[:2]}\n")
  paths = {"01.UMI.txt.gz": str(umi), "03.Cell.Barcodes.txt.gz": str(bc)}
  _patch_dirs(monkeypatch, misc, tmp_path)
  monkeypatch.setattr(misc, "download_file",
                      lambda url, out, **kw: paths[os.path.basename(url)])
  sco = misc.read_centenarian(verbose=False)
  assert sco.n_obs == 25 and sco.n_vars == 30
  assert sco.get_dim("disease") == 2  # SC1 + CT1 sample one-hots
  np.testing.assert_allclose(sco.numpy("disease").sum(1), 1.0)


def test_scale_parse_path(tmp_path, monkeypatch):
  """Drive read_scale_dataset's zip-of-npy-blobs pipeline."""
  import zipfile as zf
  import sisua_tpu.data.loaders.misc as misc
  rng = np.random.default_rng(5)
  n_cells, n_peaks = 20, 50
  x = sparse.csr_matrix(
      (rng.random((n_cells, n_peaks)) < 0.2).astype(np.float32))
  blob_dir = tmp_path / "blobs"
  os.makedirs(blob_dir)
  with open(blob_dir / "forebrain_x", "wb") as f:
    sparse.save_npz(f, x)
  with open(blob_dir / "forebrain_cell", "wb") as f:
    np.save(f, np.array([f"c{i}" for i in range(n_cells)]))
  with open(blob_dir / "forebrain_peak", "wb") as f:
    np.save(f, np.array([f"chr1:{i}-{i + 500}" for i in range(n_peaks)]))
  with open(blob_dir / "forebrain_labels", "wb") as f:
    np.save(f, np.array(["ex" if i % 2 else "inh" for i in range(n_cells)]))
  zpath = tmp_path / "scale_datasets.zip"
  with zf.ZipFile(zpath, "w") as z:
    for n in os.listdir(blob_dir):
      z.write(blob_dir / n, arcname=f"scale_datasets/{n}")
  _patch_dirs(monkeypatch, misc, tmp_path)
  monkeypatch.setattr(misc, "download_file",
                      lambda url, out, **kw: str(zpath))
  sco = misc.read_scale_dataset("forebrain", verbose=False)
  assert sco.n_obs == n_cells and sco.n_vars == n_peaks
  assert sco.current_omic.name == "atac"
  assert sco.get_dim("celltype") == 2


def test_mouse_atlas_parse_path(tmp_path, monkeypatch):
  """Drive read_mouse_ATLAS' mtx + id-lists + metadata pipeline."""
  import sisua_tpu.data.loaders.misc as misc
  rng = np.random.default_rng(6)
  n_cells, n_peaks = 15, 40
  m = sparse.coo_matrix(
      (rng.random((n_peaks, n_cells)) < 0.25).astype(np.float32))
  mtx = tmp_path / "atac_matrix.binary.qc_filtered.mtx.gz"
  with gzip.open(mtx, "wb") as f:
    sp_io.mmwrite(f, m)
  cells_f = tmp_path / "atac_matrix.binary.qc_filtered.cells.txt"
  cells_f.write_text("\n".join(f"cell{i}" for i in range(n_cells)) + "\n")
  peaks_f = tmp_path / "atac_matrix.binary.qc_filtered.peaks.txt"
  peaks_f.write_text("\n".join(f"p{i}" for i in range(n_peaks)) + "\n")
  meta_f = tmp_path / "cell_metadata.txt"
  with open(meta_f, "w") as f:
    f.write("cell\ttissue\tcell_label\n")
    for i in range(n_cells):
      f.write(f"cell{i}\t{'liver' if i % 2 else 'lung'}\tT{i % 3}\n")
  paths = {p.name: str(p) for p in (mtx, cells_f, peaks_f, meta_f)}
  _patch_dirs(monkeypatch, misc, tmp_path)
  monkeypatch.setattr(misc, "download_file",
                      lambda url, out, **kw: paths[os.path.basename(url)])
  sco = misc.read_mouse_ATLAS(verbose=False)
  assert sco.n_obs == n_cells and sco.n_vars == n_peaks
  assert sco.get_dim("celltype") == 3
  assert sco.get_dim("tissue") == 2
  np.testing.assert_allclose(sco.numpy("tissue").sum(1), 1.0)


def test_finalize_cache_and_cistopic(tmp_path, monkeypatch):
  """tools/convert_rds.R output (mtx + txt) → finalize_cache → the R-gated
  cisTopic loader consumes it."""
  import sisua_tpu.data.loaders.misc as misc
  from sisua_tpu.data.loaders.finalize_cache import finalize
  rng = np.random.default_rng(7)
  n_cells, n_peaks, n_types = 12, 20, 2
  src = tmp_path / "converted"
  os.makedirs(src)
  X = sparse.coo_matrix(rng.poisson(0.5, (n_cells, n_peaks)).astype(
      np.float32))
  sp_io.mmwrite(str(src / "X.mtx"), X)
  (src / "X_col.txt").write_text(
      "\n".join(f"pk{i}" for i in range(n_peaks)) + "\n")
  (src / "X_row.txt").write_text(
      "\n".join(f"c{i}" for i in range(n_cells)) + "\n")
  y = np.eye(n_types)[np.arange(n_cells) % n_types]
  sp_io.mmwrite(str(src / "y.mtx"), sparse.coo_matrix(y))
  (src / "y_col.txt").write_text("mel\nimmune\n")
  _patch_dirs(monkeypatch, misc, tmp_path)
  dest = os.path.join(str(tmp_path / "data"), "melanoma_atac_preprocessed")
  finalize(str(src), dest)
  sco = misc.read_melanoma_cisTopicData(verbose=False)
  assert sco.n_obs == n_cells and sco.n_vars == n_peaks
  assert sco.get_dim("celltype") == n_types


def _make_winzip_aes(path, members, password):
  """Construct a minimal WinZip-AES (AE-2, AES-256) zip: local headers with
  compress_type 99, 0x9901 extra field, salt|verifier|ciphertext|mac
  payloads — the format odin's crypto.unzip_aes consumes in the reference."""
  import hashlib
  import hmac as hmac_mod
  import struct
  import zlib
  from sisua_tpu.data.utils import _winzip_aes_ctr, _winzip_aes_keys
  out, central = b"", b""
  rng = np.random.default_rng(0)
  for name, data in members:
    comp = zlib.compress(data)[2:-4]  # raw deflate
    salt = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
    aes_key, mac_key, pv = _winzip_aes_keys(password.encode(), salt, 3)
    ct = _winzip_aes_ctr(aes_key, comp)
    mac = hmac_mod.new(mac_key, ct, hashlib.sha1).digest()[:10]
    payload = salt + pv + ct + mac
    extra = struct.pack("<HHH2sBH", 0x9901, 7, 2, b"AE", 3, 8)
    nameb = name.encode()
    offset = len(out)
    lh = struct.pack("<IHHHHHIIIHH", 0x04034B50, 51, 1, 99, 0, 0, 0,
                     len(payload), len(data), len(nameb), len(extra))
    out += lh + nameb + extra + payload
    ch = struct.pack("<IHHHHHHIIIHHHHHII", 0x02014B50, 51, 51, 1, 99, 0, 0,
                     0, len(payload), len(data), len(nameb), len(extra),
                     0, 0, 0, 0, offset)
    central += ch + nameb + extra
  eocd = struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, len(members),
                     len(members), len(central), len(out), 0)
  with open(path, "wb") as f:
    f.write(out + central + eocd)


def test_facs_aes_zip_parse_path(tmp_path, monkeypatch):
  """Drive read_FACS(2)'s AES-zip → npz/csv → cache pipeline offline."""
  import io
  import sisua_tpu.data.loaders.facs as facs
  from sisua_tpu.data.utils import unzip_aes
  rng = np.random.default_rng(8)
  n_cells, n_genes = 18, 25
  X = sparse.csr_matrix(rng.poisson(2, (n_cells, n_genes)).astype(
      np.float32))
  y = rng.poisson(40, (n_cells, 2)).astype(np.float32)
  buf = io.BytesIO()
  sparse.save_npz(buf, X)
  members = [
      ("X.npz", buf.getvalue()),
      ("X_row.csv", "\n".join(f"c{i}" for i in range(n_cells)).encode()),
      ("X_col.csv", "\n".join(f"g{i}" for i in range(n_genes)).encode()),
      ("y.csv", "\n".join(",".join(map(str, r)) for r in y).encode()),
      ("y_row.csv", "\n".join(f"c{i}" for i in range(n_cells)).encode()),
      ("y_col.csv", "CD4\nCD8".encode()),
  ]
  zpath = tmp_path / "KI_FACS_2protein.zip"
  _make_winzip_aes(str(zpath), members, "uef-czi")
  # wrong password fails loudly on the verifier
  with pytest.raises(RuntimeError, match="Bad password"):
    list(unzip_aes(str(zpath), "nope"))
  _patch_dirs(monkeypatch, facs, tmp_path)
  monkeypatch.setattr(facs, "download_file",
                      lambda url, out, **kw: str(zpath))
  sco = facs.read_FACS(2, verbose=False)
  assert sco.n_obs == n_cells
  assert sco.n_vars <= n_genes  # all-zero genes dropped
  assert list(map(str, sco.get_var_names("proteomic"))) == ["CD4", "CD8"]
  np.testing.assert_allclose(sco.numpy("proteomic"), y)


def test_full_facs_geo_parse_path(tmp_path, monkeypatch):
  """Drive read_full_FACS' GSE75478 two-individual CSV pipeline offline."""
  import sisua_tpu.data.loaders.facs as facs
  rng = np.random.default_rng(9)
  genes = [f'"G{i}"' for i in range(20)]
  chans = ['"facs_cd34"', '"facs_cd38"', '"other"']

  def make(cells, cols, scale, extra_col=None):
    cols = list(cols) + ([extra_col] if extra_col else [])
    lines = ['"id",' + ",".join(cols)]
    for c in cells:
      vals = rng.normal(100, 30, len(cols))
      lines.append(f'"{c}",' + ",".join(f"{v:.2f}" for v in vals))
    return ("\n".join(lines) + "\n").encode()

  # individual 1: 10 cells (1 unmatched); individual 2: 8 cells
  c1 = [f"I1_c{i}" for i in range(10)]
  c2 = [f"I2_c{i}" for i in range(8)]
  files = {
      "GSE75478_transcriptomics_raw_filtered_I1.csv.gz":
          make(c1, genes, 100, extra_col='"G_only1"'),
      "GSE75478_transcriptomics_raw_filtered_I2.csv.gz": make(c2, genes,
                                                              100),
      "GSE75478_transcriptomics_facs_indeces_filtered_I1.csv.gz":
          make(c1[:9], chans, 50),  # one cell missing from FACS sheet
      "GSE75478_transcriptomics_facs_indeces_filtered_I2.csv.gz":
          make(c2, chans, 50),
  }
  # the CSVs ship genes×cells: transpose our cells×genes tables
  for name, blob in list(files.items()):
    rows = [ln.split(",") for ln in blob.decode().strip().split("\n")]
    t = np.array(rows).T
    files[name] = ("\n".join(",".join(r) for r in t) + "\n").encode()
  paths = {}
  for name, blob in files.items():
    p = tmp_path / name
    with gzip.open(p, "wb") as f:
      f.write(blob)
    paths[name] = str(p)
  _patch_dirs(monkeypatch, facs, tmp_path)
  monkeypatch.setattr(
      facs, "download_file",
      lambda url, out, **kw: paths[os.path.basename(out)])
  sco = facs.read_full_FACS(verbose=False)
  assert sco.n_obs == 9 + 8  # unmatched I1 cell dropped
  # only the shared '_cd*' channels survive, upper-cased
  assert list(map(str, sco.get_var_names("proteomic"))) == ["CD34", "CD38"]
  assert (sco.numpy("proteomic") >= 0).all()  # negative FACS shifted


def test_registry_availability():
  """Every registry name carries an availability tag; the known R-gated
  names are marked; synthetic family is 'always' (VERDICT r1 #8)."""
  from sisua_tpu.data import (AVAILABILITY, get_dataset_availability,
                              get_dataset_meta)
  meta = get_dataset_meta()
  avail = get_dataset_availability()
  assert set(avail) == set(meta)
  assert set(avail.values()) <= set(AVAILABILITY)
  assert get_dataset_availability("synthetic1k") == "always"
  assert get_dataset_availability("mpal") == "R-required"
  assert get_dataset_availability("melanomaatac") == "R-required"
  assert get_dataset_availability("embryos") == "public-download"
  assert get_dataset_availability("facs2") == "public-download"
  assert get_dataset_availability("retina") == "optional-dep"
  with pytest.raises(KeyError):
    get_dataset_availability("nope")


def test_showdata_list(capsys):
  from sisua_tpu.cli.showdata import main
  main(["--list"])
  out = capsys.readouterr().out
  assert "synthetic1m" in out and "R-required" in out


def test_crossdataset_harmonization(monkeypatch):
  """Shared-gene/protein intersection across cohorts + the remove-protein
  ablation (reference pbmc_cross_datasets.py:28-166, removed_protein.py)."""
  import sisua_tpu.data.loaders.cross as cross
  from sisua_tpu.data import generate_citeseq

  a = generate_citeseq(n_cells=300, n_genes=80, n_proteins=6, seed=1,
                       name="cohortA")
  b = generate_citeseq(n_cells=200, n_genes=60, n_proteins=4, seed=2,
                       name="cohortB")
  genes_a = set(map(str, a.get_var_names()))
  genes_b = set(map(str, b.get_var_names()))
  prots_b = set(map(str, b.get_var_names("proteomic")))
  monkeypatch.setattr(cross, "_cohort_loaders", lambda: {
      "a": lambda: a.copy(), "b": lambda: b.copy(),
      "broken": lambda: (_ for _ in ()).throw(RuntimeError("offline")),
  })
  sco = cross.read_PBMC_crossdataset("a", verbose=False)
  got_genes = set(map(str, sco.get_var_names()))
  assert got_genes == (genes_a & genes_b)  # broken cohort skipped
  got_prots = set(map(str, sco.get_var_names("proteomic")))
  assert got_prots <= prots_b
  assert sco.n_obs == a.n_obs
  # ablation drops the chosen proteins
  shared_p = sorted(got_prots)
  drop = shared_p[:1]
  abl = cross.read_PBMC_crossdataset_remove_protein(
      "a", remove_proteins=drop, verbose=False)
  assert set(map(str, abl.get_var_names("proteomic"))) == got_prots - set(
      drop)
  # unknown target raises with the failure list
  with pytest.raises(RuntimeError, match="unavailable"):
    cross.read_PBMC_crossdataset("broken", verbose=False)


def test_registry_aliases_match_reference_cohorts():
  """'5k'/'18k' must resolve to the reference's cohorts
  (reference data/__init__.py:208-210), not stand-in datasets."""
  from functools import partial
  from sisua_tpu.data import get_dataset_meta
  from sisua_tpu.data.loaders.tenx import TENX_CATALOG
  meta = get_dataset_meta()
  assert meta["5k"].args[0] == "5k_pbmc_protein_v3"
  assert "5k_pbmc_protein_v3" in TENX_CATALOG
  assert TENX_CATALOG["18k"][2] == "pbmc8k"
  assert meta["10k"].args[0] == "pbmc_10k_protein_v3"


def test_incomplete_cache_is_not_a_cache_hit(tmp_path, monkeypatch):
  """A cache dir left behind by an interrupted save must trigger a rebuild,
  not an eternal FileNotFoundError (review finding: isdir-only checks)."""
  import numpy as np
  from sisua_tpu.data.utils import save_to_dataset, validate_data_dir
  d = tmp_path / "broken_cache"
  d.mkdir()
  (d / "X.npz").write_bytes(b"truncated")  # partial write, no manifest
  assert not validate_data_dir(str(d))
  # a complete save validates
  ok = tmp_path / "good_cache"
  save_to_dataset(str(ok), np.ones((4, 3), np.float32), ["a", "b", "c"],
                  print_log=False)
  assert validate_data_dir(str(ok))
