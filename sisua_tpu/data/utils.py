"""Data utilities: artificial corruption, library-size stats, download/cache,
dataset persistence, protein-name normalization.

Capability map to the reference (``/root/reference/sisua/data/utils.py``):
  * ``apply_artificial_corruption`` (:168-228) — the scVI-style count-dropout
    that powers every denoising/imputation benchmark. Semantics preserved:
    pick ``dropout``% of the *nonzero* entries, then either
    ``'binomial'``: replace count n with Binomial(n, retain_rate), or
    ``'uniform'``: multiply n by Bernoulli(retain_rate); seeded and
    deterministic.
  * ``get_library_size`` (:231-263) — per-cell log-counts + dataset-level
    local mean/var broadcast per cell (the scVI library prior inputs).
  * download / checksum / archive helpers (:48-162) — gated: this build runs
    with zero network egress, so ``download_file`` raises a clear error
    unless the file is already cached.
  * ``save_to_dataset``/``validate_data_dir`` (:375-453) — folder-of-npz
    persistence with MD5 manifest (replacing pickled bigarray mmaps).
  * ``standardize_protein_name`` (:288-319).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tarfile
import urllib.request
import warnings
import zipfile
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np
from scipy import sparse

__all__ = [
    "apply_artificial_corruption", "get_library_size", "download_file",
    "md5_checksum", "md5_folder", "read_compressed", "save_to_dataset",
    "load_from_dataset", "validate_data_dir", "validating_dataset",
    "standardize_protein_name", "unzip_aes", "remove_allzeros_columns",
    "get_gene_id2name", "is_binary_dtype", "is_categorical_dtype",
]


# ---------------------------------------------------------------------------
# Artificial corruption (the denoising benchmark mechanism)
# ---------------------------------------------------------------------------
def apply_artificial_corruption(x,
                                dropout: float = 0.0,
                                distribution: str = "binomial",
                                retain_rate: float = 0.2,
                                copy: bool = False,
                                seed: int = 8):
  """Corrupt ``dropout`` fraction of nonzero counts (scVI protocol).

  x: (n_cells, n_genes) ndarray or scipy sparse matrix.
  """
  distribution = str(distribution).lower()
  dropout = float(dropout)
  if not 0.0 <= dropout < 1.0:
    raise ValueError(f"dropout must be in [0, 1), given: {dropout}")
  rand = np.random.RandomState(seed=seed)
  if dropout <= 0.0:
    return x.copy() if copy else x

  corrupted_x = x.copy() if copy else x
  is_sparse = sparse.issparse(x)
  if is_sparse:
    xcoo = x.tocoo()
    i, j, vals = xcoo.row, xcoo.col, xcoo.data
  else:
    i, j = np.nonzero(x)
    vals = np.asarray(x[i, j]).ravel()
  n_pick = int(np.floor(dropout * len(i)))
  ix = rand.choice(len(i), size=n_pick, replace=False)
  i, j, vals = i[ix], j[ix], vals[ix]
  if distribution == "uniform":
    corrupted = vals * rand.binomial(n=np.ones(n_pick, np.int32),
                                     p=retain_rate)
  elif distribution == "binomial":
    corrupted = rand.binomial(n=vals.astype(np.int64), p=retain_rate)
  else:
    raise ValueError("Only support 'uniform' and 'binomial' corruption, "
                     f"given: '{distribution}'")
  if is_sparse:
    corrupted_x = corrupted_x.tolil()
    corrupted_x[i, j] = corrupted
    corrupted_x = corrupted_x.tocsr()
    corrupted_x.eliminate_zeros()
  else:
    corrupted_x[i, j] = corrupted
  return corrupted_x


# ---------------------------------------------------------------------------
# Library size (scVI convention)
# ---------------------------------------------------------------------------
def get_library_size(X, return_log_count: bool = False):
  """Per-cell library statistics in log space.

  Returns ``(local_mean, local_var)`` of shape (n_cells, 1) — the dataset-
  level mean/var of log total counts broadcast per cell — and optionally the
  per-cell ``log_counts``.
  """
  assert X.ndim == 2, "Only support 2-D matrix"
  total_counts = np.asarray(X.sum(axis=1)).ravel()
  if not np.all(total_counts >= 0):
    warnings.warn(f"Some cell in matrix {X.shape} contains negative counts; "
                  "this yields NaN log counts!")
  log_counts = np.log(total_counts + 1e-8)
  n = X.shape[0]
  local_mean = np.full((n, 1), np.mean(log_counts), dtype=np.float32)
  local_var = np.full((n, 1), np.var(log_counts), dtype=np.float32)
  if not return_log_count:
    return local_mean, local_var
  return log_counts[:, None].astype(np.float32), local_mean, local_var


# ---------------------------------------------------------------------------
# Download / cache (network-gated: zero-egress environments fail loudly)
# ---------------------------------------------------------------------------
def md5_checksum(path: str, chunk: int = 1 << 20) -> str:
  h = hashlib.md5()
  with open(path, "rb") as f:
    while True:
      b = f.read(chunk)
      if not b:
        break
      h.update(b)
  return h.hexdigest()


def md5_folder(path: str,
               exclude: Sequence[str] = ("manifest.json",)) -> str:
  """MD5 over all files in a folder (sorted), for cache validation.

  ``manifest.json`` is excluded by default: it stores this very hash, so
  including a stale one (re-saving into an existing folder) would make
  the manifest permanently self-invalidating."""
  h = hashlib.md5()
  for name in sorted(os.listdir(path)):
    if name in exclude:
      continue
    fp = os.path.join(path, name)
    if os.path.isfile(fp):
      with open(fp, "rb") as f:
        while True:
          b = f.read(1 << 20)
          if not b:
            break
          h.update(b)
  return h.hexdigest()


def download_file(url: str, outpath: str, md5: Optional[str] = None,
                  override: bool = False) -> str:
  """Download with MD5 validation and caching (reference utils.py:48-77)."""
  if os.path.isfile(outpath) and not override:
    if md5 is None or md5_checksum(outpath) == md5:
      return outpath
    os.remove(outpath)
  os.makedirs(os.path.dirname(outpath) or ".", exist_ok=True)
  try:
    print(f"Downloading {url} -> {outpath}")
    urllib.request.urlretrieve(url, outpath)
  except Exception as e:  # noqa: BLE001 — map to actionable message
    raise RuntimeError(
        f"Cannot download '{url}' (offline environment?). Place the file at "
        f"'{outpath}' manually, or use a synthetic dataset "
        f"(get_dataset('synthetic')).") from e
  if md5 is not None:
    got = md5_checksum(outpath)
    if got != md5:
      raise RuntimeError(f"MD5 mismatch for {outpath}: {got} != {md5}")
  return outpath


def _winzip_aes_keys(password: bytes, salt: bytes, strength: int):
  """WinZip AES key derivation: PBKDF2-HMAC-SHA1, 1000 iterations →
  (aes_key, hmac_key, password_verifier)."""
  key_len = {1: 16, 2: 24, 3: 32}[strength]
  dk = hashlib.pbkdf2_hmac("sha1", password, salt, 1000, 2 * key_len + 2)
  return dk[:key_len], dk[key_len:2 * key_len], dk[2 * key_len:]


def _winzip_aes_ctr(key: bytes, data: bytes) -> bytes:
  """WinZip AES-CTR keystream: 16-byte little-endian counter starting at 1
  (NOT the big-endian CTR of standard AES-CTR modes)."""
  from cryptography.hazmat.primitives.ciphers import (Cipher, algorithms,
                                                      modes)
  enc = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
  out = bytearray(len(data))
  for off in range(0, len(data), 16):
    counter = ((off >> 4) + 1).to_bytes(16, "little")
    ks = enc.update(counter)
    chunk = data[off:off + 16]
    out[off:off + len(chunk)] = bytes(a ^ b for a, b in zip(chunk, ks))
  return bytes(out)


def unzip_aes(path: str, password: str):
  """Iterate (name, bytes) over a zip archive, supporting WinZip-AES
  (AE-1/AE-2, compression type 99) members — the reference delegates this to
  ``odin.utils.crypto.unzip_aes`` (facs_gene_protein.py:51,
  pbmc_CITEseq.py). Plain and ZipCrypto members fall through to zipfile."""
  import hmac as hmac_mod
  import struct
  import zlib
  pwd = password.encode() if isinstance(password, str) else password
  with zipfile.ZipFile(path) as zf:
    for info in zf.infolist():
      if info.is_dir():
        continue
      if info.compress_type != 99:
        yield info.filename, zf.read(info, pwd=pwd)
        continue
      # parse the 0x9901 extra field: vendor ver, 'AE', strength, method
      extra, strength, method = info.extra, 3, zipfile.ZIP_DEFLATED
      off = 0
      while off + 4 <= len(extra):
        tag, size = struct.unpack_from("<HH", extra, off)
        if tag == 0x9901:
          _ver, _ae, strength, method = struct.unpack_from(
              "<H2sBH", extra, off + 4)
        off += 4 + size
      # raw member payload: salt | 2-byte verifier | ciphertext | 10-byte mac
      # (zipfile refuses compress_type 99, so read the raw stream manually)
      raw = _raw_member_bytes(zf, info)
      salt_len = {1: 8, 2: 12, 3: 16}[strength]
      salt = raw[:salt_len]
      verifier = raw[salt_len:salt_len + 2]
      mac = raw[-10:]
      ct = raw[salt_len + 2:-10]
      aes_key, mac_key, pv = _winzip_aes_keys(pwd, salt, strength)
      if pv != verifier:
        raise RuntimeError(f"Bad password for member '{info.filename}'")
      if hmac_mod.new(mac_key, ct, hashlib.sha1).digest()[:10] != mac:
        raise RuntimeError(f"HMAC mismatch for member '{info.filename}'")
      data = _winzip_aes_ctr(aes_key, ct)
      if method == zipfile.ZIP_DEFLATED:
        data = zlib.decompress(data, -15)
      yield info.filename, data


def _raw_member_bytes(zf: zipfile.ZipFile, info: zipfile.ZipInfo) -> bytes:
  """Read a member's raw (compressed/encrypted) payload by parsing its local
  file header — zipfile cannot decode compress_type 99 itself."""
  import struct
  fp = zf.fp
  fp.seek(info.header_offset)
  hdr = fp.read(30)
  magic, = struct.unpack_from("<I", hdr, 0)
  assert magic == 0x04034b50, "corrupt local file header"
  name_len, extra_len = struct.unpack_from("<HH", hdr, 26)
  fp.seek(info.header_offset + 30 + name_len + extra_len)
  return fp.read(info.compress_size)


def read_compressed(path: str, outdir: str) -> List[str]:
  """Extract tar/zip/gz archives; return extracted file paths."""
  os.makedirs(outdir, exist_ok=True)
  out: List[str] = []
  if tarfile.is_tarfile(path):
    with tarfile.open(path) as t:
      t.extractall(outdir, filter="data")
      out = [os.path.join(outdir, n) for n in t.getnames()]
  elif zipfile.is_zipfile(path):
    with zipfile.ZipFile(path) as z:
      z.extractall(outdir)
      out = [os.path.join(outdir, n) for n in z.namelist()]
  elif path.endswith(".gz"):
    import gzip
    dst = os.path.join(outdir, os.path.basename(path)[:-3])
    with gzip.open(path, "rb") as fin, open(dst, "wb") as fout:
      shutil.copyfileobj(fin, fout)
    out = [dst]
  else:
    raise ValueError(f"Unsupported archive: {path}")
  return out


# ---------------------------------------------------------------------------
# Dataset persistence: folder of npz + JSON manifest (+ MD5)
# ---------------------------------------------------------------------------
def _save_matrix(path: str, m) -> None:
  if sparse.issparse(m):
    sparse.save_npz(path + ".sparse.npz", m.tocsr())
  else:
    np.savez_compressed(path + ".npz", data=np.asarray(m))


def _load_matrix(path: str, mmap: bool = False):
  if os.path.isfile(path + ".sparse.npz"):
    return sparse.load_npz(path + ".sparse.npz")
  if mmap and os.path.isfile(path + ".npy"):
    return np.load(path + ".npy", mmap_mode="r")
  return np.load(path + ".npz", allow_pickle=False)["data"]


def read_r_matrix(path: str):
  """Read an R ``dgCMatrix``/matrix .rds file via rpy2 (reference
  utils.py:80-106). rpy2+R are optional; raises an actionable error when
  absent."""
  try:
    import rpy2.robjects as ro
    from rpy2.robjects import numpy2ri
  except ImportError as e:
    raise RuntimeError(
        "Reading .rds matrices requires rpy2 + R (not in this image). "
        "Convert the file to .mtx/.npz externally instead: in R, "
        "Matrix::writeMM(obj, 'out.mtx').") from e
  obj = ro.r["readRDS"](path)
  classes = list(ro.r["class"](obj))
  if "dgCMatrix" in classes:
    i = np.asarray(obj.slots["i"])
    p = np.asarray(obj.slots["p"])
    x = np.asarray(obj.slots["x"])
    dims = tuple(np.asarray(obj.slots["Dim"]))
    return sparse.csc_matrix((x, i, p), shape=dims).tocsr()
  with (ro.default_converter + numpy2ri.converter).context():
    return np.asarray(obj)


def save_to_dataset(path: str,
                    X,
                    X_col: Sequence[str],
                    y=None,
                    y_col: Optional[Sequence[str]] = None,
                    rowname: Optional[Sequence[str]] = None,
                    print_log: bool = True) -> str:
  """Persist an (X, y) dataset folder (reference utils.py:375-453)."""
  os.makedirs(path, exist_ok=True)
  assert X.ndim == 2 and len(X_col) == X.shape[1]
  _save_matrix(os.path.join(path, "X"), X)
  np.savez_compressed(os.path.join(path, "X_col.npz"),
                      data=np.asarray(X_col, dtype=str))
  if rowname is None:
    rowname = [f"Cell#{i}" for i in range(X.shape[0])]
  np.savez_compressed(os.path.join(path, "X_row.npz"),
                      data=np.asarray(rowname, dtype=str))
  if y is not None:
    assert y_col is not None and len(y_col) == y.shape[1]
    assert y.shape[0] == X.shape[0]
    _save_matrix(os.path.join(path, "y"), y)
    np.savez_compressed(os.path.join(path, "y_col.npz"),
                        data=np.asarray(y_col, dtype=str))
  manifest = {"md5": md5_folder(path)}
  with open(os.path.join(path, "manifest.json"), "w") as f:
    json.dump(manifest, f)
  if print_log:
    print(f"Saved dataset to {path} (X: {X.shape})")
  return path


def load_from_dataset(path: str):
  """Inverse of save_to_dataset → (X, X_col, X_row, y, y_col)."""
  X = _load_matrix(os.path.join(path, "X"))
  X_col = np.load(os.path.join(path, "X_col.npz"))["data"]
  X_row = np.load(os.path.join(path, "X_row.npz"))["data"]
  y = y_col = None
  if (os.path.isfile(os.path.join(path, "y.npz"))
      or os.path.isfile(os.path.join(path, "y.sparse.npz"))):
    y = _load_matrix(os.path.join(path, "y"))
    y_col = np.load(os.path.join(path, "y_col.npz"))["data"]
  return X, X_col, X_row, y, y_col


def validating_dataset(path) -> None:
  """Assert a persisted dataset folder (or preloaded dict) carries the
  required arrays — X, X_col, X_row, and y/y_col as a pair
  (reference utils.py:375-392)."""
  if isinstance(path, dict):
    ds = dict(path)
  else:
    X, X_col, X_row, y, y_col = load_from_dataset(path)
    ds = {"X": X, "X_col": X_col, "X_row": X_row}
    if y is not None:
      ds["y"], ds["y_col"] = y, y_col
  for key, dim in (("X", 2), ("X_col", 1), ("X_row", 1)):
    assert key in ds and ds[key] is not None, \
        f"`{key}` must be stored at path: {path}"
  assert ds["X"].shape[1] == len(ds["X_col"]), "X_col mismatches X columns"
  assert ds["X"].shape[0] == len(ds["X_row"]), "X_row mismatches X rows"
  if ds.get("y") is not None:
    assert ds.get("y_col") is not None, f"`y_col` must pair `y` at: {path}"
    assert ds["y"].shape[0] == ds["X"].shape[0], "y rows mismatch X rows"
    assert ds["y"].shape[1] == len(ds["y_col"]), "y_col mismatches y columns"


def remove_allzeros_columns(matrix, colname, print_log: bool = True):
  """Drop columns with total count ≤ 1 from the matrix and its name vector
  (reference utils.py:354-372; the >1 floor keeps every retained gene
  usable after a train/test split)."""
  assert matrix.ndim == 2
  orig_shape = matrix.shape
  colname = np.asarray(colname)
  nonzero_col = np.asarray(matrix.sum(axis=0)).ravel() > 1
  matrix = matrix[:, nonzero_col]
  colname = colname[nonzero_col]
  if print_log:
    print(f"Filtering {int(len(nonzero_col) - nonzero_col.sum())} all-zero "
          f"columns from data: {orig_shape} -> {matrix.shape} ...")
  return matrix, colname


def get_gene_id2name(cache_only: bool = False) -> dict:
  """Mapping gene identifier (e.g. ENSG…) → gene symbol (reference
  utils.py:325-337 downloads a private pickle; here the mapping is built
  from the id+symbol columns of any cached 10x ``features/genes`` table and
  memoized in DOWNLOAD_DIR)."""
  import gzip
  import pickle
  from .path import DOWNLOAD_DIR
  cache = os.path.join(DOWNLOAD_DIR, "gene_id2name.pkl")
  if os.path.isfile(cache):
    with open(cache, "rb") as f:
      return pickle.load(f)
  mapping: dict = {}
  for root, _, files in os.walk(DOWNLOAD_DIR):
    for fn in files:
      base = fn.lower()
      if not (("features" in base or "genes" in base)
              and (base.endswith(".tsv") or base.endswith(".tsv.gz"))):
        continue
      fp = os.path.join(root, fn)
      opener = gzip.open if base.endswith(".gz") else open
      try:
        with opener(fp, "rt") as f:
          for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2 and parts[0] and parts[1]:
              mapping.setdefault(parts[0], parts[1])
      except (OSError, UnicodeDecodeError):
        continue
  if not mapping and cache_only:
    raise RuntimeError(
        f"No gene id→name table found under {DOWNLOAD_DIR}; download any "
        f"10x dataset first (e.g. get_dataset('pbmc8k'))")
  if mapping:
    with open(cache, "wb") as f:
      pickle.dump(mapping, f)
  return mapping


def validate_data_dir(path: str) -> bool:
  """True when the folder exists and its MD5 manifest matches."""
  mf = os.path.join(path, "manifest.json")
  if not os.path.isfile(mf):
    return False
  with open(mf) as f:
    expect = json.load(f).get("md5")
  # manifest.json itself was written after hashing → md5_folder excludes it
  return md5_folder(path) == expect


# ---------------------------------------------------------------------------
# Metadata normalization
# ---------------------------------------------------------------------------
_PROTEIN_ALIASES = {
    "PD-L1;CD274": "CD274", "PECAM;CD31": "CD31", "CD26;Adenosine": "CD26",
    "CD366;tim3": "CD366", "MHCII;HLA-DR": "MHCII",
    "IL7Ralpha;CD127": "CD127", "PD-1": "PD-1", "PD1": "PD1",
    "B220;CD45R": "CD45R", "Ox40;CD134": "CD134", "CD8a": "CD8",
    "CD8A": "CD8", "CD4 T cells": "CD4", "CD8 T cells": "CD8",
}


def standardize_protein_name(name):
  """Strip TotalSeq suffixes and map known aliases (utils.py:288-319)."""
  if isinstance(name, (tuple, list, np.ndarray)):
    return [standardize_protein_name(i) for i in name]
  if not isinstance(name, str):
    raise TypeError("Protein name must be a string")
  for sep in ("-", "_"):
    for suffix in ("TotalSeqB", "control", "TotalSeqC", "TotalSeqA"):
      name = name.replace(f"{sep}{suffix}", "")
  name = name.strip()
  return _PROTEIN_ALIASES.get(name, name)


# ---------------------------------------------------------------------------
# dtype helpers
# ---------------------------------------------------------------------------
def is_binary_dtype(x) -> bool:
  # check EVERY stored value (chunked): sampling a prefix misclassifies
  # count data whose early rows happen to be all 0/1, silently switching
  # the default likelihood from zinb to bernoulli downstream
  if sparse.issparse(x):
    x = x.data
  flat = np.asarray(x).reshape(-1)
  for lo in range(0, flat.size, 16_777_216):
    chunk = flat[lo:lo + 16_777_216]
    if not np.all((chunk == 0) | (chunk == 1)):
      return False
  return True


def is_categorical_dtype(x) -> bool:
  """One-hot / probability-simplex rows (labels)."""
  x = np.asarray(x.todense()) if sparse.issparse(x) else np.asarray(x)
  if x.ndim != 2:
    return False
  return bool(np.allclose(x.sum(-1), 1.0, atol=1e-3))
