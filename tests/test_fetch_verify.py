"""Offline contract tests for ``tools/fetch_datasets.py --verify`` — the
first-networked-run protocol for the real CITE-seq flagship (VERDICT r4
§missing 1 / next-round 7).

The build environment has zero egress, so the REAL pbmc8k/ecc ADT path has
never executed; these tests fabricate the author bundles in the reference
npz schema (``/root/reference/sisua/data/data_loader/pbmc8k.py:60-100``)
and pin the contract the first networked run must satisfy:

  * real-ADT bundles load, MD5s are PINNED into the provenance record,
    a zoo row (SISUA on real proteins) is trained and recorded;
  * a second run against the same bundles matches the pin;
  * a TAMPERED bundle fails the verify run (exit 1).
"""

import importlib.util
import json
import os
import shutil
import sys

import numpy as np
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "fetch_datasets",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "fetch_datasets.py"))
fetch_datasets = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(fetch_datasets)


def _author_npz(path, n, seed):
  rng = np.random.default_rng(seed)
  genes = np.array(["CD3D", "CD3E", "CD4", "CD8A", "LYZ", "ACTB", "GAPDH",
                    "NKG7", "MS4A1", "FCGR3A"])
  # protein counts correlated with their marker genes so the zoo row's
  # correlation metric is defined (MARKER_ADT_GENE pairs)
  X = rng.poisson(3, (n, len(genes))).astype(np.float32) + 1.0
  y = np.stack([X[:, 2] * 5 + rng.poisson(2, n),
                X[:, 3] * 5 + rng.poisson(2, n),
                rng.poisson(20, n)], 1).astype(np.float32)
  y_col = np.array(["CD4", "CD8", "CD45RA"])
  rows = np.array([f"CELL{seed}_{i}" for i in range(n)])
  np.savez(path, X_filt=X, X_filt_col=genes, X_full=X, X_full_col=genes,
           X_row=rows, y=y, y_col=y_col)


@pytest.fixture
def offline_flagship(tmp_path, monkeypatch):
  """Fabricated 8kly/eccly bundles served through a copying download stub
  (files land in DOWNLOAD_DIR exactly as a networked run would)."""
  import sisua_tpu.data.loaders.pbmc8k as pb
  import sisua_tpu.data.loaders.pbmcecc as pe
  src = tmp_path / "src"
  src.mkdir()
  _author_npz(str(src / "pbmc8k_ly.npz"), n=96, seed=1)
  _author_npz(str(src / "pbmcecc_ly.npz"), n=80, seed=2)
  data_dir = tmp_path / "data"
  dl_dir = tmp_path / "dl"
  data_dir.mkdir()
  dl_dir.mkdir()

  def fake_download(url, outpath, **kw):
    base = os.path.basename(url)
    if not os.path.isfile(src / base):
      raise RuntimeError(f"no such bundle: {url}")
    os.makedirs(os.path.dirname(outpath), exist_ok=True)
    shutil.copyfile(src / base, outpath)
    return str(outpath)

  for mod in (pb, pe):
    monkeypatch.setattr(mod, "DATA_DIR", str(data_dir), raising=False)
    monkeypatch.setattr(mod, "DOWNLOAD_DIR", str(dl_dir), raising=False)
    monkeypatch.setattr(mod, "download_file", fake_download, raising=False)
  monkeypatch.setattr("sisua_tpu.data.path.DOWNLOAD_DIR", str(dl_dir))
  return src, dl_dir


def test_verify_pins_md5_and_records_zoo_row(tmp_path, offline_flagship):
  out = str(tmp_path / "provenance.json")
  rc = fetch_datasets.verify(epochs=2, out=out)
  assert rc == 0
  with open(out) as f:
    rec = json.load(f)
  assert set(rec["datasets"]) == {"8kly", "eccly"}
  for name, fname in [("8kly", "pbmc8k_ly.npz"),
                      ("eccly", "pbmcecc_ly.npz")]:
    entry = rec["datasets"][name]
    assert fname in entry["bundle_md5"]
    assert len(entry["bundle_md5"][fname]) == 32
    assert entry["proteins"]  # the REAL ADT table, not a surrogate
  row = rec["zoo_row"]
  assert row["model"] == "sisua" and "real" in row["dataset"]
  assert np.isfinite(row["pearson_mean"])


def test_verify_second_run_matches_pin(tmp_path, offline_flagship):
  out = str(tmp_path / "provenance.json")
  assert fetch_datasets.verify(epochs=2, out=out) == 0
  with open(out) as f:
    first = json.load(f)
  assert fetch_datasets.verify(epochs=2, out=out) == 0
  with open(out) as f:
    second = json.load(f)
  assert second["datasets"]["8kly"]["bundle_md5"] \
      == first["datasets"]["8kly"]["bundle_md5"]


def test_verify_carries_pin_forward_on_cache_hit(tmp_path,
                                                 offline_flagship):
  """If DOWNLOAD_DIR was cleaned but the extracted cache satisfies
  get_dataset (no re-download), the pin must SURVIVE into the rewritten
  record — dropping it would let a later tampered re-download pass as a
  fresh '(pinned)' run (review finding r5)."""
  src, dl_dir = offline_flagship
  out = str(tmp_path / "provenance.json")
  assert fetch_datasets.verify(epochs=2, out=out) == 0
  with open(out) as f:
    first = json.load(f)
  for f_ in os.listdir(dl_dir):
    os.remove(os.path.join(dl_dir, f_))
  assert fetch_datasets.verify(epochs=2, out=out) == 0
  with open(out) as f:
    second = json.load(f)
  assert second["datasets"]["8kly"]["bundle_md5"] \
      == first["datasets"]["8kly"]["bundle_md5"]
  # ... and a tampered re-download after the cache-hit run still fails
  _author_npz(str(src / "pbmc8k_ly.npz"), n=96, seed=77)
  import sisua_tpu.data.loaders.pbmc8k as pb
  import shutil as _sh
  for d in os.listdir(pb.DATA_DIR):
    if d.startswith("pbmc8k"):
      _sh.rmtree(os.path.join(pb.DATA_DIR, d))
  assert fetch_datasets.verify(epochs=2, out=out) == 1


def test_verify_fails_on_tampered_bundle(tmp_path, offline_flagship):
  src, dl_dir = offline_flagship
  out = str(tmp_path / "provenance.json")
  assert fetch_datasets.verify(epochs=2, out=out) == 0
  # upstream file changes after the pin → next verify must fail
  _author_npz(str(src / "pbmc8k_ly.npz"), n=96, seed=99)
  # bust the local cache so the loader re-downloads
  import sisua_tpu.data.loaders.pbmc8k as pb
  for d in os.listdir(pb.DATA_DIR):
    if d.startswith("pbmc8k"):
      shutil.rmtree(os.path.join(pb.DATA_DIR, d))
  for f in os.listdir(dl_dir):
    os.remove(os.path.join(dl_dir, f))
  assert fetch_datasets.verify(epochs=2, out=out) == 1
