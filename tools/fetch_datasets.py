#!/usr/bin/env python
"""Prefetch + preprocess every public-download dataset into $SISUA_DATA.

Run on a machine WITH network access to build the cache folders that the
(possibly offline) training environment consumes:

  python tools/fetch_datasets.py                 # everything public
  python tools/fetch_datasets.py cortex 8kly     # just these names
  python tools/fetch_datasets.py --list          # show the plan
  python tools/fetch_datasets.py --verify        # first-networked-run
                                                 # contract (below)

R-gated names (mpal*, melanomaatac) are skipped with instructions
(tools/convert_rds.R); 'optional-dep' names are attempted and skipped when
scvi-tools is absent. Every loader validates an MD5 manifest, so re-running
is a fast no-op.

``--verify`` — the first-networked-run contract for the flagship real
CITE-seq benchmark (VERDICT r4 §missing 1): every quality verdict in
RESULTS.md is currently simulator-based because this build environment has
zero egress; the acquisition path for the REAL pbmc8k/ecc ADT tables is
coded (the reference's own S3 bundles,
``/root/reference/sisua/data/data_loader/pbmc8k.py:20-23``) but has never
executed. On the first networked machine, ``--verify``:

  1. fetches ``8kly`` and ``eccly`` through ``get_dataset`` (author-bundle
     path) and REFUSES surrogate proteins — the run fails loudly unless
     the per-cell ADT table is real;
  2. records bundle-file MD5s. The reference publishes no MD5 constants
     for these two bundles (unlike e.g. ``pbmc_CITEseq.py:23-31``), so
     the first run PINS the observed MD5s into the provenance record and
     later runs compare against the pin;
  3. trains one zoo row (SISUA on real 8kly ADT) and records the
     protein-correlation scores next to the simulator-based zoo numbers;
  4. writes ``$SISUA_EXP/real_data_provenance.json`` with URLs, MD5s,
     shapes, protein names, and the zoo-row scores.

Until that record exists, treat RESULTS.md's quality conclusions as
simulator-scoped (README "Real-data status").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


_FLAGSHIP_BUNDLES = {
    # dataset name → the author-bundle files its loader downloads; the
    # reference keeps these URLs base64-wrapped with NO md5 constants
    # (pbmc8k.py:20-23) — --verify pins the observed MD5s on first fetch
    "8kly": ["pbmc8k_ly.npz"],
    "eccly": ["pbmcecc_ly.npz"],
}


def verify(epochs: int = 50, out: str | None = None) -> int:
  """First-networked-run contract for the real CITE-seq flagship."""
  import numpy as np

  from sisua_tpu.data import get_dataset
  from sisua_tpu.data.path import DOWNLOAD_DIR, EXP_DIR
  from sisua_tpu.data.utils import md5_checksum

  out = out or os.path.join(EXP_DIR, "real_data_provenance.json")
  prior = None
  if os.path.isfile(out):
    with open(out) as f:
      prior = json.load(f)
  record = {"created": time.strftime("%Y-%m-%d %H:%M:%S"),
            "datasets": {}, "zoo_row": None}
  for name, bundles in _FLAGSHIP_BUNDLES.items():
    print(f"[verify] fetching {name} ...", flush=True)
    sco = get_dataset(name, verbose=True)
    if sco.uns.get("proteomic_is_surrogate", False):
      print(f"FAILED {name}: proteins are a marker-gene SURROGATE — the "
            "author bundle did not download; run on a networked machine")
      return 1
    if "proteomic" not in [str(o) for o in sco.omics] \
        and not any("proteomic" in str(o) for o in sco.omics):
      print(f"FAILED {name}: no proteomic omic in the loaded dataset")
      return 1
    entry = {
        "n_cells": int(sco.n_obs),
        "n_genes": int(sco.n_vars),
        "proteins": [str(v) for v in sco.get_var_names("proteomic")],
        "bundle_md5": {},
    }
    for fname in bundles:
      path = os.path.join(DOWNLOAD_DIR, fname)
      pinned = (prior or {}).get("datasets", {}).get(name, {}) \
          .get("bundle_md5", {}).get(fname)
      if os.path.isfile(path):
        md5 = md5_checksum(path)
        entry["bundle_md5"][fname] = md5
        if pinned is not None and pinned != md5:
          print(f"FAILED {name}: bundle {fname} md5 {md5} != pinned "
                f"{pinned} (upstream file changed since the first "
                "verified fetch)")
          return 1
        print(f"  {fname}: md5 {md5}"
              + (" (matches pin)" if pinned else " (pinned)"))
      elif pinned is not None:
        # bundle file cleaned from DOWNLOAD_DIR but the extracted cache
        # satisfied get_dataset — CARRY THE PIN FORWARD. Dropping it here
        # would let a later re-download of a tampered upstream file pass
        # as a fresh '(pinned)' run, defeating the contract.
        entry["bundle_md5"][fname] = pinned
        print(f"  {fname}: not re-downloaded (cache hit) — pin {pinned} "
              "carried forward")
    record["datasets"][name] = entry
  # one zoo row on the REAL ADT table: SISUA protein correlation,
  # the metric the reference's semi-supervision claim is stated in
  print(f"[verify] zoo row: SISUA on real 8kly ADT ({epochs} epochs) ...",
        flush=True)
  sco = get_dataset("8kly")
  train, test = sco.split(0.8, seed=0)
  from sisua_tpu.models import SISUA, NetConf, RVmeta
  G = train.n_vars
  P = train.get_dim("proteomic")
  m = SISUA([RVmeta(G, "zinb", name="transcriptomic"),
             RVmeta(P, "nb", name="proteomic")],
            encoder=NetConf((64, 64), batchnorm=True, dropout=0.1),
            decoder=NetConf((64, 64), batchnorm=True), seed=0)
  m.fit(train, epochs=epochs,
        batch_size=min(64, max(4, train.n_obs // 4)),
        labels_percent=0.5, verbose=False)
  from sisua_tpu.analysis import Posterior
  pos = Posterior(m, test, sample_shape=5, verbose=False)
  pear = pos.cal_pearson()
  spear = pos.cal_spearman()
  record["zoo_row"] = {
      "model": "sisua", "dataset": "8kly(real ADT)", "epochs": int(epochs),
      "labels_percent": 0.5,
      "pearson_mean": float(pear.get(
          "pearson_mean", np.mean(list(pear.values()) or [np.nan]))),
      "spearman_mean": float(spear.get(
          "spearman_mean", np.mean(list(spear.values()) or [np.nan]))),
  }
  os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
  with open(out, "w") as f:
    json.dump(record, f, indent=2)
  print(f"[verify] OK — provenance written to {out}")
  print(json.dumps(record["zoo_row"]))
  return 0


def main(argv=None):
  p = argparse.ArgumentParser("fetch-datasets")
  p.add_argument("names", nargs="*", help="registry names (default: all "
                 "public-download names)")
  p.add_argument("--list", action="store_true", help="print plan and exit")
  p.add_argument("--include-10x-catalog", action="store_true",
                 help="also fetch the full 10x catalog (large)")
  p.add_argument("--verify", action="store_true",
                 help="first-networked-run contract: fetch the flagship "
                 "pbmc8k/ecc real-ADT bundles, pin/compare MD5s, train one "
                 "zoo row on real proteins, write the provenance record")
  p.add_argument("--verify-epochs", type=int, default=50)
  p.add_argument("--verify-out", default=None)
  args = p.parse_args(argv)

  if args.verify:
    return verify(epochs=args.verify_epochs, out=args.verify_out)

  from sisua_tpu.data import get_dataset, get_dataset_availability
  avail = get_dataset_availability()
  if args.names:
    plan = [(n, avail.get(n.lower().strip(), "?")) for n in args.names]
  else:
    plan = []
    for name, tag in sorted(avail.items()):
      # default plan: everything fetchable — 'public-download' plus
      # 'optional-dep' (attempted; skipped with a message when the dep is
      # absent) plus 'R-required' (listed so its skip instructions print,
      # instead of silently vanishing from the plan)
      if tag not in ("public-download", "optional-dep", "R-required"):
        continue
      if name.endswith("all") and name[:-3] in avail:
        continue  # '<x>all' unfiltered variant shares '<x>'s download —
        # but never drop primary names that merely END in 'all' ('call')
      from sisua_tpu.data.loaders.tenx import TENX_CATALOG
      if not args.include_10x_catalog and name in TENX_CATALOG:
        continue
      plan.append((name, tag))
  if args.list:
    for name, tag in plan:
      print(f"{name:<16} {tag}")
    print(f"\n{len(plan)} datasets")
    return 0

  failed, skipped, n_ok = [], [], 0
  for name, tag in plan:
    if tag == "R-required":
      print(f"[skip] {name}: upstream ships .rds — convert with "
            "tools/convert_rds.R + sisua_tpu.data.loaders.finalize_cache")
      skipped.append(name)
      continue
    print(f"[fetch] {name} ({tag}) ...", flush=True)
    try:
      sco = get_dataset(name, verbose=True)
      print(f"  ok: {sco.n_obs} cells × {sco.n_vars} vars, "
            f"omics={list(sco.omics)}")
      n_ok += 1
    except (ImportError, ModuleNotFoundError) as e:
      # 'optional-dep' names land here when the dep is absent: a skip per
      # the documented contract, not a fetch failure
      print(f"[skip] {name}: missing optional dependency ({e})")
      skipped.append(name)
    except Exception as e:  # keep fetching the rest
      failed.append((name, repr(e)))
      traceback.print_exc(limit=2)
  print(f"\ndone: {n_ok} ok, {len(skipped)} skipped, {len(failed)} failed "
        f"of {len(plan)} planned")
  for name, err in failed:
    print(f"  FAILED {name}: {err}")
  return 1 if failed else 0


if __name__ == "__main__":
  sys.exit(main())
