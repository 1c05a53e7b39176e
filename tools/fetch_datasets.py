#!/usr/bin/env python
"""Prefetch + preprocess every public-download dataset into $SISUA_DATA.

Run on a machine WITH network access to build the cache folders that the
(possibly offline) training environment consumes:

  python tools/fetch_datasets.py                 # everything public
  python tools/fetch_datasets.py cortex 8kly     # just these names
  python tools/fetch_datasets.py --list          # show the plan

R-gated names (mpal*, melanomaatac) are skipped with instructions
(tools/convert_rds.R); 'optional-dep' names are attempted and skipped when
scvi-tools is absent. Every loader validates an MD5 manifest, so re-running
is a fast no-op.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main(argv=None):
  p = argparse.ArgumentParser("fetch-datasets")
  p.add_argument("names", nargs="*", help="registry names (default: all "
                 "public-download names)")
  p.add_argument("--list", action="store_true", help="print plan and exit")
  p.add_argument("--include-10x-catalog", action="store_true",
                 help="also fetch the full 10x catalog (large)")
  args = p.parse_args(argv)

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
