"""sisua-showdata — dataset statistics + visualization dump.

Reference: ``/root/reference/sisua/showdata.py`` (``-ds 8kly -path …``).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
  p = argparse.ArgumentParser("sisua-showdata")
  p.add_argument("-ds", default=None, help="dataset registry name")
  p.add_argument("-path", default="/tmp/sisua_showdata")
  p.add_argument("--figures", action="store_true",
                 help="also render the full figure battery")
  p.add_argument("--list", action="store_true", dest="list_datasets",
                 help="list all registry names with availability")
  args = p.parse_args(argv)

  if args.list_datasets:
    from ..data import get_dataset_availability
    avail = get_dataset_availability()
    width = max(map(len, avail))
    for name in sorted(avail):
      print(f"{name:<{width}}  {avail[name]}")
    print(f"\n{len(avail)} datasets | tags: always = in-memory synthetic; "
          "public-download = native download+preprocess pipeline; "
          "optional-dep = needs scvi-tools; R-required = convert upstream "
          ".rds with tools/convert_rds.R")
    return None
  if args.ds is None:
    p.error("-ds is required (or use --list)")

  from ..data import get_dataset
  sco = get_dataset(args.ds, verbose=True)
  print(sco)
  from scipy import sparse as _sp
  for om in sco.omics:
    x = sco.get_omic(om)
    # stats straight off the sparse structure — densifying a 1M×33k CSR
    # just to print sparsity would need ~130 GB
    if _sp.issparse(x):
      nnz_frac = x.nnz / float(x.shape[0] * x.shape[1])
      total_mean = float(np.asarray(x.sum(1)).mean())
    else:
      nnz_frac = float((x > 0).mean())
      total_mean = float(x.sum(1).mean())
    print(f"  {om}: shape={x.shape} sparsity={1.0 - nnz_frac:.3f} "
          f"total_mean={total_mean:.1f}")
  sco.calculate_quality_metrics()
  os.makedirs(args.path, exist_ok=True)
  sco.obs.describe().to_csv(os.path.join(args.path, "obs_stats.csv"))
  if args.figures:
    label = None
    for cand in ("celltype", "disease", "progenitor"):
      if cand in sco.omics:
        label = cand
        break
    sco.plot_histogram().plot_percentile_histogram().plot_series()
    if label is not None:
      sco.plot_scatter(color_by=label, algo="pca")
      sco.plot_dotplot(group_by=label)
      sco.plot_heatmap(group_by=label)
      sco.plot_stacked_violins(group_by=label)
    sco.save_figures(args.path)
  print("stats →", args.path)
  return sco


if __name__ == "__main__":
  main()
