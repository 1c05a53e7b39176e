"""sisua-showdata — dataset statistics + visualization dump.

Reference: ``/root/reference/sisua/showdata.py`` (``-ds 8kly -path …``).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
  p = argparse.ArgumentParser("sisua-showdata")
  p.add_argument("-ds", required=True, help="dataset registry name")
  p.add_argument("-path", default="/tmp/sisua_showdata")
  p.add_argument("--figures", action="store_true",
                 help="also render the full figure battery")
  args = p.parse_args(argv)

  from ..data import get_dataset
  sco = get_dataset(args.ds, verbose=True)
  print(sco)
  for om in sco.omics:
    x = sco.numpy(om)
    print(f"  {om}: shape={x.shape} sparsity="
          f"{1.0 - (x > 0).mean():.3f} total_mean={x.sum(1).mean():.1f}")
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
