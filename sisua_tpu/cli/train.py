"""sisua-train — config-driven (multi-)model training.

Reference entry: ``python sisua/train.py model.name=vae dataset.name=cortex``
with multirun ``model.name=sisua,dca dataset.name=8kly -m --ncpu 4``
(``/root/reference/sisua/train.py:202-220``).
"""

from __future__ import annotations

import sys


def main(argv=None):
  from ..train.experimenter import SisuaExperimenter
  argv = list(sys.argv[1:] if argv is None else argv)
  kwargs = {}
  if "--config" in argv:  # e.g. --config configs/presets/cortex_vae.yaml
    i = argv.index("--config")
    if i + 1 >= len(argv):
      raise SystemExit("--config requires a path argument")
    kwargs["config_path"] = argv[i + 1]
    del argv[i:i + 2]
  exp = SisuaExperimenter(**kwargs)
  print("SisuaExperimenter:")
  print(" - save   :", exp.save_path)
  print(" - config :", exp.config_path)
  results = exp.run(argv)
  for r in results:
    keys = [k for k in r if k.startswith(("llk", "imputation", "pearson",
                                          "spearman"))][:6]
    print("scores:", {k: round(float(r[k]), 4) for k in keys})
  return results


if __name__ == "__main__":
  main()
