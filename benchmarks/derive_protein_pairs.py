"""Mine positive/negative protein-marker pairs from dataset correlations.

Capability parity with ``/root/reference/tests/test_oppose_protein_pairs.py``
(:26-80): the constant lists ``PROTEIN_PAIR_POSITIVE``/``_NEGATIVE`` in
``data/const.py`` were derived by ranking protein–protein spearman
correlations across CITE-seq cohorts; this script reproduces that mining on
any datasets with a proteomic omic.

  PYTHONPATH=. python benchmarks/derive_protein_pairs.py -ds synthetic \
      -top 20
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def mine_pairs(dataset_names, top: int = 100, verbose: bool = True):
  import numpy as np
  from sisua_tpu.data import get_dataset
  from sisua_tpu.data.utils import standardize_protein_name

  corr_sum = defaultdict(list)
  for name in dataset_names:
    try:
      sco = get_dataset(name)
    except Exception as e:
      if verbose:
        print(f"[skip] {name}: {e}")
      continue
    if "proteomic" not in sco.omics:
      continue
    prots = [standardize_protein_name(str(p))
             for p in sco.get_var_names("proteomic")]
    corr = sco.get_correlation("proteomic", "proteomic")
    for i, j, _, spear in corr:
      if i >= j:
        continue
      a, b = sorted((prots[i], prots[j]))
      corr_sum[(a, b)].append(spear)
  ranked = sorted(((np.mean(v), k) for k, v in corr_sum.items()),
                  key=lambda t: t[0])
  # the two lists must be disjoint: with 2*top > len(ranked) the naive
  # head/tail slices overlap and every pair scores as BOTH positively and
  # negatively co-expressed downstream
  eff = min(top, len(ranked) // 2)
  if eff < top:
    print(f"# note: only {len(ranked)} observed pairs — emitting "
          f"{eff} per list (requested {top}) to keep the lists disjoint")
  negative = [k for _, k in ranked[:eff]]
  positive = [k for _, k in ranked[::-1][:eff]]
  return positive, negative


def main(argv=None):
  p = argparse.ArgumentParser("derive-protein-pairs")
  p.add_argument("-ds", default="synthetic",
                 help="comma-separated dataset names")
  p.add_argument("-top", type=int, default=100)
  args = p.parse_args(argv)
  pos, neg = mine_pairs(args.ds.split(","), top=args.top)
  print("PROTEIN_PAIR_POSITIVE =", pos)
  print("PROTEIN_PAIR_NEGATIVE =", neg)
  return pos, neg


if __name__ == "__main__":
  main()
