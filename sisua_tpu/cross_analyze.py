"""Cross-dataset analysis: evaluate trained models across cohorts.

Capability parity with ``/root/reference/sisua/cross_analyze.py`` (:105-216),
modernized onto the current API (the reference module itself was stale): for
each (model, train-dataset) pair in the experiment store, evaluate its
Posterior on every other requested dataset restricted to the shared protein
panel, optionally concurrent (thread pool — JAX dispatch and BLAS release
the GIL); aggregate everything into one ResultsSheet. Each checkpoint is
keyed ``name:train_dataset:confighash`` so same-named models trained on
different cohorts never collide.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["cross_analyze", "main"]


def _shared_protein_panel(scos) -> List[str]:
  shared = None
  for sco in scos:
    if "proteomic" not in sco.omics:
      continue
    names = set(map(str, sco.get_var_names("proteomic")))
    shared = names if shared is None else (shared & names)
  return sorted(shared or [])


def cross_analyze(model_names: Sequence[str],
                  dataset_names: Sequence[str],
                  outpath: str = "/tmp/sisua_cross",
                  n_processes: int = 1,
                  verbose: bool = False):
  """Evaluate each trained checkpoint on each dataset (the model may have
  been trained on a different cohort); returns
  ``{('name:train_ds:hash', eval_ds): scores}``."""
  from .analysis import Posterior, ResultsSheet
  from .data import get_dataset
  from .data.const import OMIC
  from .train.experimenter import SisuaExperimenter

  exp = SisuaExperimenter()
  datasets = {}
  for ds in dataset_names:
    sco = get_dataset(ds)
    _, test = sco.split(0.8)
    datasets[ds] = test
  panel = _shared_protein_panel(list(datasets.values()))
  if verbose:
    print(f"[cross] shared protein panel ({len(panel)}): {panel}")

  tasks = []
  for mname in model_names:
    found = exp.get_models(f"model.name={mname}", load_models=True)
    for cfg, model in found:
      if model is None:
        continue
      # identify the CHECKPOINT, not just the architecture: two configs
      # sharing a model name (e.g. vae trained on cortex AND on pbmc8k)
      # must not overwrite each other's rows in the dict/scoreboard
      from .train.experimenter import config_hash
      train_ds = cfg.get("dataset", {}).get("name", "data")
      mid = f"{mname}:{train_ds}:" \
            f"{config_hash(cfg, exp.exclude_keys, exp.hash_length)}"
      for ds, test in datasets.items():
        tasks.append((mid, model, ds, test))

  def _eval_one(task):
    mid, model, ds, test = task
    # restrict the label panel to the shared proteins so metrics are
    # comparable across cohorts (reference pools shared proteins)
    sco = test.copy()
    if panel and "proteomic" in sco.omics:
      pidx = sco.get_var_indices(OMIC.proteomic)
      keep = [pidx[p] for p in panel if p in pidx]
      sco.set_omic(OMIC.proteomic)
      sco.apply_indices(keep, observation=False)
      sco.set_omic(OMIC.transcriptomic)
    if sco.n_vars != model.outputs[0].dim:
      if verbose:
        print(f"[cross] skip {mid} on {ds}: gene dim "
              f"{sco.n_vars} != {model.outputs[0].dim}")
      return None
    post = model.create_posterior(sco)
    post.name = f"{mid}_{ds}"
    return mid, ds, post, post.save_scores()

  if n_processes > 1 and len(tasks) > 1:
    # thread pool, not processes: posteriors must come back whole for the
    # ResultsSheet, and JAX dispatch + BLAS release the GIL so evaluations
    # genuinely overlap
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=int(n_processes)) as pool:
      results = list(pool.map(_eval_one, tasks))
  else:
    results = [_eval_one(t) for t in tasks]

  posteriors = []
  scores: Dict[Tuple[str, str], Dict[str, float]] = {}
  for r in results:
    if r is None:
      continue
    mid, ds, post, s = r
    scores[(mid, ds)] = s
    posteriors.append(post)
    exp.scoreboard.write_scores(table=f"cross_{ds}",
                                unique=f"{mid}_{ds}", scores=s)
  if posteriors:
    rs = ResultsSheet(*posteriors, verbose=verbose)
    os.makedirs(outpath, exist_ok=True)
    rs.save_scores(os.path.join(outpath, "cross_scores"))
    rs.plot_all()
    rs.save_figures(outpath)
  return scores


def main(argv=None):
  p = argparse.ArgumentParser(
      "sisua-cross-analyze",
      description="evaluate trained models across datasets on the shared "
      "protein panel")
  p.add_argument("-model", required=True, help="comma-separated model names")
  p.add_argument("-ds", required=True, help="comma-separated dataset names")
  p.add_argument("-path", default="/tmp/sisua_cross")
  p.add_argument("-ncpu", type=int, default=1)
  p.add_argument("--verbose", action="store_true")
  args = p.parse_args(argv)
  return cross_analyze(args.model.split(","), args.ds.split(","),
                       outpath=args.path, n_processes=args.ncpu,
                       verbose=args.verbose)


if __name__ == "__main__":
  main()
