"""sisua-evaluate — score + plot trained models from the experiment store.

Reference: ``/root/reference/sisua/evaluate.py`` — loads trained models via
the experimenter (``SE.get_models``), builds a Posterior per model (optionally
on a *different* dataset, ``-ds2`` cross-dataset mode), writes score tables
and the figure battery.
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

__all__ = ["robust_run", "scoring", "plotting", "main"]


def robust_run(method_name, log_text, fn, *args, scoreboard=None, **kwargs):
  """Run one evaluation step, recording (not raising) any exception — one
  failing model/figure must not kill a whole evaluation sweep
  (reference evaluate.py:32-48). Returns the result or None on failure."""
  assert callable(fn)
  try:
    return fn(*args, **kwargs)
  except Exception:
    text = traceback.format_exc().strip()
    if scoreboard is not None:
      scoreboard.write_error(unique=f"{method_name}:{log_text}", message=text)
    print(f"[evaluate] {method_name} failed ({log_text}):\n{text}",
          file=sys.stderr)
    return None


def scoring(post, scoreboard=None, table: str = "scores",
            uid: str = None) -> dict:
  """Compute the full score battery for one Posterior and (optionally)
  persist it in the sqlite scoreboard (reference evaluate.py:54-68)."""
  uid = uid or post.name
  scores = post.save_scores()
  if scoreboard is not None:
    scoreboard.write_scores(table=table, unique=uid, scores=scores)
  return scores


def plotting(post, path: str, full: bool = True) -> int:
  """Render the per-factor figure grid for one Posterior into ``path``
  (reference evaluate.py:71-152); returns the number of figures."""
  post.plot_all(full=full)
  n = len(post.figures)
  post.save_figures(path)
  return n


def main(argv=None):
  p = argparse.ArgumentParser("sisua-evaluate")
  p.add_argument("-model", default="", help="model name filter (e.g. vae)")
  p.add_argument("-ds", default="", help="dataset name filter")
  p.add_argument("-ds2", default="",
                 help="cross-dataset: evaluate on this dataset instead")
  p.add_argument("-path", default="/tmp/sisua_evaluate",
                 help="output folder for figures")
  p.add_argument("--no-plots", action="store_true")
  p.add_argument("--summary-plots", action="store_true",
                 help="render only the 10-figure summary instead of the "
                      "full per-factor grid")
  p.add_argument("--mesh", default=None,
                 help="run the posterior predictions data-parallel over a "
                      "device mesh: 'all' or an int (first N chips)")
  args = p.parse_args(argv)

  from ..analysis import Posterior, ResultsSheet
  from ..data import get_dataset
  from ..train.experimenter import SisuaExperimenter

  exp = SisuaExperimenter()
  query = []
  if args.model:
    query.append(f"model.name={args.model}")
  if args.ds:
    query.append(f"dataset.name={args.ds}")
  found = exp.get_models(" ".join(query), load_models=True)
  found = [(cfg, m) for cfg, m in found if m is not None]
  if not found:
    print("No trained models matched", query)
    return []

  mesh = None
  if args.mesh is not None:
    import jax

    from ..parallel import create_mesh
    devs = jax.devices()
    if args.mesh != "all":
      devs = devs[:int(args.mesh)]
    mesh = create_mesh(n_data=len(devs), devices=devs)

  posteriors = []
  for cfg, model in found:
    ds_name = args.ds2 or cfg["dataset"]["name"]
    uid = f"{model.id}_{ds_name}"

    def _make_posterior(cfg=cfg, model=model, ds_name=ds_name):
      sco = get_dataset(ds_name)
      _, test = sco.split(float(cfg["dataset"].get("train_percent", 0.8)))
      # a cross-dataset sweep (-ds2) can hit gene-dim mismatches: skip the
      # incompatible model instead of killing every other model's eval
      if test.n_vars != model.outputs[0].dim:
        raise ValueError(f"gene dim {test.n_vars} != model "
                         f"{model.outputs[0].dim} — skipped")
      return model.create_posterior(
          test, dropout_rate=float(cfg["dataset"].get("dropout_rate", 0.2)),
          retain_rate=float(cfg["dataset"].get("retain_rate", 0.2)),
          mesh=mesh)

    post = robust_run("posterior", uid, _make_posterior,
                      scoreboard=exp.scoreboard)
    if post is None:
      continue  # one incompatible model must not sink the sweep
    scores = robust_run("scoring", uid, scoring, post, exp.scoreboard,
                        table=f"eval_{ds_name}", uid=uid,
                        scoreboard=exp.scoreboard)
    if scores:
      print(f"[{uid}] " + " ".join(
          f"{k}={v:.4f}" for k, v in list(scores.items())[:5]))
    posteriors.append(post)

  if not posteriors:
    print("no evaluable models (see scoreboard errors)")
    return []
  rs = ResultsSheet(*posteriors)
  rs.save_scores(os.path.join(args.path, "scores"))
  if not args.no_plots:
    n_figs = 0
    for post in posteriors:
      n = robust_run("plotting", post.name, plotting, post, args.path,
                     full=not args.summary_plots,
                     scoreboard=exp.scoreboard)
      n_figs += n or 0
    # the comparison grid degrades like per-posterior plotting: one NaN row
    # (a model whose scoring failed) must not abort the aggregation stage
    robust_run("comparison-plots", "results_sheet", rs.plot_all,
               scoreboard=exp.scoreboard)
    n_figs += len(rs.figures)
    rs.save_figures(args.path)
    print(f"{n_figs} figures →", args.path)
  return posteriors


if __name__ == "__main__":
  main()
