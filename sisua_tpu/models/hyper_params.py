"""Hyper-parameter search: random / quasi-TPE over network + latent sizes.

Capability parity with ``/root/reference/sisua/models/hyper_params.py``
(which shipped stale — unreachable after a module-level raise; the intended
behavior per its body: hyperopt rand/TPE search over nlayers/hdim/zdim with
each trial in a subprocess). This implementation searches the same space
with (1) pure random search and (2) a light TPE-style strategy (sample many
candidates, rank by an expected-improvement proxy from kernel-density
estimates of good/bad trials), running each trial in a spawned process so
device state never leaks across trials.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["fit_hyper", "fit_hyper_vmap", "DEFAULT_SPACE"]

DEFAULT_SPACE = {
    "nlayers": (1, 2, 3, 4),
    "hdim": (32, 64, 128, 256),
    "zdim": (4, 8, 16, 32),
    "learning_rate": (1e-4, 3e-4, 1e-3, 3e-3),
}


def _sample(space: Dict[str, Sequence], rng: np.random.RandomState) -> Dict:
  return {k: v[rng.randint(len(v))] for k, v in space.items()}


def _tpe_sample(space, trials: List[Tuple[Dict, float]],
                rng: np.random.RandomState, n_candidates: int = 24) -> Dict:
  """Rank random candidates by P(good)/P(bad) from categorical densities of
  the best/worst trial quartiles (a discrete TPE)."""
  if len(trials) < 8:
    return _sample(space, rng)
  losses = np.array([t[1] for t in trials])
  cut = np.quantile(losses, 0.25)
  good = [t[0] for t in trials if t[1] <= cut]
  bad = [t[0] for t in trials if t[1] > cut]

  def density(configs, key, value):
    counts = sum(1 for c in configs if c[key] == value) + 1.0
    return counts / (len(configs) + len(space[key]))

  best_score, best_cfg = -np.inf, None
  for _ in range(n_candidates):
    cfg = _sample(space, rng)
    score = sum(np.log(density(good, k, v)) - np.log(density(bad, k, v))
                for k, v in cfg.items())
    if score > best_score:
      best_score, best_cfg = score, cfg
  return best_cfg


def _trial_worker(payload):
  """Run one trial in a fresh process (spawned: clean device runtime)."""
  (model_name, dataset_name, cfg, epochs, batch_size, seed) = payload
  from .. import models as M
  from ..data import get_dataset
  from ..nn import NetConf
  from ..rv import RVmeta
  try:
    sco = get_dataset(dataset_name)
    train, valid = sco.split(0.9, seed=seed)
    cls = M.get_model(model_name)
    hdim, nlayers, zdim = cfg["hdim"], cfg["nlayers"], cfg["zdim"]
    nets = dict(encoder=NetConf((hdim,) * nlayers, batchnorm=True),
                decoder=NetConf((hdim,) * nlayers, batchnorm=True))
    outputs = [sco.get_rv(o) for o in list(sco.omics)]
    is_semi = getattr(cls, "mask_outputs", False)
    model = cls(outputs if is_semi else outputs[0],
                latents=RVmeta(zdim, "diag", True, "latents"),
                seed=seed, **nets)
    model.fit(train, valid=valid, epochs=epochs, batch_size=batch_size,
              learning_rate=float(cfg.get("learning_rate", 1e-3)),
              patience=5)
    loss = float(model.history.get("val_loss", model.history["loss"])[-1])
    return cfg, loss, None
  except Exception as e:  # noqa: BLE001 — trial failures are data
    return cfg, float("inf"), str(e)


def fit_hyper(model: str,
              dataset: str = "synthetic",
              space: Optional[Dict[str, Sequence]] = None,
              algorithm: str = "tpe",
              max_evals: int = 20,
              epochs: int = 10,
              batch_size: int = 64,
              seed: int = 8,
              n_processes: int = 1,
              save_path: Optional[str] = None,
              verbose: bool = False) -> Dict[str, Any]:
  """Search the hyper-space; returns {'best': cfg, 'loss': …, 'trials': […]}.

  ``algorithm``: 'rand' | 'tpe'.
  """
  assert algorithm in ("rand", "tpe")
  space = dict(space or DEFAULT_SPACE)
  rng = np.random.RandomState(seed)
  trials: List[Tuple[Dict, float]] = []
  errors: List[str] = []

  def propose():
    return (_sample(space, rng) if algorithm == "rand"
            else _tpe_sample(space, trials, rng))

  if n_processes > 1:
    import multiprocessing as mp
    ctx = mp.get_context("spawn")
    with ctx.Pool(n_processes) as pool:
      # propose lazily in WAVES of n_processes: materializing all
      # max_evals proposals before any result arrives would freeze
      # trials=[] and silently degrade 'tpe' into pure random search
      done = 0
      while done < max_evals:
        wave = min(n_processes, max_evals - done)
        pending = [(model, dataset, propose(), epochs, batch_size,
                    seed + done + i) for i in range(wave)]
        for cfg, loss, err in pool.imap_unordered(_trial_worker, pending):
          trials.append((cfg, loss))
          if err:
            errors.append(err)
          if verbose:
            print(f"[hyper] {cfg} → {loss:.4f}"
                  + (f" ({err})" if err else ""))
        done += wave
  else:
    for i in range(max_evals):
      cfg, loss, err = _trial_worker(
          (model, dataset, propose(), epochs, batch_size, seed + i))
      trials.append((cfg, loss))
      if err:
        errors.append(err)
      if verbose:
        print(f"[hyper] {i:02d} {cfg} → {loss:.4f}")

  finite = [(c, l) for c, l in trials if np.isfinite(l)]
  best_cfg, best_loss = (min(finite, key=lambda t: t[1]) if finite
                         else (None, float("inf")))
  result = {"best": best_cfg, "loss": best_loss,
            "trials": [{"config": c, "loss": l} for c, l in trials],
            "errors": errors}
  if save_path:
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    with open(save_path, "w") as f:
      json.dump(result, f, indent=2, default=float)
  return result


def fit_hyper_vmap(model_fn: Callable[[int], Any],
                   train,
                   learning_rates: Sequence[float] = (1e-4, 3e-4, 1e-3, 3e-3),
                   seeds_per_rate: int = 1,
                   epochs: int = 10,
                   batch_size: int = 64,
                   base_seed: int = 8,
                   metrics_interval: int = 1,
                   mesh=None,
                   save_path: Optional[str] = None,
                   verbose: bool = False) -> Dict[str, Any]:
  """On-chip hyper-parameter search: ALL trials train simultaneously in one
  vmapped executable (a capability the reference's one-process-per-trial
  search cannot express). Fixed architecture; the search axes are learning
  rate × seed — each member's lr rides in its stacked optimizer state via
  ``optax.inject_hyperparams``. ``mesh=`` fans the trials out over a device
  mesh (one chip trains n_trials/n_devices members, zero communication).

  ``model_fn(seed) → SingleCellModel`` must build the same architecture.
  Returns {'best', 'loss', 'trials', 'ensemble'}; ``ensemble.extract(i)``
  yields any trained trial as a standalone model.
  """
  from ..train.ensemble import VmapEnsemble
  configs = [{"learning_rate": float(lr), "seed": base_seed + s}
             for lr in learning_rates for s in range(seeds_per_rate)]
  ens = VmapEnsemble(model_fn, n_models=len(configs), base_seed=base_seed)
  # map member i → its config seed (VmapEnsemble numbers seeds serially, so
  # rebuild members with the intended seeds)
  ens.models = [model_fn(c["seed"]) for c in configs]
  ens.fit(train, epochs=epochs, batch_size=batch_size,
          learning_rate=[c["learning_rate"] for c in configs],
          shared_batches=False, metrics_interval=metrics_interval,
          mesh=mesh, verbose=verbose)
  final = ens.history["loss"][-1]  # (n_models,)
  trials = [{"config": c, "loss": float(l)} for c, l in zip(configs, final)]
  best_i = int(np.argmin(final))
  result = {"best": configs[best_i], "loss": float(final[best_i]),
            "trials": trials, "ensemble": ens}
  if verbose:
    for t in trials:
      print(f"[hyper-vmap] {t['config']} → {t['loss']:.4f}")
  if save_path:
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    with open(save_path, "w") as f:
      json.dump({k: v for k, v in result.items() if k != "ensemble"},
                f, indent=2, default=float)
  return result
