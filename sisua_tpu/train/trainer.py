"""Trainer — jitted data-parallel training loop with the reference's
robustness surface.

Re-provides the `[odin]` training loop the reference relies on
(``/root/reference/configs/base.yaml:45-63`` knobs + ``SURVEY.md`` §3.1):
Adam with global-norm clipping, periodic validation every ``valid_freq``
*steps*, early stopping with patience + best-weights rollback
(``allow_rollback``), ``terminate_on_nan``, per-epoch metric history with the
reference's key names ('loss', 'val_loss', 'llk_x', 'klqp_z', …), callbacks,
and checkpoint hooks.

TPU design: one compiled train-step executable (static batch shapes from the
feeder), parameters and optimizer state live on device the whole run, batches
stream via the CSR→dense feeder with the cell axis sharded over the 'data'
mesh axis — XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..interpolation import Interpolation, get_interpolation
from ..parallel import batch_sharding, create_mesh, replicated_sharding

__all__ = ["TrainState", "Trainer", "TrainingCallback"]


class TrainState(struct.PyTreeNode):
  step: jax.Array
  params: Any
  batch_stats: Any
  opt_state: Any
  # second (adversarial) group, e.g. FactorVAE discriminator; None otherwise
  aux_params: Any = None
  aux_opt_state: Any = None


class TrainingCallback:
  """Keras-style callback protocol (reference sc_metrics/sc_monitor hooks)."""

  def set_model(self, model):
    self.model = model

  def on_epoch_begin(self, epoch: int, logs: Dict):
    pass

  def on_epoch_end(self, epoch: int, logs: Dict):
    pass

  def on_train_end(self, logs: Dict):
    pass


class Trainer:
  """Drives a (step_fn, eval_fn) pair over a DataFeeder."""

  def __init__(self,
               step_fn: Callable,
               eval_fn: Optional[Callable] = None,
               optimizer: str = "adam",
               learning_rate: float = 1e-3,
               clipnorm: float = 100.0,
               beta: Any = 1.0,
               valid_freq: int = 500,
               patience: int = 20,
               min_delta: float = 1e-4,
               terminate_on_nan: bool = True,
               allow_rollback: bool = True,
               max_iter: Optional[int] = None,
               mesh=None,
               verbose: bool = False):
    self.step_fn = step_fn
    self.eval_fn = eval_fn
    self.optimizer_name = optimizer
    self.learning_rate = learning_rate
    self.clipnorm = clipnorm
    self.beta = get_interpolation(beta)
    self.valid_freq = int(valid_freq)
    self.patience = int(patience)
    self.min_delta = float(min_delta)
    self.terminate_on_nan = bool(terminate_on_nan)
    self.allow_rollback = bool(allow_rollback)
    self.max_iter = max_iter
    self.verbose = bool(verbose)
    self.mesh = mesh
    self.history: Dict[str, List[float]] = {}
    self._timings: List[float] = []

  # ----------------------------------------------------------------- optax
  def make_optimizer(self) -> optax.GradientTransformation:
    opt = {
        "adam": optax.adam,
        "adamw": optax.adamw,
        "sgd": optax.sgd,
        "rmsprop": optax.rmsprop,
        "adamax": optax.adamax,
    }[self.optimizer_name](self.learning_rate)
    if self.clipnorm and self.clipnorm > 0:
      return optax.chain(optax.clip_by_global_norm(self.clipnorm), opt)
    return opt

  # ------------------------------------------------------------------- fit
  def fit(self,
          state: TrainState,
          train_feeder,
          valid_feeder=None,
          epochs: int = 100,
          key: Optional[jax.Array] = None,
          callbacks: Sequence[TrainingCallback] = (),
          checkpoint_fn: Optional[Callable[[TrainState], None]] = None,
          model=None):
    """Run the loop; returns the final (possibly rolled-back) TrainState."""
    key = key if key is not None else jax.random.PRNGKey(0)
    for cb in callbacks:
      if model is not None:
        cb.set_model(model)

    batch_sh = None
    if self.mesh is not None and np.prod(list(self.mesh.shape.values())) > 1:
      batch_sh = batch_sharding(self.mesh)

    best_loss = np.inf
    best_state = state
    wait = 0
    global_step = int(state.step)
    stop = False

    for epoch in range(epochs):
      logs: Dict[str, float] = {}
      for cb in callbacks:
        cb.on_epoch_begin(epoch, logs)
      epoch_metrics: Dict[str, list] = {}
      t0 = time.perf_counter()
      n_examples = 0
      train_feeder.set_epoch(epoch)
      for batch in train_feeder:
        key, sub = jax.random.split(key)
        if batch_sh is not None:
          batch = jax.tree_util.tree_map(
              lambda x: jax.device_put(x, batch_sh), batch)
        beta = self.beta(global_step)
        state, metrics = self.step_fn(state, batch, sub, beta)
        global_step += 1
        if model is not None:
          # keep the model's state pointer live: the step donates the old
          # state's buffers, and callbacks may call model.predict mid-run
          model._state = state
        n_examples += batch["inputs"][0].shape[0]
        for k, v in metrics.items():
          epoch_metrics.setdefault(k, []).append(v)
        # --- periodic validation (valid_freq in steps, reference conv.)
        if (valid_feeder is not None and self.valid_freq > 0
            and global_step % self.valid_freq == 0):
          val = self.evaluate(state, valid_feeder, key)
          for k, v in val.items():
            epoch_metrics.setdefault(f"val_{k}", []).append(v)
        if self.max_iter and global_step >= self.max_iter:
          stop = True
          break
      # --- epoch aggregation (device syncs happen here, once per epoch)
      dt = time.perf_counter() - t0
      self._timings.append(dt)
      logs.update({k: float(np.mean([np.asarray(x) for x in v]))
                   for k, v in epoch_metrics.items()})
      logs["epoch_time"] = dt
      logs["cells_per_sec"] = n_examples / max(dt, 1e-9)
      # end-of-epoch validation if no step-periodic one ran
      if valid_feeder is not None and "val_loss" not in logs:
        val = self.evaluate(state, valid_feeder, key)
        logs.update({f"val_{k}": float(v) for k, v in val.items()})
      # callbacks may inject metrics into logs — run them before recording
      for cb in callbacks:
        cb.on_epoch_end(epoch, logs)
      for k, v in logs.items():
        self.history.setdefault(k, []).append(v)
      if self.verbose:
        msg = " ".join(f"{k}={v:.4f}" for k, v in logs.items()
                       if k in ("loss", "val_loss", "elbo"))
        print(f"[epoch {epoch:03d}] {msg} ({dt:.2f}s)")
      # --- NaN termination (reference terminate_on_nan)
      if self.terminate_on_nan and not np.isfinite(logs.get("loss", 0.0)):
        if self.verbose:
          print(f"[trainer] NaN loss at epoch {epoch}; terminating")
        if self.allow_rollback:
          state = best_state
        break
      # --- early stopping on monitored loss
      monitored = logs.get("val_loss", logs.get("loss", np.inf))
      if monitored < best_loss - self.min_delta:
        best_loss = monitored
        best_state = state
        wait = 0
        if checkpoint_fn is not None:
          checkpoint_fn(state)
      else:
        wait += 1
        if self.patience > 0 and wait >= self.patience:
          if self.verbose:
            print(f"[trainer] early stopping at epoch {epoch}")
          if self.allow_rollback:
            state = best_state
          break
      if stop:
        break
    for cb in callbacks:
      cb.on_train_end(dict(self.history))
    return state

  # ------------------------------------------------------------------ eval
  def evaluate(self, state: TrainState, feeder, key) -> Dict[str, float]:
    assert self.eval_fn is not None, "no eval_fn provided"
    agg: Dict[str, list] = {}
    n = 0
    for batch in feeder.full_batches():
      b = batch["inputs"][0].shape[0]
      key, sub = jax.random.split(key)
      metrics = self.eval_fn(state, batch, sub)
      for k, v in metrics.items():
        agg.setdefault(k, []).append(np.asarray(v) * b)
      n += b
    return {k: float(np.sum(v) / n) for k, v in agg.items()}

  @property
  def average_epoch_time(self) -> float:
    return float(np.mean(self._timings)) if self._timings else 0.0
