"""Vmapped model ensembles: train N model replicas simultaneously on chip.

The reference's "training multiple systems in parallel" is one process per
model on separate devices (``/root/reference/sisua/train.py:206-220``). On
TPU the idiomatic alternative (SURVEY.md §2.8) is a *vmapped ensemble*: stack
N parameter pytrees and vmap the train step over the model axis — N seeds /
configs of the same architecture train in one executable, sharing every
batch read. With the device-resident epoch runner this trains an ensemble
for nearly the cost of one model (the MLP matmuls batch perfectly on the
MXU).

Passing ``mesh=`` shards the member axis over the mesh's devices: each chip
trains ``n_models / n_devices`` members with ZERO inter-chip communication
(members are independent), upgrading the reference's one-process-per-model
multirun to one *executable* for the whole fleet — data replicated, model
fleet partitioned over ICI-connected chips.

Use:
    ens = VmapEnsemble(lambda seed: VAE(...), n_models=8)
    ens.fit(sco, epochs=50, batch_size=64)               # single chip
    ens.fit(sco, epochs=50, mesh=create_mesh())          # 1 member/chip
    losses = ens.history["loss"]          # (epochs, n_models)
    best = ens.extract(int(np.argmin(losses[-1])))
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["VmapEnsemble"]


class VmapEnsemble:

  def __init__(self, model_fn: Callable[[int], "SingleCellModel"],
               n_models: int = 4, base_seed: int = 0):
    self.n_models = int(n_models)
    self.models = [model_fn(base_seed + i) for i in range(self.n_models)]
    m0 = self.models[0]
    for m in self.models[1:]:
      assert type(m) is type(m0), "ensemble members must share the class"
    self.model = m0  # structural template
    self.history: Dict[str, np.ndarray] = {}
    self._stacked = None

  def _stack_states(self, txs):
    """Stack member states; ``txs`` is one transformation per member (their
    states must share structure — e.g. inject_hyperparams carrying different
    learning rates)."""
    states = []
    for m, tx in zip(self.models, txs):
      m._ensure_initialized()
      st = m.state
      if st.opt_state is None:
        st = st.replace(opt_state=tx.init(st.params))
      states.append(st)
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)

  def fit(self,
          train,
          epochs: int = 100,
          batch_size: int = 64,
          learning_rate: float = 1e-3,
          clipnorm: float = 100.0,
          labels_percent: float = 0.0,
          shared_batches: bool = True,
          metrics_interval: int = 1,
          mesh: Optional[Mesh] = None,
          verbose: bool = False) -> "VmapEnsemble":
    """Device-resident ensemble training: one lax.scan epoch executable,
    vmapped over the model axis. ``shared_batches=True`` feeds every member
    the same shuffled batches (pure seed ensembling); False gives each
    member its own shuffle stream. ``metrics_interval=K`` compiles K whole
    epochs into one executable with per-epoch losses as scan outputs (one
    loss fetch per window). ``mesh=`` shards the member axis over every
    device of the mesh (data replicated, no collectives — each chip trains
    its own members); ``n_models`` must divide evenly over the device
    count."""
    model = self.model
    if not model.is_semi_supervised:
      labels_percent = 0.0
    feeder = model._to_feeder(train, batch_size, labels_percent)
    # Per-member learning rates (hyper-search mode): inject_hyperparams puts
    # the lr INSIDE the optimizer state, so stacking member states carries a
    # different lr through the single vmapped update.
    if isinstance(learning_rate, (tuple, list, np.ndarray)):
      lrs = [float(x) for x in learning_rate]
      assert len(lrs) == self.n_models, \
          f"got {len(lrs)} learning rates for {self.n_models} members"
      def make_tx(lr):
        return optax.chain(
            optax.clip_by_global_norm(clipnorm),
            optax.inject_hyperparams(optax.adam)(learning_rate=lr))
      txs = [make_tx(lr) for lr in lrs]
      tx = txs[0]
    else:
      tx = optax.chain(optax.clip_by_global_norm(clipnorm),
                       optax.adam(learning_rate))
      txs = [tx] * self.n_models
    core = model.make_train_step_core(tx)
    stacked = self._stacked if self._stacked is not None \
        else self._stack_states(txs)

    # dense device-resident data (shared across members)
    n = feeder.n_obs
    assert n >= int(batch_size), (
        f"VmapEnsemble needs at least one full batch: {n} cells < "
        f"batch_size {batch_size}")
    member_sh = repl_sh = None
    if mesh is not None:
      n_dev = int(np.prod(list(mesh.shape.values())))
      assert self.n_models % n_dev == 0, (
          f"n_models {self.n_models} must divide evenly over the "
          f"{n_dev}-device mesh (each chip trains n_models/n_devices "
          "members)")
      # member axis (axis 0 of every stacked leaf) shards over ALL mesh
      # axes; everything else replicates. Members are independent, so the
      # partitioned executable has no collectives at all.
      member_sh = NamedSharding(mesh, P(tuple(mesh.axis_names)))
      repl_sh = NamedSharding(mesh, P())
      stacked = jax.device_put(stacked, member_sh)
    xs = [jnp.asarray(src.gather(np.arange(n, dtype=np.int64),
                                 out=np.empty((n, src.shape[1]), np.float32)))
          for src in feeder.sources]
    library = (jnp.asarray(feeder.library)
               if feeder.library is not None else None)
    if repl_sh is not None:
      xs = [jax.device_put(x, repl_sh) for x in xs]
      library = (jax.device_put(library, repl_sh)
                 if library is not None else None)
    B = int(batch_size)
    lp = float(labels_percent)
    n_models = self.n_models

    def member_epoch(state, x_list, lib, key):
      steps = n // B
      kperm, kmask, kstep = jax.random.split(key, 3)
      perm = jax.random.permutation(kperm, n)
      mask_all = (jax.random.uniform(kmask, (n,)) < lp).astype(jnp.float32)
      keys = jax.random.split(kstep, steps)

      def body(carry, scan_in):
        st, loss_sum = carry
        i, kk = scan_in
        rows = jax.lax.dynamic_slice(perm, (i * B,), (B,))
        batch = {"inputs": [jnp.take(x, rows, axis=0) for x in x_list],
                 "mask": jnp.take(mask_all, rows, axis=0)}
        if lib is not None:
          batch["library"] = jnp.take(lib, rows, axis=0)
        st, metrics = core(st, batch, kk)
        return (st, loss_sum + metrics["loss"]), None

      # unroll the step scan when the vmapped per-step work is small
      # (same overhead-amortization as Trainer: +17% measured on v5e);
      # stay at 1 for big fleets/models where it only multiplies compile
      total = sum(x.shape[1] for x in x_list)
      unroll = 8 if n_models * B * max(1, total) <= 2 ** 21 else 1
      (state, loss_sum), _ = jax.lax.scan(
          body, (state, jnp.zeros(())), (jnp.arange(steps), keys),
          unroll=min(unroll, steps))
      return state, loss_sum / (n // B)

    interval = max(1, int(metrics_interval))

    def member_window(state, x_list, lib, keys):  # keys: (E, key)
      def body(st, kk):
        st, loss = member_epoch(st, x_list, lib, kk)
        return st, loss
      return jax.lax.scan(body, state, keys)      # losses: (E,)

    vmapped = jax.jit(jax.vmap(member_window,
                               in_axes=(0, None, None, 0),
                               out_axes=(0, 0)),
                      donate_argnums=(0,))
    key = jax.random.key(17, impl=getattr(model, "prng", "rbg"))
    losses: List[np.ndarray] = []
    times: List[float] = []
    done = 0
    while done < epochs:
      window = min(interval, epochs - done)
      t0 = time.perf_counter()
      key, sub = jax.random.split(key)
      if shared_batches:
        epoch_keys = jax.random.split(sub, window)             # (E, key)
        member_keys = jnp.broadcast_to(
            epoch_keys, (n_models,) + epoch_keys.shape)        # (M, E, key)
      else:
        member_keys = jax.random.split(
            sub, n_models * window).reshape((n_models, window) +
                                            sub.shape)
      if member_sh is not None:
        member_keys = jax.device_put(member_keys, member_sh)
      if window != interval:
        # trailing partial window: separate (smaller) executable
        stacked, win_losses = jax.jit(
            jax.vmap(member_window, in_axes=(0, None, None, 0),
                     out_axes=(0, 0)),
            donate_argnums=(0,))(stacked, xs, library, member_keys)
      else:
        stacked, win_losses = vmapped(stacked, xs, library, member_keys)
      win_losses = np.asarray(win_losses)      # (M, E): one fetch/window
      dt = (time.perf_counter() - t0) / window
      for e in range(window):
        losses.append(win_losses[:, e])
        times.append(dt)
        if verbose:
          print(f"[ensemble epoch {done + e:03d}] "
                f"loss={np.round(losses[-1], 2)} ({dt:.3f}s)")
      done += window
    self._stacked = stacked
    self.history["loss"] = np.stack(losses)       # (epochs, n_models)
    self.history["epoch_time"] = np.asarray(times)
    # write trained params back into the member models
    for i, m in enumerate(self.models):
      member = jax.tree_util.tree_map(lambda x: x[i], stacked)
      m._state = member
    return self

  def extract(self, index: int):
    """Return member ``index`` as a standalone trained model."""
    return self.models[index]

  def best(self):
    assert "loss" in self.history, "fit first"
    return self.extract(int(np.argmin(self.history["loss"][-1])))
