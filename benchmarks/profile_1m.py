"""Profile the 1M-cell regression (VERDICT r2 #3).

The scalability grid peaks at 100k cells (~1.84M cells/s) but the 1M point
measured ~1.39M cells/s — same per-step math, same batch, 10× the rows.
This script decomposes the per-epoch executable at both sizes to locate
the superlinear term:

  * full epoch (permutation + mask + step scan) — the production path;
  * epoch with the permutation hoisted OUT (identity order) — isolates the
    per-epoch `jax.random.permutation(n)` (a bitonic sort on TPU, O(n log²n)
    — amortized over n/B steps it cancels to O(log²n · B) per cell, but the
    constant matters);
  * the permutation + mask draws alone, jitted;
  * a pure gather+step probe from the resident table (locality effect of a
    2 GB vs 0.2 GB working set).

  python benchmarks/profile_1m.py --sizes 100000,1000000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

G, BATCH = 500, 128


def _sync(out):
  """Force completion by FETCHING a value. Over the axon tunnel
  ``block_until_ready`` acknowledges dispatch without awaiting remote
  execution (measured: a 7.8k-step epoch 'completed' in 1.2 ms) — every
  honest benchmark in this repo syncs with a device_get instead."""
  import jax
  leaf = jax.tree_util.tree_leaves(out)[0]
  return jax.device_get(leaf if leaf.ndim == 0 else leaf.ravel()[0])


def bench(fn, *args, n=5, warm=1):
  for _ in range(warm):
    _sync(fn(*args))
  t0 = time.perf_counter()
  for _ in range(n):
    out = fn(*args)
  _sync(out)
  return (time.perf_counter() - t0) / n


def main(argv=None):
  p = argparse.ArgumentParser("profile-1m")
  p.add_argument("--sizes", default="100000,1000000")
  p.add_argument("--epochs-timed", type=int, default=3)
  args = p.parse_args(argv)

  import jax
  import jax.numpy as jnp
  import numpy as np
  import optax

  from sisua_tpu.models import SCVI, RVmeta
  from sisua_tpu.train.trainer import Trainer

  print(f"device = {jax.devices()[0]}", flush=True)

  for n_cells in [int(s) for s in args.sizes.split(",")]:
    # --- on-device synthesis (matches train_1m_device.py)
    chunk = min(125_000, n_cells)

    @jax.jit
    def make_chunk(key, arch):
      k2, k3, k4, k5, k6, k7 = jax.random.split(key, 6)
      ct = jax.random.randint(k2, (chunk,), 0, 7)
      logits = arch[ct] + 0.3 * jax.random.normal(k3, (chunk, G))
      props = jax.nn.softmax(logits, -1)
      lib = jnp.exp(7.0 + 0.4 * jax.random.normal(k4, (chunk, 1)))
      g = jax.random.gamma(k5, 2.0 * jnp.ones((chunk, G))) * (
          props * lib / 2.0)
      x = jax.random.poisson(k6, g).astype(jnp.float32)
      return x * (jax.random.uniform(k7, (chunk, G)) > 0.3)

    arch = jax.random.normal(jax.random.PRNGKey(42), (7, G))
    keys = jax.random.split(jax.random.PRNGKey(0), max(1, n_cells // chunk))
    X = jnp.concatenate([make_chunk(k, arch) for k in keys], 0)[:n_cells]
    _sync(X)
    logc = jnp.log(X.sum(1) + 1e-8)
    library = jnp.stack([jnp.full((n_cells,), logc.mean()),
                         jnp.full((n_cells,), logc.var())], -1)

    model = SCVI(RVmeta(G, "zinbd", name="rna"),
                 latents=RVmeta(16, "diag", name="latents"))
    model._ensure_initialized()
    tx = optax.chain(optax.clip_by_global_norm(100.0), optax.adam(1e-3))
    state = model.state.replace(opt_state=tx.init(model.state.params))
    trainer = Trainer(step_core=model.make_train_step_core(tx),
                      valid_freq=0, patience=0)
    unroll = trainer._unroll_for(BATCH, G)
    core = trainer.step_core
    steps = n_cells // BATCH

    # --- (a) production epoch: perm + mask + scan
    epoch_fn, _ = trainer._build_epoch_fn(BATCH, 0.0, has_library=True,
                                          unroll=unroll)
    probe = {"inputs": [X[:BATCH]], "mask": jnp.ones((BATCH,)),
             "library": library[:BATCH]}
    acc0 = trainer._init_acc(state, probe, jax.random.PRNGKey(1))

    def run_epoch(st, key):
      st, acc = epoch_fn(st, jax.tree_util.tree_map(jnp.zeros_like, acc0),
                         [X], library, key)
      return st, acc

    # warm/compile
    state, _ = run_epoch(state, jax.random.PRNGKey(10))
    _sync(state.params)
    t = []
    for e in range(args.epochs_timed):
      te = time.perf_counter()
      state, acc = run_epoch(state, jax.random.PRNGKey(20 + e))
      _sync(acc["loss"])
      t.append(time.perf_counter() - te)
    t_full = float(np.median(t))

    # --- (b) epoch with a FIXED random permutation vs identity order.
    # Two ablations so the two suspects separate instead of confounding:
    #   fixedperm: random-locality gathers, but the permutation is a
    #     precomputed constant (no per-epoch sort) →
    #     t_full − t_fixedperm = the per-epoch permutation compute;
    #   noperm: contiguous arange gathers →
    #     t_fixedperm − t_noperm = random-vs-sequential gather locality
    #     on the resident table (the superlinear suspect at 2 GB).
    fixed_rows = jnp.asarray(
        np.random.default_rng(7).permutation(n_cells).astype(np.int32))

    def make_epoch(order):  # order: None = identity, else a device array
      def epoch(st, acc, xs, lib, key):
        keys_s = jax.random.split(key, steps)

        def body(carry, scan_in):
          s, ac = carry
          i, kk = scan_in
          src = (jnp.arange(n_cells, dtype=jnp.int32) if order is None
                 else order)
          rows = jax.lax.dynamic_slice(src, (i * BATCH,), (BATCH,))
          batch = {"inputs": [jnp.take(xs[0], rows, axis=0)],
                   "mask": jnp.ones((BATCH,), jnp.float32),
                   "library": jnp.take(lib, rows, axis=0)}
          s, m = core(s, batch, kk)
          return (s, jax.tree_util.tree_map(lambda a, b: a + b, ac, m)), \
              None

        (st, acc), _ = jax.lax.scan(body, (st, acc),
                                    (jnp.arange(steps), keys_s),
                                    unroll=min(unroll, steps))
        return st, acc
      return epoch

    fixedperm = jax.jit(make_epoch(fixed_rows), donate_argnums=(0, 1))
    acc = jax.tree_util.tree_map(jnp.zeros_like, acc0)
    state, acc = fixedperm(state, acc, [X], library, jax.random.PRNGKey(29))
    _sync(acc["loss"])
    t = []
    for e in range(args.epochs_timed):
      acc = jax.tree_util.tree_map(jnp.zeros_like, acc0)
      te = time.perf_counter()
      state, acc = fixedperm(state, acc, [X], library,
                             jax.random.PRNGKey(60 + e))
      _sync(acc["loss"])
      t.append(time.perf_counter() - te)
    t_fixedperm = float(np.median(t))

    noperm = jax.jit(make_epoch(None), donate_argnums=(0, 1))
    acc = jax.tree_util.tree_map(jnp.zeros_like, acc0)
    state, acc = noperm(state, acc, [X], library, jax.random.PRNGKey(30))
    _sync(acc["loss"])
    t = []
    for e in range(args.epochs_timed):
      acc = jax.tree_util.tree_map(jnp.zeros_like, acc0)
      te = time.perf_counter()
      state, acc = noperm(state, acc, [X], library,
                          jax.random.PRNGKey(40 + e))
      _sync(acc["loss"])
      t.append(time.perf_counter() - te)
    t_noperm = float(np.median(t))

    # --- (c) the per-epoch randomness alone
    @jax.jit
    def perm_mask(key):
      kperm, kmask = jax.random.split(key)
      perm = jax.random.permutation(kperm, n_cells)
      mask = (jax.random.uniform(kmask, (n_cells,)) < 0.5)
      return perm, mask

    t_perm = bench(perm_mask, jax.random.PRNGKey(50), n=10)

    row = {
        "cells": n_cells,
        "epoch_full_s": round(t_full, 4),
        "epoch_fixedperm_s": round(t_fixedperm, 4),
        "epoch_noperm_s": round(t_noperm, 4),
        "perm_mask_s": round(t_perm, 4),
        # separated attribution (the old perm_share_pct conflated the two)
        "perm_compute_share_pct":
            round(100 * (t_full - t_fixedperm) / t_full, 1),
        "gather_locality_share_pct":
            round(100 * (t_fixedperm - t_noperm) / t_full, 1),
        "cells_per_sec_full": round(n_cells / t_full, 0),
        "cells_per_sec_noperm": round(n_cells / t_noperm, 0),
    }
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
  main()
