"""MFU / roofline accounting for the three perf regimes (VERDICT r2 #5).

For each regime the script compiles the REAL train step, takes XLA's own
cost analysis (FLOPs + bytes accessed per step), measures steady step
time, and reports achieved TFLOP/s and HBM GB/s against the v5e peaks —
making "the step is the floor" auditable instead of asserted. A wide-regime
batch-size sweep (512→2048) probes the unpinned batch axis.

v5e peaks (public spec): 197 TFLOP/s bf16 (MXU), 819 GB/s HBM.
The models here run f32 matmuls (default); XLA executes them on the MXU
at roughly half bf16 rate, so an f32 "practical peak" of ~99 TFLOP/s is
also shown. FLOP counts are XLA cost-analysis numbers: matmul/conv exact,
transcendentals counted as 1 flop each — the likelihood's lgamma/digamma
chains are therefore UNDER-counted; achieved FLOP/s is a lower bound.

  python benchmarks/roofline.py --steps 200 --out benchmarks/results_roofline.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

PEAK_BF16 = 197e12
PEAK_F32 = PEAK_BF16 / 2
PEAK_HBM = 819e9


def build_step(n_genes, batch, trunk, latent=16, table_rows=0, seed=0):
  """(jitted fn, args, n_params): one SGD step; with table_rows>0 the batch
  is gathered from an HBM-resident table each step (the device-cached
  training layout), making the 1M-regime gather cost visible."""
  import jax
  import jax.numpy as jnp
  import numpy as np
  import optax

  from sisua_tpu.models import SCVI, NetConf, RVmeta

  model = SCVI(RVmeta(n_genes, "zinbd", name="rna"),
               latents=RVmeta(latent, "diag", name="latents"),
               encoder=NetConf((trunk,), batchnorm=True),
               encoder_l=NetConf((64,)),
               decoder=NetConf((trunk,), batchnorm=True),
               seed=seed)
  model._ensure_initialized()
  tx = optax.chain(optax.clip_by_global_norm(100.0), optax.adam(1e-3))
  state = model.state.replace(opt_state=tx.init(model.state.params))
  core = model.make_train_step_core(tx)
  n_params = sum(np.prod(l.shape) for l in
                 jax.tree_util.tree_leaves(state.params))

  rng = np.random.default_rng(0)
  lib = np.concatenate([np.full((batch, 1), 6.0, np.float32),
                        np.full((batch, 1), 0.5, np.float32)], -1)
  if table_rows:
    table = jnp.asarray(
        rng.poisson(2.0, (table_rows, n_genes)).astype(np.float32))
    lib_t = jnp.asarray(np.broadcast_to(lib[:1], (table_rows, 2)).copy())

    def step(state, table, lib_t, idx, key):
      batch_d = {"inputs": [table[idx]], "library": lib_t[idx],
                 "mask": jnp.ones((idx.shape[0],), jnp.float32)}
      return core(state, batch_d, key)

    idx = jnp.asarray(rng.integers(0, table_rows, batch).astype(np.int32))
    args = (state, table, lib_t, idx, jax.random.PRNGKey(0))
    return jax.jit(step, donate_argnums=(0,)), args, int(n_params)

  batch_d = {"inputs": [jnp.asarray(
                 rng.poisson(2.0, (batch, n_genes)).astype(np.float32))],
             "library": jnp.asarray(lib),
             "mask": jnp.ones((batch,), jnp.float32)}

  def step(state, batch_d, key):
    return core(state, batch_d, key)

  args = (state, batch_d, jax.random.PRNGKey(0))
  return jax.jit(step, donate_argnums=(0,)), args, int(n_params)


def measure(name, n_genes, batch, trunk, steps, table_rows=0):
  import jax
  step, args, n_params = build_step(n_genes, batch, trunk,
                                    table_rows=table_rows)
  t0 = time.perf_counter()
  lowered = step.lower(*args)
  compiled = lowered.compile()
  compile_s = time.perf_counter() - t0
  ca = compiled.cost_analysis()
  ca = ca[0] if isinstance(ca, (list, tuple)) else ca
  flops = float(ca.get("flops", 0.0))
  byts = float(ca.get("bytes accessed", 0.0))
  # run: donated state threads through; other args are reused
  state = args[0]
  rest = args[1:]
  state, m = compiled(state, *rest)
  jax.block_until_ready(m["loss"])  # warm
  n = max(10, steps)
  t0 = time.perf_counter()
  for _ in range(n):
    state, m = compiled(state, *rest)
  jax.block_until_ready(m["loss"])
  dt = (time.perf_counter() - t0) / n
  row = {
      "regime": name, "genes": n_genes, "batch": batch,
      "params": n_params, "flops_per_step": flops,
      "bytes_per_step": byts, "step_ms": round(dt * 1e3, 3),
      "cells_per_sec": round(batch / dt, 0),
      "tflops": round(flops / dt / 1e12, 3),
      "pct_peak_f32": round(100 * flops / dt / PEAK_F32, 2),
      "pct_peak_bf16": round(100 * flops / dt / PEAK_BF16, 2),
      "hbm_gbs": round(byts / dt / 1e9, 1),
      "pct_hbm": round(100 * byts / dt / PEAK_HBM, 1),
      "compile_s": round(compile_s, 1),
  }
  print(json.dumps(row), flush=True)
  return row


def main(argv=None):
  p = argparse.ArgumentParser("roofline")
  p.add_argument("--steps", type=int, default=200)
  p.add_argument("--out", default="/tmp/roofline.md")
  p.add_argument("--regimes", default="headline,1m,wide,sweep")
  args = p.parse_args(argv)
  want = set(args.regimes.split(","))

  rows = []
  if "headline" in want:
    rows.append(measure("headline 128x500", 500, 128, 64, args.steps))
  if "1m" in want:
    # identical math to headline but the batch gathers from a 1M-row,
    # 2 GB HBM-resident table — isolates the gather-locality cost
    rows.append(measure("1m-gather 128x500 (1M-row table)", 500, 128, 64,
                        args.steps, table_rows=1_000_000))
    rows.append(measure("100k-gather 128x500 (100k-row table)", 500, 128,
                        64, args.steps, table_rows=100_000))
  if "wide" in want:
    rows.append(measure("wide 512x33k", 33_000, 512, 128,
                        max(20, args.steps // 10)))
  if "sweep" in want:
    for b in (1024, 2048):
      rows.append(measure(f"wide {b}x33k", 33_000, b, 128,
                          max(10, args.steps // 20)))

  cols = ["regime", "genes", "batch", "params", "flops_per_step",
          "bytes_per_step", "step_ms", "cells_per_sec", "tflops",
          "pct_peak_f32", "pct_hbm", "compile_s"]
  lines = ["| " + " | ".join(cols) + " |", "|" + "---|" * len(cols)]
  for r in rows:
    lines.append("| " + " | ".join(f"{r.get(c, '—'):g}"
                                   if isinstance(r.get(c), (int, float))
                                   else str(r.get(c, "—"))
                                   for c in cols) + " |")
  table = "\n".join(lines) + "\n"
  os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
  with open(args.out, "w") as f:
    f.write(f"v5e peaks: {PEAK_BF16/1e12:.0f} TF bf16 / "
            f"{PEAK_F32/1e12:.0f} TF f32-practical / "
            f"{PEAK_HBM/1e9:.0f} GB/s HBM\n\n" + table)
  with open(args.out + ".jsonl", "w") as f:
    for r in rows:
      f.write(json.dumps(r) + "\n")
  print(table)
  print("→", args.out)


if __name__ == "__main__":
  main()
