"""MFU / roofline accounting for the three perf regimes (VERDICT r2 #5).

For each regime the script compiles a production-shaped executable (K SGD
steps inside one lax.scan, each step gathering a fresh random row-batch
from an HBM-resident table — the device-cached training layout; a
single-step executable would measure per-call dispatch RPC latency over
the remote tunnel, not device time), takes XLA's own cost analysis
(FLOPs + bytes accessed per step), measures steady step time, and reports
achieved TFLOP/s and HBM GB/s against the v5e peaks — making "the step is
the floor" auditable instead of asserted. A wide-regime batch-size sweep
(512→2048) probes the unpinned batch axis.

v5e peaks (public spec): 197 TFLOP/s bf16 (MXU), 819 GB/s HBM.
The models here run f32 matmuls (default); XLA executes them on the MXU
at roughly half bf16 rate, so an f32 "practical peak" of ~99 TFLOP/s is
also shown. FLOP counts are XLA cost-analysis numbers: matmul/conv exact,
transcendentals counted as 1 flop each — the likelihood's lgamma/digamma
chains are therefore UNDER-counted; achieved FLOP/s is a lower bound.

  python benchmarks/roofline.py --out benchmarks/results_roofline.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from sisua_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

PEAK_BF16 = 197e12
PEAK_F32 = PEAK_BF16 / 2
PEAK_HBM = 819e9


def build_env(n_genes, batch, trunk, table_rows, latent=16, seed=0,
              dispersion="full"):
  """Model + optimizer state + device-resident table, reused across the
  inner-length variants of one regime."""
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
               dispersion=dispersion,
               seed=seed)
  model._ensure_initialized()
  tx = optax.chain(optax.clip_by_global_norm(100.0), optax.adam(1e-3))
  state = model.state.replace(opt_state=tx.init(model.state.params))
  core = model.make_train_step_core(tx)
  n_params = sum(int(np.prod(l.shape)) for l in
                 jax.tree_util.tree_leaves(state.params))

  # synthesize the resident table on device in chunks (counts ~ Poisson(2))
  chunk = min(table_rows, 125_000)

  @jax.jit
  def make_chunk(key):
    return jax.random.poisson(key, 2.0, (chunk, n_genes)).astype(jnp.float32)

  keys = jax.random.split(jax.random.PRNGKey(7),
                          (table_rows + chunk - 1) // chunk)
  table = jnp.concatenate([make_chunk(k) for k in keys], 0)[:table_rows]
  lib_t = jnp.concatenate([jnp.full((table_rows, 1), 6.0, jnp.float32),
                           jnp.full((table_rows, 1), 0.5, jnp.float32)], -1)
  return core, state, table, lib_t, n_params


def build_scan(env, batch, table_rows, inner, donate=True):
  """Jitted fn of ``inner`` SGD steps in ONE lax.scan over env's table."""
  import jax
  import jax.numpy as jnp

  core, state, table, lib_t, _ = env

  def steps_fn(state, table, lib_t, key):
    def body(st, kk):
      kidx, kstep = jax.random.split(kk)
      idx = jax.random.randint(kidx, (batch,), 0, table_rows)
      batch_d = {"inputs": [jnp.take(table, idx, axis=0)],
                 "library": jnp.take(lib_t, idx, axis=0),
                 "mask": jnp.ones((batch,), jnp.float32)}
      st, m = core(st, batch_d, kstep)
      return st, m["loss"]
    state, losses = jax.lax.scan(body, state, jax.random.split(key, inner))
    return state, losses

  args = (state, table, lib_t, jax.random.PRNGKey(0))
  return jax.jit(steps_fn, donate_argnums=(0,) if donate else ()), args


def cost_per_step(env, batch, table_rows):
  """Per-step flops/bytes from XLA's own cost analysis, via DIFFERENCING
  the inner=2 and inner=1 compiles. Backends disagree on scan accounting
  (CPU multiplies the body by the trip count; TPU counts it once), so a
  divide-by-inner is wrong on one of them. diff(2,1) isolates one body on
  multiplying backends; on counted-once backends it is ~0 and we fall
  back to the inner=1 totals minus nothing (the body IS the total, up to
  the constant outside-scan part — acceptable, it is one step + one
  permutation draw). Bytes remain a *static operand estimate* (XLA
  charges a gather with its full operand), so downstream reporting also
  derives an analytic floor."""
  costs = []
  for inner in (1, 2):
    fn, args = build_scan(env, batch, table_rows, inner, donate=False)
    compiled = fn.lower(*args).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    costs.append((float(ca.get("flops", 0.0)),
                  float(ca.get("bytes accessed", 0.0))))
  (f1, b1), (f2, b2) = costs
  flops = f2 - f1 if (f2 - f1) > 0.5 * f1 else f1
  byts = b2 - b1 if (b2 - b1) > 0.5 * b1 else b1
  return flops, byts


def measure(name, n_genes, batch, trunk, windows, inner, table_rows,
            dispersion="full"):
  import jax
  import numpy as np
  env = build_env(n_genes, batch, trunk, table_rows, dispersion=dispersion)
  n_params = env[4]
  flops, byts = cost_per_step(env, batch, table_rows)
  # analytic HBM floor per step: the gathered rows + one adam param pass
  # (read p,m,v,grad-sized activations is ignored — floor, not estimate)
  bytes_floor = batch * n_genes * 4 + 8 * n_params * 4
  fn, args = build_scan(env, batch, table_rows, inner)
  t0 = time.perf_counter()
  compiled = fn.lower(*args).compile()
  compile_s = time.perf_counter() - t0
  state, rest = args[0], args[1:]
  # sync by FETCHING the last loss: over the axon tunnel
  # block_until_ready acknowledges dispatch without awaiting remote
  # execution (profile_1m.py measured a 7.8k-step epoch "ready" in 1.2 ms)
  state, losses = compiled(state, *rest)
  jax.device_get(losses[-1])  # warm
  times = []
  for _ in range(max(3, windows)):
    t0 = time.perf_counter()
    state, losses = compiled(state, *rest)
    jax.device_get(losses[-1])
    times.append((time.perf_counter() - t0) / inner)
  dt = float(np.median(times))
  row = {
      "regime": name, "genes": n_genes, "batch": batch,
      "params": n_params, "flops_per_step": flops,
      "bytes_per_step": byts, "step_ms": round(dt * 1e3, 4),
      "cells_per_sec": round(batch / dt, 0),
      "tflops": round(flops / dt / 1e12, 3),
      "pct_peak_f32": round(100 * flops / dt / PEAK_F32, 2),
      "pct_peak_bf16": round(100 * flops / dt / PEAK_BF16, 2),
      "hbm_gbs_static": round(byts / dt / 1e9, 1),
      "pct_hbm_static": round(100 * byts / dt / PEAK_HBM, 1),
      "hbm_gbs_floor": round(bytes_floor / dt / 1e9, 1),
      "pct_hbm_floor": round(100 * bytes_floor / dt / PEAK_HBM, 1),
      "compile_s": round(compile_s, 1),
  }
  print(json.dumps(row), flush=True)
  return row


def main(argv=None):
  p = argparse.ArgumentParser("roofline")
  p.add_argument("--windows", type=int, default=5)
  p.add_argument("--out", default="/tmp/roofline.md")
  p.add_argument("--regimes", default="headline,1m,wide,sweep,widepg")
  args = p.parse_args(argv)
  want = set(args.regimes.split(","))

  rows = []
  if "headline" in want:
    rows.append(measure("headline 128x500 (100k table)", 500, 128, 64,
                        args.windows, inner=781, table_rows=100_000))
  if "1m" in want:
    # identical math to headline but gathering from a 1M-row, 2 GB table —
    # isolates the gather-locality cost of the big working set
    rows.append(measure("1m-gather 128x500 (1M table)", 500, 128, 64,
                        args.windows, inner=781, table_rows=1_000_000))
  if "wide" in want:
    rows.append(measure("wide 512x33k", 33_000, 512, 128,
                        args.windows, inner=16, table_rows=8_192))
  if "sweep" in want:
    for b in (1024, 2048):
      rows.append(measure(f"wide {b}x33k", 33_000, b, 128,
                          args.windows, inner=8, table_rows=8_192))
  if "widepg" in want:
    # scvi-tools' default parameterization: ONE dispersion per gene
    # ('single'). The (D,) row rides the fused kernels' per-gene path
    # (in-VMEM broadcast + in-kernel gradient reduction) instead of a
    # materialized (B, D) broadcast — and drops the Dispersion head's
    # matmul entirely.
    for b in (512, 1024, 2048):
      rows.append(measure(f"wide-pg {b}x33k single-disp", 33_000, b, 128,
                          args.windows, inner=8, table_rows=8_192,
                          dispersion="single"))

  cols = ["regime", "genes", "batch", "params", "flops_per_step",
          "step_ms", "cells_per_sec", "tflops", "pct_peak_f32",
          "pct_hbm_floor", "pct_hbm_static", "compile_s"]
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
