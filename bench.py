"""Benchmark: scVI training throughput (cells/sec/chip).

Protocol: the reference's scalability test
(``/root/reference/tests/test_scalability.py:22-28``) — synthetic cells ×
500 genes × 10 proteins, batch 128, Adam 1e-3 — measured here as steady-state
training cells/sec on one chip for the SCVI flagship (BASELINE.json north
star: "training scVI at ≥10× cells/sec/chip" vs the reference's single-GPU
protocol).

Baseline: the reference publishes no numbers (BASELINE.md); its protocol is a
TF2 custom loop on a single GPU. We use a *generous* reference estimate of
20,000 cells/sec (typical measured throughput for keras-loop scVI-class
models at batch 128 on a contemporary GPU); ``vs_baseline`` is measured/20k.
A measured cross-framework quality anchor (PyTorch scVI at identical NLL on
identical data) lives in ``tests/test_model_parity.py``; see RESULTS.md.

Statistic: the median over ≥5 steady-state training windows (first window
excluded: it contains compilation). The tunnel to the remote-attached chip
adds transient stalls uncorrelated with the workload, so the spread
(min..max) is reported alongside; the median is the headline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"n_windows", "spread", "sentinel_rate", "sentinel_ratio"}.

Sentinel protocol (VERDICT r3 #9): the tunnel to the remote-attached chip
swings repeated identical runs by ±30% across sessions, so raw cells/sec
deltas between rounds are noise below that. Each bench run therefore also
measures a FROZEN pure-JAX probe workload (``_sentinel_rate`` — pinned
shapes/dtype/steps, independent of all sisua_tpu code, never to be edited)
immediately before and after the main measurement in the same session.
``sentinel_ratio`` = headline / median(sentinel windows) is the
variance-robust statistic: round-over-round framework changes move the
ratio; tunnel/hardware drift moves numerator and denominator together.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_CELLS_PER_SEC = 20_000.0  # generous single-GPU reference estimate

N_CELLS = int(os.environ.get("BENCH_CELLS", 40_000))
N_GENES = 500
N_PROTEINS = 10
BATCH = int(os.environ.get("BENCH_BATCH", 128))
# 6 windows of 8 epochs → ≥5 steady windows after dropping the compile window
EPOCHS = int(os.environ.get("BENCH_EPOCHS", 48))
METRICS_INTERVAL = int(os.environ.get("BENCH_METRICS_INTERVAL", 8))


def _sentinel_rate():
  """FROZEN probe: fixed-shape MLP fwd+bwd chain on-device, cells/sec.

  DO NOT EDIT — cross-round comparability depends on this workload staying
  bit-identical. Pure jax, no sisua_tpu imports: 2-layer 512-wide f32 MLP,
  batch 128 × 500 features, 400 fused steps per window via lax.scan,
  fetch-synced (block_until_ready over the tunnel acks dispatch without
  awaiting execution — see RESULTS.md). Returns the median window rate in
  probe-cells/sec over 3 steady windows (first window dropped: compile).
  """
  import time

  import jax
  import jax.numpy as jnp
  import numpy as np
  from jax import lax, random

  B, F, H, STEPS = 128, 500, 512, 400
  k0, k1, k2, k3 = random.split(random.PRNGKey(5218), 4)
  params = (random.normal(k0, (F, H), jnp.float32) * 0.05,
            random.normal(k1, (H, H), jnp.float32) * 0.05,
            random.normal(k2, (H, F), jnp.float32) * 0.05)
  x = random.normal(k3, (B, F), jnp.float32)

  def loss_fn(p, xb):
    w0, w1, w2 = p
    h = jnp.tanh(xb @ w0)
    h = jnp.tanh(h @ w1)
    return jnp.mean((h @ w2 - xb) ** 2)

  @jax.jit
  def window(p):
    def step(p, _):
      l, g = jax.value_and_grad(loss_fn)(p, x)
      return tuple(w - 1e-3 * gw for w, gw in zip(p, g)), l
    p, losses = lax.scan(step, p, None, length=STEPS)
    return p, losses[-1]

  rates = []
  for i in range(4):
    t0 = time.perf_counter()
    params, last = window(params)
    float(last)  # fetch = the only reliable sync over the tunnel
    dt = time.perf_counter() - t0
    if i > 0:  # window 0 contains compilation
      rates.append(B * STEPS / dt)
  return float(np.median(rates))


def main():
  import numpy as np
  from sisua_tpu.data import generate_synthetic
  from sisua_tpu.models import SCVI, RVmeta

  sco = generate_synthetic(n_cells=N_CELLS, n_genes=N_GENES,
                           n_proteins=N_PROTEINS, seed=5218)

  sentinel_pre = _sentinel_rate()

  model = SCVI(RVmeta(N_GENES, "zinbd", name="rna"),
               latents=RVmeta(16, "diag", name="latents"))
  # device-resident training: the dense matrix lives in HBM; each epoch is
  # one executable (shuffle+mask+all batch-128 steps in a lax.scan), with
  # metric fetches amortized over METRICS_INTERVAL epochs (the fetch is the
  # only host sync — a full RPC round-trip on remote-attached chips)
  model.fit(sco, epochs=EPOCHS, batch_size=BATCH, learning_rate=1e-3,
            valid_freq=0, patience=0, device_cache=True,
            metrics_interval=METRICS_INTERVAL, verbose=False)
  # history is per-epoch; epochs within a metrics window share the window
  # rate, so collapse to one rate per window, then drop the first window
  # (it includes compilation). The headline is the MEDIAN of the steady
  # windows — no cherry-picking — with the min..max spread reported.
  # one rate per FULL window (or per epoch when EPOCHS < METRICS_INTERVAL
  # and the trainer ran per-epoch executables), compile unit dropped;
  # truncated histories degrade to fewer windows instead of an IndexError
  from sisua_tpu.utils import steady_window_rates
  steady = steady_window_rates(model.history["cells_per_sec"],
                               EPOCHS, METRICS_INTERVAL)
  cells_per_sec = float(np.median(steady))
  # cold/warm compile accounting (VERDICT r4 §weak 5): window 0 is the
  # compile window; its wall-clock excess over a steady window ≈ compile
  # time. fit() wires the persistent XLA compilation cache under
  # SISUA_EXP, so a SECOND bench run in a fresh process should report
  # compile_s ≈ 0 (warm cache) — compare across runs.
  rate0 = float(model.history["cells_per_sec"][0])
  # unit 0 is one FULL window (METRICS_INTERVAL epochs) — except in the
  # per-epoch-executable regime (EPOCHS < METRICS_INTERVAL), where each
  # epoch is its own unit (see steady_window_rates): scaling by the
  # window size there would overstate compile_s by EPOCHS×
  unit_epochs = METRICS_INTERVAL if EPOCHS >= METRICS_INTERVAL else 1
  cells_per_unit = N_CELLS * unit_epochs
  compile_s = max(0.0, cells_per_unit / max(rate0, 1.0)
                  - cells_per_unit / cells_per_sec)
  sentinel_post = _sentinel_rate()
  sentinel = float(np.median([sentinel_pre, sentinel_post]))
  result = {
      "metric": "scvi_train_cells_per_sec_per_chip",
      "value": round(cells_per_sec, 1),
      "unit": "cells/sec",
      "vs_baseline": round(cells_per_sec / REFERENCE_CELLS_PER_SEC, 3),
      "n_windows": len(steady),
      "spread": [round(float(np.min(steady)), 1),
                 round(float(np.max(steady)), 1)],
      # frozen-probe normalization: compare THIS across rounds, not value
      "sentinel_rate": round(sentinel, 1),
      "sentinel_pre_post": [round(sentinel_pre, 1), round(sentinel_post, 1)],
      "sentinel_ratio": round(cells_per_sec / sentinel, 4),
      # ≈0 when the persistent XLA cache (under SISUA_EXP) is warm
      "compile_s": round(compile_s, 1),
  }
  print(json.dumps(result))
  return result


if __name__ == "__main__":
  main()
