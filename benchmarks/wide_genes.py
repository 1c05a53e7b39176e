"""Wide-gene regime benchmark: full-transcriptome SCVI (33k genes).

The 10x full-transcriptome regime (e.g. `neuron10k`/`heart10k`: ~33k gene
columns) is where the gene-dimension head matmuls (hidden → 3·G ZINB
params) dominate the step — the regime `compute_dtype='bfloat16'` and the
fused Pallas ZINB row-sum (>4M elements/batch) are built for. Compares
f32 vs bf16 window throughput and reports the ELBO trajectory of both.

  PYTHONPATH=/root/.axon_site:. python benchmarks/wide_genes.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

N = int(os.environ.get("CELLS", 8192))
G = int(os.environ.get("GENES", 33_000))
BATCH = int(os.environ.get("BATCH", 512))
# default 8 epochs = 4 windows → 3 steady windows per dtype after dropping
# the compile window: the f32-vs-bf16 ratio is a median-vs-median, not a
# single-run comparison the ±30% tunnel variance can flip
EPOCHS = int(os.environ.get("EPOCHS", 8))
WINDOW = int(os.environ.get("WINDOW", 2))


def main():
  import jax
  import jax.numpy as jnp
  import numpy as np
  import optax

  from sisua_tpu.models import SCVI, RVmeta
  from sisua_tpu.train.trainer import Trainer

  assert EPOCHS >= 2 * WINDOW, (
      f"need at least 2 windows (first is compile): EPOCHS={EPOCHS} "
      f"< 2*WINDOW={2 * WINDOW}")
  global N
  if N % 1024:
    # the dataset materializes in 1024-row chunks; truncate N so the
    # reported cells/s and per-step loss normalize over the rows that
    # actually exist (a phantom remainder inflated both before)
    N = (N // 1024) * 1024
  t0 = time.perf_counter()
  def log(m):
    print(f"[{time.perf_counter() - t0:7.1f}s] {m}", flush=True)
  log(f"device = {jax.devices()[0]}; {N:,} cells × {G:,} genes, "
      f"batch {BATCH}")

  # on-device synthesis (host synthesis of N×G counts is minutes)
  CHUNK = 1024
  @jax.jit
  def make_chunk(key):
    k1, k2, k3 = jax.random.split(key, 3)
    lam = jnp.exp(-2.5 + 1.2 * jax.random.normal(k1, (CHUNK, G)))
    x = jax.random.poisson(k2, lam).astype(jnp.float32)
    return x * (jax.random.uniform(k3, (CHUNK, G)) > 0.5)

  keys = jax.random.split(jax.random.PRNGKey(0), N // CHUNK)
  X = jnp.concatenate([make_chunk(k) for k in keys], 0)
  X.block_until_ready()
  log(f"dataset in HBM ({X.nbytes / 1e9:.1f} GB)")
  logc = jnp.log(X.sum(1) + 1e-8)
  library = jnp.stack([jnp.full((N,), logc.mean()),
                       jnp.full((N,), logc.var())], -1)

  results = {}
  for dtype in (None, "bfloat16"):
    model = SCVI(RVmeta(G, "zinbd", name="rna"),
                 latents=RVmeta(16, "diag", name="latents"),
                 encoder={"units": [128, 128], "batchnorm": True},
                 decoder={"units": [128, 128], "batchnorm": True},
                 compute_dtype=dtype)
    model._ensure_initialized()
    tx = optax.chain(optax.clip_by_global_norm(100.0), optax.adam(1e-3))
    state = model.state.replace(opt_state=tx.init(model.state.params))
    trainer = Trainer(step_core=model.make_train_step_core(tx),
                      valid_freq=0, patience=0)
    _, body = trainer._build_epoch_fn(BATCH, 0.0, has_library=True)
    win = trainer._build_window_fn(body, WINDOW)
    probe = {"inputs": [X[:BATCH]], "mask": jnp.ones((BATCH,)),
             "library": library[:BATCH]}
    acc = trainer._init_acc(state, probe, jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    rates, losses = [], []
    for w in range(EPOCHS // WINDOW):
      te = time.perf_counter()
      key, sub = jax.random.split(key)
      # window_fn returns per-epoch metric sums stacked (WINDOW, ...);
      # `acc` is only the zero template (not donated) — reuse it as-is
      state, accs = win(state, acc, [X], library, sub)
      sums = jax.device_get(accs)
      dt = time.perf_counter() - te
      rate = N * WINDOW / dt
      loss = float(np.sum(sums["loss"])) / ((N // BATCH) * WINDOW)
      losses.append(loss)
      if w > 0:
        rates.append(rate)
      log(f"dtype={dtype or 'float32'} window {w}: loss={loss:.1f} "
          f"{dt:.2f}s → {rate:,.0f} cells/s")
    results[dtype or "float32"] = (float(np.median(rates)),
                                   [float(np.min(rates)),
                                    float(np.max(rates))], losses[-1])
  f32_rate, f32_spread, f32_loss = results["float32"]
  bf_rate, bf_spread, bf_loss = results["bfloat16"]
  n_steady = EPOCHS // WINDOW - 1
  print(f"\nfloat32:  {f32_rate:,.0f} cells/s (median of {n_steady}, "
        f"spread [{f32_spread[0]:,.0f}–{f32_spread[1]:,.0f}], "
        f"loss {f32_loss:.1f})")
  print(f"bfloat16: {bf_rate:,.0f} cells/s (median of {n_steady}, "
        f"spread [{bf_spread[0]:,.0f}–{bf_spread[1]:,.0f}], "
        f"loss {bf_loss:.1f}) → {bf_rate / f32_rate:.2f}× throughput")


if __name__ == "__main__":
  main()
