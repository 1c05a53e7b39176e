"""Serving / batch-scoring walkthrough: counts in → imputed means,
latent embeddings, denoised expression out — the production inference
surface and its transfer-compression knobs.

Runs anywhere (CPU-JAX included); on remote-attached TPU chips the
transfer compression is worth ~2× end-to-end (RESULTS.md "Inference /
serving throughput").

  JAX_PLATFORMS=cpu python tutorials/serving.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sisua_tpu.data import generate_citeseq
from sisua_tpu.models import SCVI, RVmeta

# --- train a model (any checkpoint dir works the same way) -----------------
sco = generate_citeseq(n_cells=2048, n_genes=120, n_proteins=8, seed=0)
train, fresh = sco.split(0.8, seed=1)
model = SCVI(RVmeta(train.n_vars, "zinbd", name="rna"),
             latents=RVmeta(16, "diag", name="latents"))
model.fit(train, epochs=6, batch_size=128, device_cache=True,
          metrics_interval=3, valid_freq=0, patience=0)

# --- 1. the serving path: predict_mean -------------------------------------
# Full `predict` returns distributions (every parameter × MC samples) —
# right for analysis, transfer-bound for serving. `predict_mean` reduces
# the MC average ON DEVICE and ships only (n, d) means: 24-35× faster on
# remote chips (RESULTS.md).
(imputed, *_), (latents, *_) = model.predict_mean(fresh, sample_shape=(10,))
print("imputed:", imputed.shape, "latents:", latents.shape)

# --- 2. transfer compression ------------------------------------------------
# input_dtype='auto' uploads integral counts as exact int16 (half the
# upstream bytes — the default); fetch_dtype='bfloat16' halves the fetch at
# ~0.4% relative error on the means. Same rng → same samples, so the two
# calls below differ only by bf16 rounding.
rng = model._rng
(x32, *_), _ = model.predict_mean(fresh, sample_shape=(4,))
model._rng = rng
(x16, *_), _ = model.predict_mean(fresh, sample_shape=(4,),
                                  fetch_dtype="bfloat16")
rel = np.abs(x16 - x32) / (np.abs(x32) + 1e-6)
print(f"bf16 fetch relative error: median {np.median(rel):.2e}")

# --- 3. denoised (library-free) expression ---------------------------------
# px_scale for SCVI-family decoders — the scvi-tools surface.
scale = model.get_normalized_expression(fresh, sample_shape=(10,))
print("normalized expression rows sum to 1:",
      np.allclose(scale.sum(1), 1.0, atol=1e-3))

# --- 4. multi-chip serving --------------------------------------------------
# On a multi-chip host, every inference entry point takes mesh= — cells
# shard over the mesh's 'data' axis, params are placed once and cached:
#   from sisua_tpu.parallel import create_mesh
#   model.predict_mean(fresh, mesh=create_mesh())

# --- 5. the same thing from the command line -------------------------------
# sisua-predict writes imputed.npz + latents.npz for any checkpoint:
#   python -m sisua_tpu.cli.predict ckpt_dir counts.npz -o scored/ \
#       --fetch-dtype bfloat16 --mesh all
print("done")
