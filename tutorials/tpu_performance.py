"""TPU-performance walkthrough: the features that make sisua_tpu fast.

Runs anywhere (CPU-JAX included) with small sizes; on a real TPU the same
code is what produced RESULTS.md's numbers (1.23M cells/s scVI headline
protocol, 1.20M cells/s at 100k cells, 1.39M cells/s at 1M cells).

  JAX_PLATFORMS=cpu python tutorials/tpu_performance.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from sisua_tpu.data import generate_synthetic
from sisua_tpu.models import SCVI, VAE, NetConf, RVmeta

# --- data: synthetic multi-omic counts (no network needed) -----------------
sco = generate_synthetic(n_cells=2048, n_genes=100, n_proteins=8, seed=0)
train, test = sco.split(0.8, seed=1)

# --- 1. device-resident window training ------------------------------------
# The dataset lives in HBM; each `metrics_interval` window of epochs
# (shuffle + masks + every SGD step) is ONE compiled executable ending in
# one metric fetch. This is the headline-throughput path.
model = SCVI(RVmeta(100, "zinbd", name="rna"),
             latents=RVmeta(16, "diag", name="latents"))
model.fit(train, epochs=8, batch_size=128,
          device_cache=True, metrics_interval=4,
          valid_freq=0, patience=0)
print("window losses:", [round(x, 1) for x in model.history["loss"]])
print("cells/sec:", [f"{r:,.0f}" for r in model.history["cells_per_sec"]])

# --- 2. bf16 compute (for wide-gene-head models) ----------------------------
# MLP trunks + distribution-head matmuls in bfloat16 on the MXU; params,
# batch stats, and all log-prob math stay float32. Wins when the gene-dim
# head matmuls dominate (tens of thousands of genes); measured *slower* at
# 64-wide layers — see RESULTS.md.
bf16 = VAE(RVmeta(100, "zinb", name="rna"), compute_dtype="bfloat16")
bf16.fit(train, epochs=2, batch_size=128, valid_freq=0, patience=0)
print("bf16 loss:", round(bf16.history["loss"][-1], 1),
      "| params stay float32:",
      jax.tree_util.tree_leaves(bf16.params)[0].dtype)

# --- 2b. epoch data layout (automatic; env-overridable) ----------------------
# Inside each epoch executable the trainer either gathers random rows from
# the HBM-resident table per step ('gather') or makes one whole-epoch
# permuted copy and takes contiguous slices ('permslice'). Batches are
# bit-identical either way; only the HBM access pattern differs. 'auto'
# picks by shape from measured A/Bs (RESULTS.md): permslice for <=64k-row
# tables whose second copy fits in 4 GB (+20-35% at 8192x33k), gather for
# tall tables (1M x 500). Override: SISUA_TPU_EPOCH_LAYOUT=gather|permslice.

# --- 3. multi-chip data parallelism ----------------------------------------
# On a multi-device runtime:  from sisua_tpu.parallel import create_mesh
#   model.fit(train, mesh=create_mesh(), device_cache=True, ...)
# The cached dataset uploads cell-sharded over the 'data' axis; XLA
# all-reduces gradients over ICI. (Run tests/ under an 8-virtual-device
# CPU mesh to see it execute.)

# --- 4. on-chip ensembles + hyper-search ------------------------------------
from sisua_tpu.models.hyper_params import fit_hyper_vmap

res = fit_hyper_vmap(
    lambda seed: VAE(RVmeta(100, "zinb", name="rna"), seed=seed,
                     encoder={"units": [32]}, decoder={"units": [32]}),
    train, learning_rates=(3e-4, 3e-3), seeds_per_rate=2,
    epochs=4, batch_size=128)
print("hyper-vmap best:", res["best"], "loss:", round(res["loss"], 1))

# --- 5. low-traffic inference ------------------------------------------------
# predict() ships full distribution params (x MC samples); predict_mean
# averages on device and fetches (n, d) arrays only.
x_means, z_means = model.predict_mean(test, sample_shape=(8,),
                                      batch_size=256)
print("imputed means:", x_means[0].shape, "| latents:", z_means[0].shape)

# --- 6. checkpoint + batch scoring ------------------------------------------
import tempfile

ckpt = tempfile.mkdtemp()
model.save_weights(ckpt)                      # or backend="orbax"
# CLI equivalent:  sisua-predict <ckpt> counts.npz -o scored/
print("checkpoint at", ckpt)

# --- 7. datasets larger than HBM (out-of-core) -------------------------------
# When the dense dataset exceeds the device budget, device_cache=True
# switches automatically to the out-of-core path: rows partition into
# HBM-sized random chunks, as many as fit stay pinned on device, the rest
# stream per epoch (upload overlapped with compute), and sparse (CSR)
# inputs ship as triplets + one on-device scatter — 3-6x the streaming
# fallback (see benchmarks/atlas_scale.py for a 13 GB / one-chip run).
# Demonstrated here by forcing a tiny budget on small data:
import scipy.sparse as sp

Xs = sp.csr_matrix(np.asarray(train.X.todense()
                              if sp.issparse(train.X) else train.X))
oc = VAE(RVmeta(train.n_vars, "zinb", name="rna"),
         encoder=NetConf((64,)), decoder=NetConf((64,)))
oc.fit(Xs, epochs=4, batch_size=128, device_cache=True,
       device_dtype="int16",                      # exact for counts
       # force a budget of 8 batch-sized chunks (< the int16 dataset) so
       # the out-of-core machinery engages on this tiny demo
       hbm_budget_bytes=8 * 128 * 2 * Xs.shape[1],
       verbose=True)
# Serving is size-unbounded too: predict/predict_mean/compute_llk chunk
# automatically when the dataset exceeds the device budget.
