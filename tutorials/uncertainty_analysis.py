"""Uncertainty analysis tutorial (reference
``tutorials/uncertainty_analysis.py``).

Everything a VAE returns is a DISTRIBUTION, not a point estimate. This
tutorial surfaces that: MC posterior sampling (`sample_shape`), per-gene
imputation uncertainty, the 4-way corrupted/original log-likelihood, and
the importance-sampled marginal LLK.

  JAX_PLATFORMS=cpu python tutorials/uncertainty_analysis.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sisua_tpu.data import get_dataset
from sisua_tpu.interpolation import linear
from sisua_tpu.models import SCVI, RVmeta

SAMPLE_SHAPE = 10

# --- 1. train with KL warm-up (uncertainty-calibrated posterior) ----------------
sco = get_dataset("synthetic")
train, test = sco.split(0.8)
model = SCVI(outputs=RVmeta(sco.n_vars, "zinbd", name="rna"),
             latents=RVmeta(10, "diag", name="latents"),
             beta=linear(vmin=0.0, vmax=1.0, norm=20))
model.fit(train, valid=test, epochs=15, batch_size=64, mc_samples=2,
          verbose=True)

# --- 2. MC posterior predictive ---------------------------------------------------
pX, qZ = model.predict(test, sample_shape=(SAMPLE_SHAPE,), batch_size=128)
dist = pX[0] if isinstance(pX, (list, tuple)) else pX
means = np.asarray(dist.mean())               # (S, n_cells, n_genes)
per_gene_std = means.std(axis=0)              # spread across posterior draws
print("posterior-mean shape:", means.shape)
print("mean per-gene imputation std:", float(per_gene_std.mean()))

# latent uncertainty straight from the variational posterior
q = qZ[0] if isinstance(qZ, (list, tuple)) else qZ
print("mean latent stddev:", float(np.asarray(q.stddev()).mean()))

# --- 3. the Posterior's uncertainty metrics ----------------------------------------
post = model.create_posterior(test, sample_shape=SAMPLE_SHAPE)
llk = post.cal_llk()          # 4-way: {imp,rec} × {original,corrupted}
for k, v in sorted(llk.items()):
  print(f"  {k}: {v:.2f}")
mllk = post.cal_marginal_llk(sample_shape=50)
print("importance-sampled marginal LLK:", {k: round(v, 2)
                                           for k, v in mllk.items()})

# --- 4. densest uncertainty view: imputed vs observed scatter ----------------------
post.plot_imputation_scatter().save_figures("/tmp/tutorial_uncertainty")
print("figures in /tmp/tutorial_uncertainty")
