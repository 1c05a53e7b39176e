"""Basics tutorial: load → train → analyze (reference tutorials/basics.py).

Runs offline on the synthetic dataset; swap 'synthetic' for '8kly' /
'cortex' etc. when their caches are available.

  JAX_PLATFORMS=cpu python tutorials/basics.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sisua_tpu.data import OMIC, get_dataset
from sisua_tpu.models import SISUA, VAE, NetConf, RVmeta

# --- 1. dataset ------------------------------------------------------------
sco = get_dataset("synthetic")
print(sco)
train, test = sco.split(train_percent=0.8)

# --- 2. an unsupervised VAE -------------------------------------------------
vae = VAE(outputs=RVmeta(sco.n_vars, "zinb", name="rna"),
          latents=RVmeta(10, "diag", name="latents"),
          encoder=NetConf((64, 64), batchnorm=True, input_dropout=0.3))
vae.fit(train, valid=test, epochs=15, batch_size=64, verbose=True)

# --- 3. a semi-supervised SISUA with 10% protein labels ---------------------
sisua = SISUA(outputs=[RVmeta(sco.n_vars, "zinb", name="rna"),
                       RVmeta(sco.get_dim(OMIC.proteomic), "nb", name="adt")],
              latents=RVmeta(10, "diag", name="latents"))
sisua.fit(train, valid=test, epochs=15, batch_size=64,
          labels_percent=0.1, verbose=True)

# --- 4. posterior analysis ---------------------------------------------------
for model in (vae, sisua):
  post = model.create_posterior(test)
  print(f"\n=== {model.id} ===")
  print("imputation:", post.cal_imputation_scores())
  print("marker spearman:", post.cal_spearman().get("spearman_mean"))
  print("protein F1:", post.cal_protein_classification().get("f1_F1macro"))
  post.plot_all().save_figures(f"/tmp/tutorial_{model.id}")

# --- 5. compare --------------------------------------------------------------
from sisua_tpu.analysis import ResultsSheet

rs = ResultsSheet(vae.create_posterior(test), sisua.create_posterior(test))
print(rs.get_scores().filter(like="imputation"))
rs.plot_all().save_figures("/tmp/tutorial_compare")
