"""Cross-dataset tutorial (reference ``tutorials/cross_datasets.py``,
``sisua/cross_analyze.py``).

Train on one cohort, evaluate the posterior on another: the core
generalization test of the SISUA paper (8k ↔ ecc PBMC). Offline we stand
in two synthetic cohorts drawn from different seeds (same gene/protein
panel — the real cross loaders harmonize gene sets the same way).

  JAX_PLATFORMS=cpu python tutorials/cross_datasets.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sisua_tpu.data import OMIC, generate_synthetic
from sisua_tpu.models import SISUA, RVmeta

# --- 1. two cohorts over the SAME panel ----------------------------------------
ds_a = generate_synthetic(n_cells=2000, n_genes=120, n_proteins=8,
                          n_celltypes=4, seed=1, name="cohortA")
ds_b = generate_synthetic(n_cells=1000, n_genes=120, n_proteins=8,
                          n_celltypes=4, seed=2, name="cohortB")
# with real data: ds_a = get_dataset('8kly'); ds_b = get_dataset('eccly')

# --- 2. train on cohort A --------------------------------------------------------
model = SISUA(outputs=[RVmeta(ds_a.n_vars, "zinb", name="rna"),
                       RVmeta(ds_a.get_dim(OMIC.proteomic), "nb",
                              name="adt")],
              latents=RVmeta(10, "diag", name="latents"))
train, test_a = ds_a.split(0.8)
model.fit(train, valid=test_a, epochs=10, batch_size=64,
          labels_percent=0.5, verbose=True)

# --- 3. evaluate on both: in-cohort vs cross-cohort ------------------------------
for tag, test in (("in-cohort (A)", test_a), ("cross-cohort (B)", ds_b)):
  post = model.create_posterior(test)
  imp = post.cal_imputation_scores()
  f1 = post.cal_protein_classification()
  print(f"{tag:18s} imputation_med={imp['imputation_med']:.3f} "
        f"F1={f1.get('f1_F1macro', float('nan')):.3f}")
