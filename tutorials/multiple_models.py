"""Multi-model comparison tutorial (reference
``tutorials/pbmc8k_cellvdj_multiple_models.py``).

Train several model families on the same data and compare them with
``ResultsSheet`` — score tables plus side-by-side figures. On TPU the
same comparison can also run as a vmapped on-chip ensemble
(``train/ensemble.py``) when the architectures are identical.

  JAX_PLATFORMS=cpu python tutorials/multiple_models.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sisua_tpu.analysis import ResultsSheet
from sisua_tpu.data import OMIC, get_dataset
from sisua_tpu.models import RVmeta, get_model

EPOCHS = 8
SAVE = "/tmp/tutorial_multi"

sco = get_dataset("synthetic")  # real runs: '8kly', 'vdj4', …
train, test = sco.split(0.8)
rna = RVmeta(sco.n_vars, "zinb", name="rna")
adt = RVmeta(sco.get_dim(OMIC.proteomic), "nb", name="adt")

# --- 1. train the families -------------------------------------------------------
posteriors = []
for name in ("vae", "dca", "scvi", "sisua"):
  cls = get_model(name)
  if cls.mask_outputs:  # semi-supervised family → labeled protein head
    model = cls(outputs=[rna, adt], latents=RVmeta(10, "diag",
                                                   name="latents"))
    model.fit(train, valid=test, epochs=EPOCHS, batch_size=64,
              labels_percent=0.5)
  else:
    model = cls(outputs=RVmeta(sco.n_vars,
                               "zinbd" if name == "scvi" else "zinb",
                               name="rna"),
                latents=RVmeta(10, "diag", name="latents"))
    model.fit(train, valid=test, epochs=EPOCHS, batch_size=64)
  print(f"{name}: final loss {model.history['loss'][-1]:.1f}")
  posteriors.append(model.create_posterior(test))

# --- 2. one sheet, all models ------------------------------------------------------
sheet = ResultsSheet(*posteriors, verbose=True)
print(sheet.get_scores().filter(regex="imputation|spearman_mean").round(3))
sheet.plot_all().save_figures(SAVE)
print("figures in", SAVE)
