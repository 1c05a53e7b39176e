"""QC & annotation tutorial: AUTOZI → SOLO → CellAssign.

The pre-analysis pipeline scvi-tools users run before any modeling verdict:
which genes are really zero-inflated (AUTOZI), which barcodes are doublets
(SOLO), and what cell type each remaining cell is (CellAssign) — all three
new in this framework (the reference hard-codes likelihood families, takes
upstream doublet filtering as given, and ships marker tables it only uses
for correlation scoring; see MIGRATING.md "Models").

Runs offline on the synthetic dataset:

  JAX_PLATFORMS=cpu python tutorials/qc_annotation.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from sisua_tpu.data import OMIC, get_dataset
from sisua_tpu.models import AUTOZI, SCVI, SOLO, CellAssign, NetConf, RVmeta

sco = get_dataset("synthetic")
x = sco.numpy()
G = sco.n_vars
print(sco)

# --- 1. AUTOZI: is each gene's excess-zero signal real zero inflation? ------
autozi = AUTOZI(RVmeta(G, "zinbd", name="rna"),
                encoder=NetConf((64,)), decoder=NetConf((64,)), seed=0)
autozi.fit(sco, epochs=20, batch_size=64, verbose=False)
q_zi = autozi.get_zi_probabilities()
print(f"\n[autozi] P(zero-inflated): min {q_zi.min():.3f} "
      f"median {np.median(q_zi):.3f} max {q_zi.max():.3f}")
print(f"[autozi] genes leaning ZI (q > 0.5): {(q_zi > 0.5).sum()}/{G}")
# q_zi feeds the likelihood choice: 'zinb' heads for ZI genes, 'nb' else.

# --- 2. SOLO: doublet scores from an SCVI latent ----------------------------
scvi = SCVI(RVmeta(G, "zinbd", name="rna"),
            encoder=NetConf((64,)), decoder=NetConf((64,)), seed=0)
scvi.fit(x, epochs=15, batch_size=64, verbose=False)
solo = SOLO.from_scvi_model(scvi, seed=0).fit(x, epochs=25, verbose=False)
p_doublet = solo.predict_doublet_proba(sco)
keep = p_doublet < 0.5
print(f"\n[solo] doublet probability: median {np.median(p_doublet):.3f}; "
      f"keeping {keep.sum()}/{len(keep)} cells at the 0.5 call")
# sanity: synthetic pair-sums must score high
pair_sum = x[:50] + x[50:100]
print(f"[solo] simulated doublets score {solo.predict_doublet_proba(pair_sum).mean():.3f} "
      f"vs observed {p_doublet.mean():.3f}")

# --- 3. CellAssign: marker-table annotation of the kept cells ---------------
# Build a marker table from the data itself (in practice: a curated panel
# like the reference's MARKER_GENES, sisua_tpu.data.const). Here: top
# differential genes per true type on a held-out slice.
y = sco.numpy(OMIC.celltype)
types = np.argmax(y, -1)
C = y.shape[1]
half = x.shape[0] // 2
markers_per_type = 5
rho = np.zeros((0,), np.float32)
marker_idx = []
for c in range(C):
  mu_c = x[:half][types[:half] == c].mean(0)
  mu_rest = x[:half][types[:half] != c].mean(0)
  fold = (mu_c + 1e-3) / (mu_rest + 1e-3)
  marker_idx.append(np.argsort(-fold)[:markers_per_type])
panel = np.unique(np.concatenate(marker_idx))
rho = np.zeros((len(panel), C), np.float32)
for c, idx in enumerate(marker_idx):
  rho[np.searchsorted(panel, idx), c] = 1.0

ca = CellAssign(rho, seed=0)
# size factors from the FULL transcriptome (panel totals are contaminated
# by the markers themselves — see models/cellassign.py)
sf = x.sum(-1) / x.sum(-1).mean()
eval_cells = keep & (np.arange(x.shape[0]) >= half)
ca.fit(x[:, panel][keep & (np.arange(x.shape[0]) < half)],
       size_factors=sf[keep & (np.arange(x.shape[0]) < half)],
       epochs=80, batch_size=256)
gamma = ca.predict(x[:, panel][eval_cells], size_factors=sf[eval_cells])
acc = (gamma.argmax(-1) == types[eval_cells]).mean()
print(f"\n[cellassign] held-out annotation accuracy from a "
      f"{len(panel)}-gene panel: {acc:.3f}")
print("[cellassign] fitted marker log fold-changes (mean over markers): "
      f"{ca.get_fold_changes()[rho > 0].mean():.2f}")
