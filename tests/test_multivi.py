"""MULTIVI — joint RNA+ATAC VAE (scvi-tools surface; no reference
equivalent — the reference models ATAC only via SCALE and never jointly).

Contract pinned here:
  * training decreases the loss on paired multiome data and reports the
    Jeffreys ``modality_penalty`` metric;
  * accessibility estimates recover the simulator's true per-celltype
    open-region structure better than chance (cross-modal latent works);
  * mosaic data: all-zero modality rows gate that modality's likelihood
    (loss is finite, missing-modality cells' posterior = the observed
    expert) and training still converges;
  * save → load round-trips predictions bit-exactly.
"""

import numpy as np
import pytest

from sisua_tpu.data import generate_multiome
from sisua_tpu.models import MULTIVI, NetConf, RVmeta, get_model, load_model

NETS = dict(encoder=(NetConf((32, 32), name="encoder_rna"),
                     NetConf((32, 32), name="encoder_atac")),
            decoder=(NetConf((32, 32), name="decoder_rna"),
                     NetConf((32, 32), name="decoder_atac")))


def _model(G, R, seed=0, **kw):
  return MULTIVI([RVmeta(G, "nbd", name="transcriptomic"),
                  RVmeta(R, "bernoulli", name="atac")],
                 latents=RVmeta(12, "diag", name="latents"),
                 seed=seed, **{**NETS, **kw})


@pytest.fixture(scope="module")
def multiome():
  return generate_multiome(n_cells=1200, n_genes=120, n_regions=160, seed=0)


def test_multivi_trains_and_penalty_reported(multiome):
  m = _model(120, 160, seed=0)
  m.fit(multiome, epochs=8, batch_size=128, valid_freq=0)
  losses = m.history["loss"]
  assert losses[-1] < losses[0], losses
  assert "modality_penalty" in m.history
  assert np.isfinite(losses).all()


def test_multivi_registry_roundtrip():
  assert get_model("multivi") is MULTIVI


def test_multivi_accessibility_recovers_structure(multiome):
  m = _model(120, 160, seed=1)
  m.fit(multiome, epochs=15, batch_size=128, valid_freq=0)
  est = m.get_accessibility_estimates(multiome)
  assert est.shape == (multiome.n_obs, 160)
  assert np.isfinite(est).all() and (est >= 0).all() and (est <= 1).all()
  # denoised estimate should correlate with the observed binarization
  # substantially better than chance on held-in data
  A = (multiome.numpy("atac") > 0).astype(np.float64)
  r = np.corrcoef(est.ravel(), A.ravel())[0, 1]
  assert r > 0.3, r


def test_multivi_mosaic_gating():
  sco = generate_multiome(n_cells=1000, n_genes=100, n_regions=140,
                          unpaired_frac=0.4, seed=2)
  m = _model(100, 140, seed=2)
  m.fit(sco, epochs=8, batch_size=100, valid_freq=0)
  assert np.isfinite(m.history["loss"]).all()
  assert m.history["loss"][-1] < m.history["loss"][0]
  # the joint posterior of an ATAC-only cell must equal the ATAC expert:
  # zeroing the (already all-zero) RNA slice changes nothing, while for a
  # paired cell it must change the posterior
  X = sco.numpy("transcriptomic")
  A = sco.numpy("atac")
  rna_zero = np.where(np.asarray(X).sum(1) == 0)[0]
  paired = np.where((np.asarray(X).sum(1) > 0) & (np.asarray(A).sum(1) > 0))[0]
  assert len(rna_zero) > 10 and len(paired) > 10
  take = np.concatenate([rna_zero[:8], paired[:8]])
  x = np.asarray(X)[take]
  a = np.asarray(A)[take]
  qz = m.encode(np.concatenate([x, a], axis=1))
  qz0 = m.encode(np.concatenate([np.zeros_like(x), a], axis=1))
  z, z0 = np.asarray(qz[0].mean()), np.asarray(qz0[0].mean())
  np.testing.assert_allclose(z[:8], z0[:8], atol=1e-5)  # ATAC-only rows
  assert np.abs(z[8:] - z0[8:]).max() > 1e-3            # paired rows


def test_multivi_library_kl_gated_and_jeffreys_normalized():
  """ADVICE r4: (a) the RNA-encoded library latent must not charge KL for
  ATAC-only cells (scvi-tools restricts library inference/KL to
  RNA-observed cells); (b) the Jeffreys penalty is normalized by the
  PAIRED-cell count, so appending unpaired cells to a batch must not
  dilute the alignment pressure on the paired ones."""
  import jax
  import jax.numpy as jnp
  sco = generate_multiome(n_cells=400, n_genes=60, n_regions=80, seed=5)
  m = _model(60, 80, seed=5)
  m._ensure_initialized()
  state = m.state
  X = np.asarray(sco.numpy("transcriptomic"))[:32].astype(np.float32)
  A = np.asarray(sco.numpy("atac"))[:32].astype(np.float32)
  # make every row observed in both modalities
  X = X + (X.sum(1, keepdims=True) == 0)
  A = A + (A.sum(1, keepdims=True) == 0)
  key = jax.random.PRNGKey(0)

  def metrics_of(x, a):
    batch = {"inputs": [jnp.asarray(x), jnp.asarray(a)]}
    _, (mets, _, _) = m._loss(state.params, state.batch_stats, batch, key,
                              1.0, training=False,
                              aux_params=state.aux_params)
    return {k: float(v) for k, v in mets.items()}

  paired = metrics_of(X, A)
  assert paired["klqp_z1"] > 1e-6, paired
  # all-ATAC batch: library KL fully gated off
  atac_only = metrics_of(np.zeros_like(X), A)
  assert abs(atac_only["klqp_z1"]) < 1e-6, atac_only
  # half-paired batch: penalty equals the all-paired batch's (per-paired-
  # cell mean), not half of it
  mixed = metrics_of(np.concatenate([X, np.zeros_like(X)]),
                     np.concatenate([A, A]))
  np.testing.assert_allclose(mixed["modality_penalty"],
                             paired["modality_penalty"], rtol=1e-4)
  # and the library KL metric (a batch mean) halves, exactly
  np.testing.assert_allclose(mixed["klqp_z1"], 0.5 * paired["klqp_z1"],
                             rtol=1e-4)


def test_multivi_predict_merges_per_gene_dispersion(multiome):
  """Multi-batch predict must keep batch-invariant (1, D) parameter rows
  (MULTIVI's single per-gene dispersion) as ONE row — the old tree-concat
  stacked k identical copies into a phantom (k, D) leaf whose broadcast
  against the (N, D) mean raised (found by the multiome zoo sweep)."""
  m = _model(120, 160, seed=4)
  m.fit(multiome, epochs=1, batch_size=128, valid_freq=0)
  n = multiome.n_obs  # 1200 → 5 batches of 256
  for kwargs in ({}, {"device_cache": True}):
    pX, qZ = m.predict(multiome, batch_size=256, **kwargs)
    mean = np.asarray(pX[0].mean())
    assert mean.shape == (n, 120), (kwargs, mean.shape)
    disp = np.asarray(pX[0].base.disp)
    assert disp.shape == (1, 120), (kwargs, disp.shape)
    z = np.asarray(qZ[0].mean())
    assert z.shape[0] == n, (kwargs, z.shape)
  # MC sample dims: constants stay (1, D), means carry (S, N, D)
  pX, _ = m.predict(multiome, batch_size=256, sample_shape=3)
  mean = np.asarray(pX[0].mean())
  assert mean.shape == (3, n, 120), mean.shape


def test_multivi_save_load_roundtrip(tmp_path, multiome):
  m = _model(120, 160, seed=3)
  m.fit(multiome, epochs=2, batch_size=128, valid_freq=0)
  path = str(tmp_path / "multivi_ckpt")
  m.save_weights(path)
  m2 = load_model(path)
  assert isinstance(m2, MULTIVI)
  x = np.concatenate([np.asarray(multiome.numpy("transcriptomic"))[:64],
                      np.asarray(multiome.numpy("atac"))[:64]], axis=1)
  za = np.asarray(m.encode(x)[0].mean())
  zb = np.asarray(m2.encode(x)[0].mean())
  np.testing.assert_allclose(za, zb, atol=1e-6)
