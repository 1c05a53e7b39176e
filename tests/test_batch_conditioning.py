"""scVI-style batch-covariate conditioning (n_batch > 0): the batch one-hot
from obs[batch_key] rides the data pipeline as an extra source and enters
both encoder and decoder — scvi-tools semantics, beyond the reference."""

import numpy as np
import pytest

from sisua_tpu.data import generate_citeseq
from sisua_tpu.models import SCVI, VAE, RVmeta, NetConf, load_model


@pytest.fixture(scope="module")
def batchy():
  sco = generate_citeseq(n_cells=900, n_genes=80, n_proteins=6,
                         n_batches=3, batch_strength=0.4, seed=7)
  assert len(set(sco.obs["batch"])) == 3
  return sco


def test_scvi_batch_conditioning_trains(batchy):
  m = SCVI(RVmeta(batchy.n_vars, "zinbd", name="rna"), n_batch=3, seed=1)
  assert m.n_batch == 3
  m.fit(batchy, epochs=3, batch_size=128, valid_freq=0, patience=0)
  losses = m.history["loss"]
  assert np.isfinite(losses).all() and losses[-1] < losses[0]
  # the decoder's first kernel consumes latent + batch one-hot
  import jax
  flat = {"/".join(str(p) for p in path): leaf for path, leaf in
          jax.tree_util.tree_leaves_with_path(m.params)}
  dec_kernels = {k: v for k, v in flat.items()
                 if "decoder0" in k and k.endswith("'kernel']")}
  first = min(dec_kernels.items())[1]
  assert first.shape[0] == 10 + 3  # latent_dim + n_batch


@pytest.mark.slow
def test_batch_conditioning_inference_paths(batchy, tmp_path):
  m = SCVI(RVmeta(batchy.n_vars, "zinbd", name="rna"), n_batch=3, seed=1)
  m.fit(batchy, epochs=2, batch_size=128, valid_freq=0, patience=0)
  # predict + predict_mean consume the one-hot through the feeder
  pX, qZ = m.predict(batchy, sample_shape=(2,), batch_size=256)
  (imp, *_), (lat, *_) = m.predict_mean(batchy, sample_shape=(2,))
  assert imp.shape == (900, 80) and lat.shape[0] == 900
  # raw-array input (no batch column) falls back to the uniform batch prior
  x = np.asarray(batchy.X.todense(), np.float32)
  qz = m.encode(x)
  assert np.isfinite(np.asarray(qz[0].mean())).all()
  # save/load round-trips n_batch + batch_key
  path = str(tmp_path / "ckpt")
  m.save_weights(path)
  m2 = load_model(path)
  assert m2.n_batch == 3 and m2.batch_key == "batch"
  (imp2, *_), _ = m2.predict_mean(batchy, sample_shape=(2,))
  assert imp2.shape == imp.shape


def test_vae_generic_batch_conditioning(batchy, small_nets):
  """The generic engine (every family) accepts n_batch."""
  m = VAE(RVmeta(batchy.n_vars, "zinb", name="rna"), n_batch=3, seed=2,
          **small_nets)
  m.fit(batchy, epochs=2, batch_size=128, valid_freq=0, patience=0,
        device_cache=True, metrics_interval=1)
  assert np.isfinite(m.history["loss"]).all()


def test_missing_batch_column_warns():
  from sisua_tpu.data import generate_synthetic
  sco = generate_synthetic(n_cells=300, n_genes=40, n_proteins=4, seed=0)
  m = VAE(RVmeta(40, "zinb", name="rna"), n_batch=2, seed=0,
          encoder=NetConf((16,)), decoder=NetConf((16,)))
  with pytest.warns(UserWarning, match="assuming one batch"):
    m.fit(sco, epochs=1, batch_size=128, valid_freq=0, patience=0)


@pytest.mark.slow
def test_totalvi_batch_conditioning(batchy):
  """TotalVI's concat(rna, adt) input also accepts the batch one-hot."""
  from sisua_tpu.models import TotalVI
  m = TotalVI([RVmeta(batchy.n_vars, "nbd", name="rna"),
               RVmeta(batchy.get_dim("proteomic"), "nbd", name="adt")],
              n_batch=3, seed=5)
  m.fit(batchy, epochs=2, batch_size=128, valid_freq=0, patience=0)
  losses = m.history["loss"]
  assert np.isfinite(losses).all() and losses[-1] < losses[0]
  (imp, *_), _ = m.predict_mean(batchy, sample_shape=(2,))
  assert imp.shape == (batchy.n_obs, batchy.n_vars)


def test_batch_codes_stable_across_subsets(batchy):
  """Inference data carrying a SUBSET of training batch levels must get the
  training codes, not a remapping of its own sorted uniques (review
  finding: wrong one-hots silently corrupt batch-corrected outputs)."""
  m = VAE(RVmeta(batchy.n_vars, "zinb", name="rna"), n_batch=3, seed=1)
  full = m._batch_onehot(batchy)                  # defines the mapping
  cats = list(m.metadata["batch_categories"])
  assert len(cats) == 3
  # a split holding only the LAST level must one-hot to that level's code
  col = np.asarray(batchy.obs["batch"]).astype(str)
  last = cats[-1]
  sub = batchy[col == last]
  oh = m._batch_onehot(sub)
  assert oh.shape[1] == 3
  assert np.all(oh[:, cats.index(last)] == 1.0)
  np.testing.assert_array_equal(oh.sum(0)[:2], [0.0, 0.0])
  # and the mapping round-trips through save/load metadata
  assert m.metadata["batch_categories"] == cats


def test_batch_codes_reject_overflow(batchy):
  m = VAE(RVmeta(batchy.n_vars, "zinb", name="rna"), n_batch=2, seed=1)
  with pytest.raises(AssertionError):
    m._batch_onehot(batchy)  # 3 levels > n_batch=2
