"""Model zoo: fit/predict smoke per family — loss decreases, output
distribution types pinned, semi-supervised masking wired, SCVI library
latent present (mirrors reference tests/test_singlecell_models.py)."""

import numpy as np
import pytest

import sisua_tpu.dist as D
from sisua_tpu.data import OMIC
from sisua_tpu.models import (FVAE, MISA, SCALAR, SCALE, SCVI, SISUA, VAE,
                              DeepCountAutoencoder, NetConf, RVmeta, SCScope,
                              SemiFVAE, get_all_models, get_model,
                              SingleCellModel)

EPOCHS = 5


def _loss_mostly_decreasing(loss, frac=0.6):
  loss = loss[1:]
  dec = [i > j for i, j in zip(loss, loss[1:])]
  assert sum(dec) >= frac * len(dec) - 1, loss


def test_registry():
  for m in get_all_models():
    assert issubclass(m, SingleCellModel)
  assert get_model("dca").__name__ == "DeepCountAutoencoder"
  assert get_model("scvi").__name__ == "SCVI"
  assert get_model("VAE") is VAE
  with pytest.raises(ValueError):
    get_model("nope")


@pytest.mark.smoke
def test_vae_fit_predict(splits, small_nets):
  train, test = splits
  vae = VAE(RVmeta(train.n_vars, "zinb", name="rna"),
            latents=RVmeta(6, "diag", name="latents"), **small_nets)
  assert vae.id == "vae" and not vae.is_semi_supervised
  vae.fit(train, valid=test, epochs=EPOCHS, batch_size=64)
  _loss_mostly_decreasing(vae.history["loss"])
  assert "val_loss" in vae.history and "klqp_z" in vae.history
  pX, qZ = vae.predict(test)
  assert isinstance(qZ, D.MultivariateNormalDiag)
  assert isinstance(pX.distribution, D.ZeroInflated)
  assert pX.batch_shape == (test.n_obs,)
  # MCMC sample shape
  pX2, _ = vae.predict(test, sample_shape=(3,), batch_size=100)
  assert pX2.batch_shape == (3, test.n_obs)
  mll = vae.marginal_log_prob(test[np.arange(32)], sample_shape=10)
  assert mll.shape == (32,) and np.isfinite(mll).all()


def test_dca_deterministic_latent(splits, small_nets):
  train, _ = splits
  dca = DeepCountAutoencoder(RVmeta(train.n_vars, "zinb", name="rna"),
                             latent_dim=6, **small_nets)
  assert dca.id == "dca"
  assert dca.latents[0].is_deterministic
  dca.fit(train, epochs=3, batch_size=64)
  assert abs(dca.history["klqp_z"][-1]) < 1e-6
  _, qZ = dca.predict(train)
  assert isinstance(qZ, D.VectorDeterministic)


def test_dca_mse(splits, small_nets):
  train, _ = splits
  dca = DeepCountAutoencoder(RVmeta(train.n_vars, "mse", name="rna"),
                             latent_dim=6, **small_nets)
  dca.fit(train, epochs=3, batch_size=64)
  pX, _ = dca.predict(train)
  assert isinstance(pX, D.VectorDeterministic)


def test_scscope_recurrent_imputation(splits, small_nets):
  train, test = splits
  m = SCScope(RVmeta(train.n_vars, "nzmse", name="rna"), latent_dim=6,
              t_steps=3, **small_nets)
  assert m.id == "scs" and m.t_steps == 3
  assert m.latents[0].is_deterministic
  m.fit(train, epochs=EPOCHS, batch_size=64)
  _loss_mostly_decreasing(m.history["loss"])
  # intermediate recurrent cycles contribute their own reconstruction term
  assert "llk_cycles" in m.history
  # deterministic latent → no KL (like DCA)
  assert abs(m.history["klqp_z"][-1]) < 1e-6
  pX, qZ = m.predict(test)
  assert isinstance(pX, D.NonzeroMaskedDeterministic)
  assert isinstance(qZ, D.VectorDeterministic)
  mu = np.asarray(pX.mean())
  assert mu.shape == (test.n_obs, test.n_vars)
  assert np.isfinite(mu).all() and (mu >= 0).all()
  # unsupported heads are coerced to the paper objective
  m2 = SCScope(RVmeta(train.n_vars, "diag", name="rna"), latent_dim=4,
               t_steps=1, **small_nets)
  assert m2.outputs[0].posterior == "nzmse"


def test_sisua_semi_supervised(splits, small_nets):
  train, test = splits
  n_prot = train.get_dim(OMIC.proteomic)
  m = SISUA([RVmeta(train.n_vars, "zinb", name="rna"),
             RVmeta(n_prot, "nb", name="adt")], **small_nets)
  assert m.is_semi_supervised
  m.fit(train, valid=test, epochs=EPOCHS, batch_size=64, labels_percent=0.5)
  _loss_mostly_decreasing(m.history["loss"])
  assert "llk_x1" in m.history  # masked label term present
  pX, qZ = m.predict(test)
  assert len(pX) == 2
  with pytest.raises(AssertionError):
    SISUA(RVmeta(10, "zinb"))  # needs ≥2 outputs


@pytest.mark.slow
def test_misa_mixture_labels(splits, small_nets):
  train, _ = splits
  m = MISA([RVmeta(train.n_vars, "zinb", name="rna"),
            RVmeta(train.get_dim(OMIC.proteomic), "nbd", name="adt")],
           n_components=2, **small_nets)
  assert m.outputs[1].posterior == "mixnb"
  m.fit(train, epochs=2, batch_size=64)
  pX, _ = m.predict(train)
  assert isinstance(pX[1], D.MixtureSameFamily)


@pytest.mark.slow
def test_scvi_library_latent(splits):
  train, test = splits
  m = SCVI(RVmeta(train.n_vars, "zinbd", name="rna"),
           latents=RVmeta(6, "diag", name="latents"))
  assert m.uses_library
  m.fit(train, valid=test, epochs=EPOCHS, batch_size=64)
  _loss_mostly_decreasing(m.history["loss"])
  assert "klqp_z1" in m.history  # library KL
  pX, (qz, ql) = m.predict(test)
  assert ql.event_shape == (1,)
  assert isinstance(pX.distribution, D.ZeroInflated)
  # 'full' dispersion decodes in log space (NegativeBinomialLog carries
  # log μ / log θ natively; .loc/.disp derive the linear params lazily)
  assert isinstance(pX.distribution.count_distribution,
                    D.NegativeBinomialLog)
  assert np.isfinite(
      np.asarray(pX.distribution.count_distribution.disp)).all()
  with pytest.raises(AssertionError):
    SCVI(RVmeta(10, "zinb"))  # must be zinbd/nbd


def test_ldvae_linear_decoder_loadings(splits, small_nets, tmp_path):
  """LDVAE (LinearSCVI semantics, beyond-reference surface): identity
  decoder stack, gene-level dispersion by default, and per-gene loadings
  recoverable as the MeanScale kernel's z-rows."""
  import jax
  from sisua_tpu.models import LDVAE, load_model
  train, test = splits
  m = LDVAE(RVmeta(train.n_vars, "nbd", name="rna"),
            latents=RVmeta(6, "diag", True, "latents"),
            encoder=small_nets["encoder"],
            decoder=small_nets["decoder"])  # must be ignored: linear family
  assert m.id == "ldvae" and get_model("ldvae") is LDVAE
  assert m.decoder[0].units == ()            # identity decoder forced
  assert m.dispersion == "single"            # gene-level default
  m.fit(train, epochs=3, batch_size=64)
  _loss_mostly_decreasing(m.history["loss"])
  # the decoder stack contributes no parameters — px_scale is THE linear map
  dec_leaves = [leaf for k, sub in m.params.items() if k.startswith("decoder")
                for leaf in jax.tree_util.tree_leaves(sub)]
  assert not dec_leaves
  L = np.asarray(m.get_loadings())
  assert L.shape == (train.n_vars, 6) and np.isfinite(L).all()
  # named loadings via recorded metadata
  m.set_metadata(train)
  Ldf = m.get_loadings()
  assert list(Ldf.index) == list(np.asarray(train.get_var_names(), str))
  # checkpoint roundtrip reconstructs the linear family (decoder spec in the
  # manifest is overridden back to identity by the ctor)
  path = str(tmp_path / "ldvae")
  m.save_weights(path)
  loaded = load_model(path)
  assert type(loaded) is LDVAE and loaded.decoder[0].units == ()
  np.testing.assert_allclose(loaded.get_loadings().values, Ldf.values,
                             atol=1e-6)


@pytest.mark.slow
def test_scvi_nbd_single_dispersion(splits):
  train, _ = splits
  m = SCVI(RVmeta(train.n_vars, "nbd", name="rna",
                  kwargs={"dispersion": "single"}))
  m.fit(train, epochs=2, batch_size=64)
  pX, _ = m.predict(train)
  # single dispersion decodes in log-mean space (NegativeBinomialDispLog)
  assert isinstance(pX.distribution, D.NegativeBinomialDispLog)


@pytest.mark.slow
def test_scale_mixture_latent(splits, small_nets):
  train, _ = splits
  m = SCALE(RVmeta(train.n_vars, "zinb", name="rna"), n_components=3,
            **small_nets)
  assert m.latents[0].posterior == "mixgaus" and not m.analytic
  m.fit(train, epochs=3, batch_size=64)
  _, qZ = m.predict(train)
  assert isinstance(qZ, D.MixtureSameFamily)


def test_scalar_semi(splits, small_nets):
  train, _ = splits
  m = SCALAR([RVmeta(train.n_vars, "zinb", name="rna"),
              RVmeta(train.get_dim(OMIC.proteomic), "nb", name="adt")],
             n_components=3, **small_nets)
  assert m.is_semi_supervised
  m.fit(train, epochs=2, batch_size=64, labels_percent=0.5)


@pytest.mark.slow
def test_fvae_tc_discriminator(splits, small_nets):
  train, _ = splits
  m = FVAE(RVmeta(train.n_vars, "zinb", name="rna"), gamma=2.0, **small_nets)
  m.fit(train, epochs=3, batch_size=64)
  assert "tc" in m.history and "disc_loss" in m.history
  assert np.isfinite(m.history["disc_loss"]).all()


def test_semifvae(splits, small_nets):
  train, _ = splits
  m = SemiFVAE([RVmeta(train.n_vars, "zinb", name="rna"),
                RVmeta(train.get_dim(OMIC.proteomic), "nb", name="adt")],
               **small_nets)
  m.fit(train, epochs=2, batch_size=64, labels_percent=0.5)
  assert m.is_semi_supervised


def test_kl_warmup_schedule(splits, small_nets):
  from sisua_tpu.interpolation import linear
  train, _ = splits
  m = VAE(RVmeta(train.n_vars, "zinb", name="rna"),
          beta=linear(vmin=0.0, vmax=1.0, norm=20), **small_nets)
  m.fit(train, epochs=3, batch_size=64)
  betas = m.history["beta"]
  assert betas[0] < betas[-1] <= 1.0


@pytest.mark.slow
def test_optimizer_registry(splits, small_nets):
  """Every registered optimizer trains finitely (incl. the memory-light
  adafactor/lion options for wide gene heads)."""
  train, _ = splits
  for opt, lr in (("adafactor", 1e-3), ("lion", 3e-4), ("adamax", 1e-3)):
    m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), **small_nets)
    m.fit(train, epochs=4, batch_size=64, optimizer=opt, learning_rate=lr)
    loss = np.asarray(m.history["loss"])
    assert np.isfinite(loss).all() and loss[-1] < loss[0], (opt, loss)


@pytest.mark.slow
def test_track_gradient_norms(splits, small_nets):
  """configs/base.yaml `track_gradient_norms` records per-epoch mean
  global grad-norm into history (finite, positive)."""
  train, _ = splits
  m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), **small_nets)
  m.fit(train, epochs=3, batch_size=64, track_gradient_norms=True)
  gn = np.asarray(m.history["grad_norm"])
  assert gn.shape == (3,) and np.isfinite(gn).all() and (gn > 0).all()
  # device-resident path tracks it too
  m2 = VAE(RVmeta(train.n_vars, "zinb", name="rna"), **small_nets)
  m2.fit(train, epochs=3, batch_size=64, track_gradient_norms=True,
         device_cache=True, metrics_interval=2)
  gn2 = np.asarray(m2.history["grad_norm"])
  assert gn2.shape == (3,) and np.isfinite(gn2).all() and (gn2 > 0).all()


@pytest.mark.slow
def test_device_dtype_compressed_cache(splits, small_nets):
  """device_dtype stores the HBM-resident dataset compressed (int16/bf16):
  training stays finite and lands near the float32 run; int16 refuses
  non-integer data instead of silently corrupting it."""
  train, _ = splits
  finals = {}
  for dd in ("float32", "int16", "bfloat16"):
    m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), seed=1, **small_nets)
    m.fit(train, epochs=4, batch_size=64, device_cache=True,
          device_dtype=dd)
    loss = np.asarray(m.history["loss"])
    assert np.isfinite(loss).all() and loss[-1] < loss[0], (dd, loss)
    finals[dd] = loss[-1]
  # counts <32768 are exact in int16 → same trajectory modulo PRNG use
  assert abs(finals["int16"] - finals["float32"]) < 0.05 * finals["float32"]
  assert abs(finals["bfloat16"] - finals["float32"]) \
      < 0.05 * finals["float32"]
  # non-integer data must be rejected for int16
  m = VAE(RVmeta(8, "mse", name="rna"), log_norm=False, **small_nets)
  bad = np.random.default_rng(0).uniform(0, 3, (128, 8)).astype(np.float32)
  with pytest.raises(ValueError, match="int16"):
    m.fit(bad, epochs=1, batch_size=32, device_cache=True,
          device_dtype="int16")


@pytest.mark.slow
def test_nan_seed_sweep(splits, small_nets):
  """Regression: training must stay finite across seeds (the feeder race
  produced ~30% NaN runs before the fix)."""
  train, test = splits
  for seed in (2, 3, 5):
    m = SISUA([RVmeta(train.n_vars, "zinb", name="rna"),
               RVmeta(train.get_dim(OMIC.proteomic), "nb", name="adt")],
              seed=seed, **small_nets)
    m.fit(train, valid=test, epochs=3, batch_size=64, labels_percent=0.5,
          patience=50)
    assert np.isfinite(m.history["loss"]).all()


def test_evaluate_method(splits, small_nets):
  train, test = splits
  m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), **small_nets)
  m.fit(train, epochs=2, batch_size=64)
  ev = m.evaluate(test)
  assert {"loss", "elbo", "llk_x", "klqp_z"} <= set(ev)
  assert np.isfinite(list(ev.values())).all()


@pytest.mark.slow
def test_predict_device_cached_matches_streamed(splits, small_nets):
  """device_cache=True runs all batches in one executable with one fetch;
  the deterministic pieces must match the streamed path exactly (latent
  posteriors always; output dists for DCA's deterministic latent), and the
  zero-padded final batch must be trimmed."""
  train, test = splits  # test size not divisible by 128 → padding path
  m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), **small_nets)
  m.fit(train, epochs=1, batch_size=64)
  _, zA = m.predict(test, batch_size=128)
  pB, zB = m.predict(test, batch_size=128, device_cache=True)
  np.testing.assert_allclose(np.asarray(zA.mean()), np.asarray(zB.mean()),
                             rtol=1e-5, atol=1e-5)
  assert np.asarray(pB.mean()).shape == (test.n_obs, train.n_vars)
  dca = DeepCountAutoencoder(RVmeta(train.n_vars, "nb", name="rna"),
                             **small_nets)
  dca.fit(train, epochs=1, batch_size=64)
  pA, _ = dca.predict(test, batch_size=128)
  pB, _ = dca.predict(test, batch_size=128, device_cache=True)
  np.testing.assert_allclose(np.asarray(pA.mean()), np.asarray(pB.mean()),
                             rtol=1e-5, atol=1e-5)
  # MC sample dims lead the batch axis, as in the streamed path
  pM, _ = dca.predict(test, sample_shape=3, batch_size=128,
                      device_cache=True)
  assert np.asarray(pM.mean()).shape == (3, test.n_obs, train.n_vars)


def test_posterior_device_cached(splits, small_nets):
  train, test = splits
  m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), **small_nets)
  m.fit(train, epochs=1, batch_size=64)
  post = m.create_posterior(test, sample_shape=2, device_cache=True)
  scores = post.cal_imputation_scores()
  assert all(np.isfinite(v) for v in scores.values())


def test_predict_mean(splits, small_nets):
  """On-device MC-averaged posterior means: (n, d) fetches only; latent
  means match the full predict path exactly."""
  train, test = splits
  m = SISUA([RVmeta(train.n_vars, "zinb", name="rna"),
             RVmeta(train.get_dim(OMIC.proteomic), "nb", name="adt")],
            **small_nets)
  m.fit(train, epochs=1, batch_size=64, labels_percent=0.5)
  xm, zm = m.predict_mean(test, sample_shape=3, batch_size=128)
  assert xm[0].shape == (test.n_obs, train.n_vars)
  assert xm[1].shape == (test.n_obs, train.get_dim(OMIC.proteomic))
  _, qZ = m.predict(test, batch_size=128)
  q0 = qZ[0] if isinstance(qZ, tuple) else qZ
  np.testing.assert_allclose(zm[0], np.asarray(q0.mean()),
                             rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_get_normalized_expression(splits, small_nets):
  """Rows are proportions (sum to 1); for SCVI it equals px_scale — the
  output mean divided by the sampled library exp(L)."""
  train, test = splits
  m = SCVI(RVmeta(train.n_vars, "zinbd", name="rna"),
           latents=RVmeta(6, "diag", name="latents"))
  m.fit(train, epochs=2, batch_size=64)
  scale = m.get_normalized_expression(test, sample_shape=(3,),
                                      batch_size=128)
  assert scale.shape == (test.n_obs, train.n_vars)
  assert np.isfinite(scale).all() and (scale >= 0).all()
  np.testing.assert_allclose(scale.sum(-1), 1.0, rtol=1e-4)
  # deterministic check without MC: row-normalized predict mean == scale
  import jax
  m._rng = jax.random.PRNGKey(7)
  scale0 = m.get_normalized_expression(test, batch_size=128)
  m._rng = jax.random.PRNGKey(7)
  (x_means, _) = m.predict_mean(test, batch_size=128)
  ref = x_means[0] / x_means[0].sum(-1, keepdims=True)
  np.testing.assert_allclose(scale0, ref, rtol=1e-5)


@pytest.mark.slow
def test_training_time_mc_samples(splits, small_nets):
  """fit(mc_samples=S): S reparameterized draws per example in the ELBO
  (the reference train config's sample_shape); works with analytic KL and
  with SCALE's MC-KL mixture posterior."""
  from sisua_tpu.models import SCALE
  train, _ = splits
  for cls in (VAE, SCALE):
    m = cls(RVmeta(train.n_vars, "zinb", name="rna"), **small_nets)
    m.fit(train, epochs=2, batch_size=64, mc_samples=3, valid_freq=0,
          patience=0)
    l = m.history["loss"]
    assert np.isfinite(l).all() and l[-1] < l[0]


@pytest.mark.slow
def test_rollback_to_stale_best_state(splits, small_nets):
  """Regression: the train step donates its input state, so the best-state
  snapshot must deep-copy buffers — rolling back to a best state more than
  one dispatch old used to touch donated (deleted) arrays. lr=0 makes the
  first epoch the permanent best; patience then forces a stale rollback."""
  train, _ = splits
  for kw in (dict(device_cache=True, metrics_interval=2), dict()):
    m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), **small_nets)
    m.fit(train, epochs=10, batch_size=64, learning_rate=0.0,
          valid_freq=0, patience=3, allow_rollback=True, **kw)
    pX, _ = m.predict(train.numpy()[:16])
    assert np.isfinite(np.asarray(pX.mean())).all()


def test_predict_mean_compressed_transfers(splits, small_nets):
  """Serving-path transfer compression: int16 upload (exact for counts) +
  bf16 fetch must match the float32 path within bf16 tolerance."""
  from sisua_tpu.models import VAE, RVmeta
  train, test = splits
  m = VAE(RVmeta(train.n_vars, "zinb", name="rna"), seed=3, **small_nets)
  m.fit(train, epochs=2, batch_size=128, valid_freq=0, patience=0)
  # pin the rng so both calls draw identical MC samples
  rng = m._rng
  x32, z32 = m.predict_mean(test, sample_shape=(4,), input_dtype=None)
  m._rng = rng
  xc, zc = m.predict_mean(test, sample_shape=(4,), input_dtype="auto",
                          fetch_dtype="bfloat16")
  assert x32[0].dtype == np.float32 and xc[0].dtype == np.float32
  # identical samples → only the bf16 fetch rounding differs (~0.4%)
  np.testing.assert_allclose(xc[0], x32[0], rtol=1e-2, atol=1e-2)
  np.testing.assert_allclose(zc[0], z32[0], rtol=1e-2, atol=1e-2)
  # int16 upload is refused for non-integral data
  import pytest as _pytest
  bad = test.copy()
  bad.X = bad.X.astype(np.float32) * 0.5
  with _pytest.raises(ValueError, match="integral"):
    m.predict_mean(bad, input_dtype="int16")


def test_next_key_thread_safe():
  """cross_analyze evaluates one model from a thread pool: concurrent
  _next_key calls must never return identical keys (review finding — the
  read-split-store was not atomic)."""
  import threading
  from sisua_tpu.models import VAE
  from sisua_tpu.rv import RVmeta
  m = VAE(RVmeta(8, "nb", name="rna"))
  keys, barrier = [], threading.Barrier(8)
  def worker():
    barrier.wait()
    import jax
    for _ in range(200):
      keys.append(tuple(
          np.asarray(jax.random.key_data(m._next_key())).tolist()))
  ts = [threading.Thread(target=worker) for _ in range(8)]
  [t.start() for t in ts]
  [t.join() for t in ts]
  assert len(set(keys)) == len(keys) == 1600


def test_mask_renorm_objective():
  """mask_renorm=True averages the label llk over LABELED examples only:
  the supervision term is invariant to labels_percent (default stays the
  reference's batch-mean reduction, which scales it by the labeled
  fraction). Pinned directly on elbo_terms with a fabricated forward."""
  import jax.numpy as jnp

  from sisua_tpu.models.module import VAEOutput
  from sisua_tpu.models.objective import elbo_terms

  B, G, P = 8, 4, 3
  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.poisson(2.0, (B, G)).astype(np.float32))
  y = jnp.asarray(rng.poisson(1.0, (B, P)).astype(np.float32))
  pX = D.Independent(D.Poisson(rate=jnp.ones((B, G)) * 2.0), 1)
  pY = D.Independent(D.Poisson(rate=jnp.ones((B, P))), 1)
  qZ = D.Independent(D.Normal(jnp.zeros((B, 2)), jnp.ones((B, 2))), 1)
  out = VAEOutput(outputs=(pX, pY), latents=(qZ,),
                  latent_samples=(jnp.zeros((B, 2)),), priors=(None,))
  mask = jnp.asarray([1, 0, 0, 0, 1, 0, 0, 0], jnp.float32)  # 2/8 labeled
  per_cell = pY.log_prob(y)

  llk_ref, _ = elbo_terms(out, [x, y], mask=mask, mask_outputs=True,
                          alpha=2.0)
  np.testing.assert_allclose(np.asarray(llk_ref["llk_x1"]),
                             np.asarray(2.0 * per_cell * mask), rtol=1e-6)

  llk_rn, _ = elbo_terms(out, [x, y], mask=mask, mask_outputs=True,
                         alpha=2.0, mask_renorm=True)
  # batch mean of the renormalized term == alpha * mean over labeled cells
  np.testing.assert_allclose(
      float(jnp.mean(llk_rn["llk_x1"])),
      2.0 * float(jnp.sum(per_cell * mask) / mask.sum()), rtol=1e-6)

  # zero labeled cells → term is zero, not NaN
  llk_z, _ = elbo_terms(out, [x, y], mask=jnp.zeros((B,)), mask_outputs=True,
                        alpha=2.0, mask_renorm=True)
  assert np.all(np.asarray(llk_z["llk_x1"]) == 0.0)

  # ctor arg round-trips through the save metamodel
  m = SISUA([RVmeta(G, "zinb", name="rna"), RVmeta(P, "nb", name="adt")],
            mask_renorm=True)
  assert m.mask_renorm and m._init_kwargs_for_save["mask_renorm"] is True
