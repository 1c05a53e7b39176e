"""TotalVI (working implementation beyond the reference's stub) +
NegativeBinomialMixture numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sisua_tpu.dist as D
from sisua_tpu.models import TotalVI, RVmeta, get_model, load_model

KEY = jax.random.PRNGKey(0)


@pytest.mark.slow
def test_nb_mixture_logpmf():
  """Element-wise two-component mixture == manual logaddexp of NBs."""
  back = D.NegativeBinomialDisp(loc=jnp.float32(2.0), disp=jnp.float32(3.0))
  fore = D.NegativeBinomialDisp(loc=jnp.float32(20.0), disp=jnp.float32(3.0))
  mix = D.NegativeBinomialMixture(loc_back=jnp.float32(2.0),
                                  loc_fore=jnp.float32(20.0),
                                  disp=jnp.float32(3.0),
                                  mixing_logits=jnp.float32(0.4))
  x = jnp.asarray(np.arange(30).astype(np.float32))
  pi = 1.0 / (1.0 + np.exp(-0.4))
  ref = np.logaddexp(np.log(pi) + np.asarray(back.log_prob(x)),
                     np.log(1 - pi) + np.asarray(fore.log_prob(x)))
  np.testing.assert_allclose(np.asarray(mix.log_prob(x)), ref, atol=1e-5)
  # mean is the mixture mean; mode switches on the mixing prob
  assert np.isclose(float(mix.mean()), pi * 2.0 + (1 - pi) * 20.0, atol=1e-5)
  # foreground probability is high for large counts, low near background
  fg = np.asarray(mix.foreground_probability(x))
  assert fg[0] < 0.5 < fg[-1]
  s = mix.sample(KEY, (500,))
  assert s.shape == (500,) and float(s.mean()) > 0


@pytest.mark.slow
def test_totalvi_end_to_end(splits, tmp_path):
  train, test = splits
  n_prot = train.get_dim("proteomic")
  m = TotalVI([RVmeta(train.n_vars, "nbd", name="rna"),
               RVmeta(n_prot, "nbd", name="adt")],
              encoder={"units": [32], "batchnorm": True})
  assert m.id == "tvi"  # capitals of TotalVI
  assert m.uses_library
  assert get_model("totalvi") is TotalVI
  m.fit(train, valid=test, epochs=4, batch_size=64)
  assert m.history["loss"][-1] < m.history["loss"][0]
  pX, (qz, ql) = m.predict(test)
  assert len(pX) == 2
  assert isinstance(pX[1].base, D.NegativeBinomialMixture)
  assert ql.event_shape == (1,)
  # denoised protein signal in [0, 1]
  fg = m.denoised_proteins(test)
  assert fg.shape == (test.n_obs, n_prot)
  assert fg.min() >= 0.0 and fg.max() <= 1.0
  # reconstruction round-trip
  m.save_weights(str(tmp_path / "tvi"))
  m2 = load_model(str(tmp_path / "tvi"))
  _, (zA, _) = m.predict(test[np.arange(30)])
  _, (zB, _) = m2.predict(test[np.arange(30)])
  np.testing.assert_allclose(np.asarray(zA.mean()), np.asarray(zB.mean()),
                             atol=1e-5)


@pytest.mark.slow
def test_totalvi_hierarchical_background_prior(splits):
  """The background posterior q(log β|z) contributes a third KL term against
  a *learned* per-protein Normal prior (TotalVI's β ~ LogNormal(c_t, d_t))."""
  train, _ = splits
  n_prot = train.get_dim("proteomic")
  m = TotalVI([RVmeta(train.n_vars, "nbd", name="rna"),
               RVmeta(n_prot, "nbd", name="adt")],
              encoder={"units": [32]})
  prior0 = np.asarray(m.params["background_prior_mean"]).copy()
  assert prior0.shape == (n_prot,)
  m.fit(train, epochs=3, batch_size=64)
  # the background KL is tracked like any latent's (klqp_z2)
  assert "klqp_z2" in m.history
  assert np.isfinite(m.history["klqp_z2"]).all()
  # the prior parameters are trained, not frozen buffers
  prior1 = np.asarray(m.params["background_prior_mean"])
  assert not np.allclose(prior0, prior1)
  # deterministic decode (no rng) still works: uses the posterior mean
  z = np.zeros((4, 16), np.float32)
  l = np.zeros((4, 1), np.float32)
  pX = m.decode((z, l))
  assert isinstance(pX[1].base, D.NegativeBinomialMixture)


def test_totalvi_requires_two_outputs():
  with pytest.raises(AssertionError):
    TotalVI(RVmeta(10, "nbd"))
  with pytest.raises(AssertionError):
    TotalVI([RVmeta(10, "diag"), RVmeta(3, "nbd")])


@pytest.mark.slow
def test_totalvi_posterior(splits):
  train, test = splits
  m = TotalVI([RVmeta(train.n_vars, "zinbd", name="rna"),
               RVmeta(train.get_dim("proteomic"), "nbd", name="adt")],
              encoder={"units": [32]})
  m.fit(train, epochs=2, batch_size=64)
  post = m.create_posterior(test, sample_shape=2)
  assert "itranscriptomic" in post.sco_analysis.omics
  scores = post.cal_imputation_scores()
  assert all(np.isfinite(v) for v in scores.values())


def test_totalvi_mask_protein_leak_free(splits):
  """Semi-supervised TotalVI (mask_protein=True, extension): the protein
  modality of UNLABELED cells must be invisible to the training loss — both
  through the likelihood (masked like a SISUA label head) and through the
  joint encoder input (zeroed slice). Pinned by replacing unlabeled cells'
  ADT with garbage: the training loss must be bit-identical."""
  import optax
  train, _ = splits
  n_prot = train.get_dim("proteomic")
  m = TotalVI([RVmeta(train.n_vars, "nbd", name="rna"),
               RVmeta(n_prot, "nbd", name="adt")],
              encoder={"units": [32], "batchnorm": True}, mask_protein=True,
              seed=0)
  assert m.is_semi_supervised and m.mask_outputs
  m._ensure_initialized()
  state = m.state.replace(opt_state=optax.adam(1e-3).init(m.state.params))
  step = m.make_train_step_core(optax.adam(1e-3))

  B = 64
  rna = jnp.asarray(train.numpy()[:B].astype(np.float32))
  adt = jnp.asarray(train.numpy("proteomic")[:B].astype(np.float32))
  lib = jnp.ones((B, 2), jnp.float32)
  mask = (jnp.arange(B) % 4 == 0).astype(jnp.float32)  # 25% labeled
  garbage = adt + 1e4 * (1.0 - mask[:, None])  # corrupt UNLABELED rows only
  key = jax.random.PRNGKey(3)
  _, m1 = step(state, {"inputs": [rna, adt], "library": lib, "mask": mask},
               key)
  _, m2 = step(state, {"inputs": [rna, garbage], "library": lib,
                       "mask": mask}, key)
  assert float(m1["loss"]) == float(m2["loss"]), (m1["loss"], m2["loss"])
  # corrupting a LABELED row must change the loss (the mask is real, not
  # a blanket protein blackout)
  garbage2 = adt + 1e4 * mask[:, None]
  _, m3 = step(state, {"inputs": [rna, garbage2], "library": lib,
                       "mask": mask}, key)
  assert float(m1["loss"]) != float(m3["loss"])


@pytest.mark.slow
def test_totalvi_mask_protein_fit(splits, tmp_path):
  """mask_protein end-to-end: trains at a 30% protein budget, loss
  decreases, and the flag round-trips through the checkpoint."""
  train, test = splits
  n_prot = train.get_dim("proteomic")
  m = TotalVI([RVmeta(train.n_vars, "nbd", name="rna"),
               RVmeta(n_prot, "nbd", name="adt")],
              encoder={"units": [32], "batchnorm": True}, mask_protein=True)
  m.fit(train, epochs=4, batch_size=64, labels_percent=0.3,
        valid_freq=0, patience=0)
  assert m.history["loss"][-1] < m.history["loss"][0]
  assert np.isfinite(m.history["loss"]).all()
  m.save_weights(str(tmp_path / "tvis"))
  m2 = load_model(str(tmp_path / "tvis"))
  assert m2.mask_protein and m2.mask_outputs


def test_totalvi_low_budget_warns_without_renorm(splits):
  """VERDICT r3 #7: mask_protein at labels_percent<0.1 without mask_renorm
  is the measured-collapse configuration (RESULTS.md 'Low-label protocol')
  — fit must warn. With mask_renorm=True (or a ≥10% budget) it must not."""
  train, _ = splits
  n_prot = train.get_dim("proteomic")
  outs = lambda: [RVmeta(train.n_vars, "nbd", name="rna"),  # noqa: E731
                  RVmeta(n_prot, "nbd", name="adt")]
  enc = {"units": [16]}
  m = TotalVI(outs(), encoder=enc, mask_protein=True)
  with pytest.warns(UserWarning, match="collapse"):
    m.fit(train, epochs=1, batch_size=64, labels_percent=0.02,
          valid_freq=0, patience=0)
  import warnings as _w
  m2 = TotalVI(outs(), encoder=enc, mask_protein=True, mask_renorm=True)
  m3 = TotalVI(outs(), encoder=enc, mask_protein=True)
  with _w.catch_warnings():
    _w.simplefilter("error", UserWarning)
    m2.fit(train, epochs=1, batch_size=64, labels_percent=0.02,
           valid_freq=0, patience=0)
    m3.fit(train, epochs=1, batch_size=64, labels_percent=0.3,
           valid_freq=0, patience=0)
