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
