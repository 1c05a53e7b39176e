"""Distribution numerics: scipy parity, KL, concat, shape semantics.

Mirrors the reference's RVmeta/distribution contract tests
(``/root/reference/tests/test_singlecell_models.py:41-91``) plus numeric
parity checks the reference lacked.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import sisua_tpu.dist as D

KEY = jax.random.PRNGKey(0)


@pytest.mark.smoke
def test_nb_logpmf_matches_scipy():
  x = np.random.default_rng(0).poisson(3, (16, 6)).astype(np.float32)
  nb = D.NegativeBinomial(total_count=jnp.float32(5.0),
                          logits=jnp.float32(-0.3))
  p_succ = 1.0 / (1.0 + np.exp(0.3))
  ref = stats.nbinom.logpmf(x, 5.0, 1.0 - p_succ)
  np.testing.assert_allclose(np.asarray(nb.log_prob(jnp.asarray(x))), ref,
                             atol=1e-4)


def test_nbd_logpmf_matches_scipy():
  x = np.random.default_rng(1).poisson(4, (16, 6)).astype(np.float32)
  nbd = D.NegativeBinomialDisp(loc=jnp.float32(4.0), disp=jnp.float32(2.0))
  ref = stats.nbinom.logpmf(x, 2.0, 1.0 - 4.0 / 6.0)
  np.testing.assert_allclose(np.asarray(nbd.log_prob(jnp.asarray(x))), ref,
                             atol=1e-4)
  # mean/variance of the NB(mean, dispersion) parameterization
  assert np.isclose(float(nbd.mean()), 4.0)
  assert np.isclose(float(nbd.variance()), 4.0 + 16.0 / 2.0)


@pytest.mark.smoke
def test_zero_inflated_logpmf():
  x = np.array([[0.0, 1.0, 5.0]], np.float32)
  nbd = D.NegativeBinomialDisp(loc=jnp.float32(4.0), disp=jnp.float32(2.0))
  zi = D.ZeroInflated(count_distribution=nbd, gate_logits=jnp.float32(0.5))
  pi = 1.0 / (1.0 + np.exp(-0.5))
  base = stats.nbinom.logpmf(x, 2.0, 1.0 - 4.0 / 6.0)
  ref = np.where(x == 0, np.log(pi + (1 - pi) * np.exp(base)),
                 np.log(1 - pi) + base)
  np.testing.assert_allclose(np.asarray(zi.log_prob(jnp.asarray(x))), ref,
                             atol=1e-4)
  # mean shrinks by (1-pi); .distribution unwraps (reference convention)
  assert np.isclose(float(zi.mean()), (1 - pi) * 4.0, atol=1e-5)
  assert zi.distribution is nbd


def test_deterministic_mse_contract():
  """Pinned by reference test: -log_prob == tf.losses.mse (mean over event)."""
  loc = jnp.zeros((4, 6))
  det = D.VectorDeterministic(loc=loc)
  z = jnp.asarray(np.random.default_rng(2).random((4, 6)), jnp.float32)
  np.testing.assert_allclose(np.asarray(-det.log_prob(z)),
                             np.mean(np.asarray(z) ** 2, -1), atol=1e-6)


def test_nonzero_masked_deterministic():
  """scScope objective (Deng et al. 2019): squared error averaged over the
  observed (x > 0) entries only; dropout zeros carry no penalty."""
  loc = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
  det = D.NonzeroMaskedDeterministic(loc=loc)
  x = jnp.asarray([[0.0, 2.0, 0.0, 1.0]])
  # only entries 1 and 3 are observed: ((2-2)^2 + (4-1)^2) / 2 = 4.5
  np.testing.assert_allclose(np.asarray(-det.log_prob(x)), [4.5], atol=1e-6)
  # an all-zero row contributes nothing (imputations are free there)
  np.testing.assert_allclose(np.asarray(det.log_prob(jnp.zeros((1, 4)))),
                             [0.0], atol=1e-6)


def test_kl_normal_analytic_vs_mc():
  p = D.Normal(loc=jnp.float32(1.0), scale=jnp.float32(0.5))
  q = D.Normal(loc=jnp.float32(0.0), scale=jnp.float32(1.0))
  kl = float(D.kl_divergence(p, q))
  mc = float(D.mc_kl_divergence(p, q, KEY, 200000))
  assert abs(kl - mc) < 2e-2


def test_kl_mvndiag():
  p = D.MultivariateNormalDiag(loc=jnp.ones((3, 5)),
                               scale_diag=jnp.full((3, 5), 0.5))
  q = D.MultivariateNormalDiag(loc=jnp.zeros((5,)),
                               scale_diag=jnp.ones((5,)))
  ref = 5 * 0.5 * (0.25 + 1.0 - 1.0 - np.log(0.25))
  np.testing.assert_allclose(np.asarray(D.kl_divergence(p, q)), ref,
                             rtol=1e-5)


def test_concat_distributions():
  p = D.MultivariateNormalDiag(loc=jnp.ones((7, 4)),
                               scale_diag=jnp.ones((7, 4)))
  c = D.concat_distributions([p[0:3], p[3:7]], axis=0)
  assert c.batch_shape == (7,)
  with pytest.raises(ValueError):
    D.concat_distributions([p, D.Normal(loc=jnp.zeros(3),
                                        scale=jnp.ones(3))])


def test_sampling_shapes_and_reparam():
  p = D.MultivariateNormalDiag(loc=jnp.zeros((3, 5)),
                               scale_diag=jnp.ones((3, 5)))
  assert p.sample(KEY, (7,)).shape == (7, 3, 5)
  # reparameterized: gradient flows through loc
  g = jax.grad(lambda loc: jnp.sum(
      D.MultivariateNormalDiag(loc=loc, scale_diag=jnp.ones(5)).sample(KEY)))(
          jnp.zeros(5))
  np.testing.assert_allclose(np.asarray(g), np.ones(5))


def test_nb_sampling_moments():
  nb = D.NegativeBinomialDisp(loc=jnp.float32(6.0), disp=jnp.float32(3.0))
  s = nb.sample(KEY, (200000,))
  assert abs(float(s.mean()) - 6.0) < 0.1
  assert abs(float(s.var()) - (6.0 + 36.0 / 3.0)) < 0.5


def test_mixture():
  logits = jnp.zeros((4, 3))
  comp = D.Independent(D.Normal(loc=jnp.stack([jnp.full((4, 5), m)
                                               for m in (-2.0, 0.0, 2.0)], 1),
                                scale=jnp.ones((4, 3, 5))), 1)
  mix = D.MixtureSameFamily(mixture_logits=logits, components=comp)
  assert mix.log_prob(jnp.zeros((4, 5))).shape == (4,)
  assert mix.sample(KEY).shape == (4, 5)
  assert mix.sample(KEY, (9,)).shape == (9, 4, 5)
  np.testing.assert_allclose(np.asarray(mix.mean()), np.zeros((4, 5)),
                             atol=1e-6)


def test_onehot_categorical():
  oh = D.OneHotCategorical(logits=jnp.asarray(
      np.random.default_rng(3).normal(size=(6, 4)), jnp.float32))
  x = jax.nn.one_hot(jnp.arange(6) % 4, 4)
  lp = oh.log_prob(x)
  assert lp.shape == (6,)
  s = oh.sample(KEY, (11,))
  assert s.shape == (11, 6, 4)
  np.testing.assert_allclose(np.asarray(s.sum(-1)), np.ones((11, 6)))


def test_poisson_bernoulli():
  po = D.Poisson(rate=jnp.float32(3.0))
  x = np.arange(6).astype(np.float32)
  np.testing.assert_allclose(np.asarray(po.log_prob(jnp.asarray(x))),
                             stats.poisson.logpmf(x, 3.0), atol=1e-5)
  be = D.Bernoulli(logits=jnp.float32(0.3))
  np.testing.assert_allclose(
      float(be.log_prob(jnp.float32(1.0))),
      np.log(1 / (1 + np.exp(-0.3))), atol=1e-6)


def test_poisson_log_prob_zero_rate_zero_count():
  """rate==0 at x==0 is log(1)=0, not 0*log(0)=NaN (review finding)."""
  from sisua_tpu.dist import Poisson
  lp = np.asarray(Poisson(rate=jnp.array([0.0, 2.0]))
                  .log_prob(jnp.array([0.0, 0.0])))
  # exactly log(1)=0 up to the Lanczos lgamma(1) approximation error
  np.testing.assert_allclose(lp[0], 0.0, atol=1e-5)
  np.testing.assert_allclose(lp[1], -2.0, rtol=1e-5, atol=1e-5)


def test_poisson_zero_rate_gradient_finite():
  """The BACKWARD pass must be finite at (x=0, rate=0) too — xlogy alone
  fixes the value but d/d(rate) xlogy(0, rate) is NaN at 0, which NaNs the
  params one step after a softmax-underflowed rate (review finding)."""
  from sisua_tpu.dist import Poisson
  g = jax.grad(lambda r: Poisson(rate=r).log_prob(0.0))(0.0)
  np.testing.assert_allclose(g, -1.0, rtol=1e-6)  # d/dr (-r) at the 0-0 edge
  # positive counts at rate 0 stay impossible
  lp = Poisson(rate=jnp.float32(0.0)).log_prob(jnp.float32(3.0))
  assert np.isneginf(np.asarray(lp))
  # and gradients away from the edge are untouched
  g2 = jax.grad(lambda r: Poisson(rate=r).log_prob(3.0))(2.0)
  np.testing.assert_allclose(g2, 3.0 / 2.0 - 1.0, rtol=1e-5)


def test_zero_inflated_sample_broad_gate():
  """Per-cell gate over shared per-gene counts must sample at the wrapper's
  batch shape (review finding: broadcast_to cannot shrink)."""
  from sisua_tpu.dist import NegativeBinomialDisp, ZeroInflated
  d = ZeroInflated(
      count_distribution=NegativeBinomialDisp(loc=jnp.ones((1, 4)) * 5,
                                              disp=jnp.ones((1, 4))),
      gate_logits=jnp.zeros((3, 4)))
  assert tuple(d.batch_shape) == (3, 4)
  s = d.sample(jax.random.PRNGKey(0))
  assert s.shape == (3, 4)
  # rows are independent draws, not one row broadcast
  s2 = d.sample(jax.random.PRNGKey(1), (64,))
  assert s2.shape == (64, 3, 4)
  assert not np.allclose(np.asarray(s2)[:, 0], np.asarray(s2)[:, 1])


def test_nb_mixture_sample_broad_mixing():
  from sisua_tpu.dist import NegativeBinomialMixture
  d = NegativeBinomialMixture(loc_back=jnp.ones((1, 4)),
                              loc_fore=jnp.ones((1, 4)) * 30,
                              disp=jnp.ones((1, 4)),
                              mixing_logits=jnp.zeros((5, 4)))
  assert tuple(d.batch_shape) == (5, 4)
  s = d.sample(jax.random.PRNGKey(0), (32,))
  assert s.shape == (32, 5, 4)
  assert not np.allclose(np.asarray(s)[:, 0], np.asarray(s)[:, 1])


def test_nbd_log_space_parity():
  """NegativeBinomialDispLog(log μ, θ) must match NegativeBinomialDisp(μ, θ)
  in log_prob (plain and zero-inflated), moments, and gradients — it is the
  same scVI likelihood with the mean carried in log space (the wide-regime
  decode path materializes one less (B, D) intermediate with it)."""
  from sisua_tpu.dist import (NegativeBinomialDisp, NegativeBinomialDispLog,
                              ZeroInflated)
  rng = np.random.default_rng(3)
  x = jnp.asarray(rng.poisson(3.0, (8, 16)).astype(np.float32))
  x = x.at[:, :4].set(0.0)
  mu = jnp.asarray(rng.gamma(2.0, 2.0, (8, 16)).astype(np.float32))
  th = jnp.asarray(rng.gamma(3.0, 1.0, (16,)).astype(np.float32))
  gt = jnp.asarray(rng.normal(0, 1, (8, 16)).astype(np.float32))
  lin = NegativeBinomialDisp(loc=mu, disp=th)
  log = NegativeBinomialDispLog(log_loc=jnp.log(mu), disp=th)
  np.testing.assert_allclose(np.asarray(log.log_prob(x)),
                             np.asarray(lin.log_prob(x)),
                             rtol=2e-4, atol=2e-4)
  np.testing.assert_allclose(
      np.asarray(ZeroInflated(count_distribution=log,
                              gate_logits=gt).log_prob(x)),
      np.asarray(ZeroInflated(count_distribution=lin,
                              gate_logits=gt).log_prob(x)),
      rtol=2e-4, atol=2e-4)
  np.testing.assert_allclose(np.asarray(log.mean()), np.asarray(mu),
                             rtol=1e-6)
  np.testing.assert_allclose(np.asarray(log.variance()),
                             np.asarray(lin.variance()), rtol=1e-5)
  # gradient parity wrt log μ (chain rule μ·d/dμ for the linear dist)
  g1 = jax.grad(lambda ll: jnp.sum(
      NegativeBinomialDispLog(log_loc=ll, disp=th).log_prob(x)))(jnp.log(mu))
  g2 = jax.grad(lambda m: jnp.sum(
      NegativeBinomialDisp(loc=m, disp=th).log_prob(x)))(mu)
  np.testing.assert_allclose(np.asarray(g1), np.asarray(g2 * mu),
                             rtol=5e-3, atol=1e-4)
  # sampling statistics track the mean
  s = log.sample(jax.random.PRNGKey(0), (512,))
  assert s.shape == (512, 8, 16)
  np.testing.assert_allclose(np.asarray(s.mean(0)), np.asarray(mu),
                             atol=4 * float(jnp.sqrt(lin.variance().max()
                                                     / 512)) + 0.3)


def test_nb_full_log_space_parity():
  """NegativeBinomialLog(log μ, log θ) must match NegativeBinomialDisp(μ, θ)
  — the per-cell-per-gene ('full' dispersion) SCVI/TotalVI decode carries
  BOTH parameters in log space so neither exp(θ) nor log μ is ever a (B, D)
  HBM intermediate. θ = exp(clip(log θ, ±15)) by construction (rv._positive
  convention), exact for every realistic dispersion."""
  from sisua_tpu.dist import (NegativeBinomialDisp, NegativeBinomialLog,
                              ZeroInflated)
  rng = np.random.default_rng(7)
  x = jnp.asarray(rng.poisson(3.0, (8, 16)).astype(np.float32))
  x = x.at[:, :4].set(0.0)
  mu = jnp.asarray(rng.gamma(2.0, 2.0, (8, 16)).astype(np.float32))
  th = jnp.asarray(rng.gamma(3.0, 1.0, (8, 16)).astype(np.float32))
  gt = jnp.asarray(rng.normal(0, 1, (8, 16)).astype(np.float32))
  lin = NegativeBinomialDisp(loc=mu, disp=th)
  log = NegativeBinomialLog(log_loc=jnp.log(mu), log_disp=jnp.log(th))
  np.testing.assert_allclose(np.asarray(log.log_prob(x)),
                             np.asarray(lin.log_prob(x)),
                             rtol=2e-4, atol=2e-4)
  np.testing.assert_allclose(
      np.asarray(ZeroInflated(count_distribution=log,
                              gate_logits=gt).log_prob(x)),
      np.asarray(ZeroInflated(count_distribution=lin,
                              gate_logits=gt).log_prob(x)),
      rtol=2e-4, atol=2e-4)
  # lazy linear accessors for serving paths
  np.testing.assert_allclose(np.asarray(log.loc), np.asarray(mu), rtol=1e-6)
  np.testing.assert_allclose(np.asarray(log.disp), np.asarray(th), rtol=1e-6)
  np.testing.assert_allclose(np.asarray(log.mean()), np.asarray(mu),
                             rtol=1e-6)
  np.testing.assert_allclose(np.asarray(log.variance()),
                             np.asarray(lin.variance()), rtol=1e-5)
  # gradient parity wrt BOTH log-space params (chain rule · linear param)
  g_ll = jax.grad(lambda ll: jnp.sum(NegativeBinomialLog(
      log_loc=ll, log_disp=jnp.log(th)).log_prob(x)))(jnp.log(mu))
  g_mu = jax.grad(lambda m: jnp.sum(
      NegativeBinomialDisp(loc=m, disp=th).log_prob(x)))(mu)
  np.testing.assert_allclose(np.asarray(g_ll), np.asarray(g_mu * mu),
                             rtol=5e-3, atol=1e-4)
  g_ld = jax.grad(lambda ld: jnp.sum(NegativeBinomialLog(
      log_loc=jnp.log(mu), log_disp=ld).log_prob(x)))(jnp.log(th))
  g_th = jax.grad(lambda t: jnp.sum(
      NegativeBinomialDisp(loc=mu, disp=t).log_prob(x)))(th)
  np.testing.assert_allclose(np.asarray(g_ld), np.asarray(g_th * th),
                             rtol=5e-3, atol=1e-3)
  # sampling statistics track the mean
  s = log.sample(jax.random.PRNGKey(0), (512,))
  assert s.shape == (512, 8, 16)
  np.testing.assert_allclose(np.asarray(s.mean(0)), np.asarray(mu),
                             atol=4 * float(jnp.sqrt(lin.variance().max()
                                                     / 512)) + 0.3)
  # the clipped-exp positive parameterization beyond ±15 stays finite
  extreme = NegativeBinomialLog(log_loc=jnp.float32(1.0),
                                log_disp=jnp.float32(40.0))
  assert np.isfinite(float(extreme.log_prob(jnp.float32(3.0))))
  assert np.isfinite(float(extreme.disp))
  # ... AND stays a normalized pmf: beyond the clip the distribution must
  # equal NB(μ, θ=e^±15) exactly — both logits and θ derive from the SAME
  # clipped log θ (raw-logits + clipped-θ described two different
  # distributions and denormalized the pmf, ADVICE r4)
  ex = NegativeBinomialLog(log_loc=jnp.float32(1.0),
                           log_disp=jnp.float32(40.0))
  clipped = NegativeBinomialDisp(loc=jnp.exp(jnp.float32(1.0)),
                                 disp=jnp.exp(jnp.float32(15.0)))
  xs = jnp.arange(0.0, 400.0)
  np.testing.assert_allclose(np.asarray(ex.log_prob(xs)),
                             np.asarray(clipped.log_prob(xs)),
                             rtol=1e-4, atol=1e-3)
  for ld_ex in (40.0, -40.0):
    ex = NegativeBinomialLog(log_loc=jnp.float32(1.0),
                             log_disp=jnp.float32(ld_ex))
    total = float(jnp.sum(jnp.exp(ex.log_prob(xs))))
    assert abs(total - 1.0) < 1e-3, f"pmf not normalized: {total}"
