"""Cross-library numerics: our distributions vs torch.distributions (an
independent implementation, mirroring the reference's cross-library
dca/scvi integration tests — SURVEY.md §4)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import sisua_tpu.dist as D  # noqa: E402


def test_nb_logits_matches_torch():
  rng = np.random.default_rng(0)
  x = rng.poisson(3, (32, 8)).astype(np.float32)
  total = np.abs(rng.normal(5, 2, (32, 8))).astype(np.float32) + 0.1
  logits = rng.normal(0, 1, (32, 8)).astype(np.float32)
  ours = np.asarray(D.NegativeBinomial(
      total_count=jnp.asarray(total), logits=jnp.asarray(logits)
  ).log_prob(jnp.asarray(x)))
  theirs = torch.distributions.NegativeBinomial(
      total_count=torch.tensor(total), logits=torch.tensor(logits)
  ).log_prob(torch.tensor(x)).numpy()
  np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_normal_kl_matches_torch():
  p = D.Normal(loc=jnp.float32(1.3), scale=jnp.float32(0.7))
  q = D.Normal(loc=jnp.float32(-0.2), scale=jnp.float32(2.0))
  ours = float(D.kl_divergence(p, q))
  theirs = float(torch.distributions.kl_divergence(
      torch.distributions.Normal(1.3, 0.7),
      torch.distributions.Normal(-0.2, 2.0)))
  assert abs(ours - theirs) < 1e-5


def test_onehot_categorical_matches_torch():
  rng = np.random.default_rng(1)
  logits = rng.normal(0, 1, (16, 5)).astype(np.float32)
  x = np.eye(5, dtype=np.float32)[rng.integers(0, 5, 16)]
  ours = np.asarray(D.OneHotCategorical(
      logits=jnp.asarray(logits)).log_prob(jnp.asarray(x)))
  theirs = torch.distributions.OneHotCategorical(
      logits=torch.tensor(logits)).log_prob(torch.tensor(x)).numpy()
  np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_poisson_matches_torch():
  x = np.arange(10).astype(np.float32)
  ours = np.asarray(D.Poisson(rate=jnp.float32(2.5)).log_prob(
      jnp.asarray(x)))
  theirs = torch.distributions.Poisson(2.5).log_prob(
      torch.tensor(x)).numpy()
  np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_mixture_matches_torch():
  rng = np.random.default_rng(2)
  logits = rng.normal(0, 1, (8, 3)).astype(np.float32)
  loc = rng.normal(0, 2, (8, 3, 4)).astype(np.float32)
  scale = np.abs(rng.normal(1, 0.2, (8, 3, 4))).astype(np.float32) + 0.1
  x = rng.normal(0, 1, (8, 4)).astype(np.float32)
  ours = np.asarray(D.MixtureSameFamily(
      mixture_logits=jnp.asarray(logits),
      components=D.Independent(D.Normal(loc=jnp.asarray(loc),
                                        scale=jnp.asarray(scale)), 1)
  ).log_prob(jnp.asarray(x)))
  theirs = torch.distributions.MixtureSameFamily(
      torch.distributions.Categorical(logits=torch.tensor(logits)),
      torch.distributions.Independent(
          torch.distributions.Normal(torch.tensor(loc),
                                     torch.tensor(scale)), 1)
  ).log_prob(torch.tensor(x)).numpy()
  np.testing.assert_allclose(ours, theirs, atol=1e-4)
