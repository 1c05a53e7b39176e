"""RVmeta / head contract tests — pins the posterior vocabulary and the
distribution types each head produces (mirrors reference
``tests/test_singlecell_models.py:41-91``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sisua_tpu.dist as D
from sisua_tpu.nn import DistributionDense, MLP, NetConf, parse_netconf
from sisua_tpu.rv import RVmeta, parse_rv

KEY = jax.random.PRNGKey(0)


def _head_output(rv, x):
  head = DistributionDense(rv)
  vs = head.init(KEY, x)
  return head.apply(vs, x)


def test_rv_diag_contract():
  x = jnp.asarray(np.random.default_rng(0).random((8, 12)), jnp.float32)
  rv = RVmeta(12, "diag")
  assert not rv.is_zero_inflated and not rv.is_deterministic
  assert rv.event_shape == (12,)
  y = _head_output(rv, x)
  assert isinstance(y, D.MultivariateNormalDiag)
  assert y.event_shape == (12,) and y.batch_shape == (8,)
  assert isinstance(rv.create_prior(), D.MultivariateNormalDiag)
  # sample with leading dim (reference pins (1, 8, 12) for sample_shape 1)
  assert y.sample(KEY, (1,)).shape == (1, 8, 12)


def test_rv_nbd_contract():
  x = jnp.ones((8, 12))
  rv = RVmeta(12, "nbd")
  assert not rv.is_zero_inflated
  y = _head_output(rv, x)
  assert isinstance(y, D.Independent)
  assert isinstance(y.distribution, D.NegativeBinomialDisp)
  assert rv.create_prior() is None


def test_rv_zinb_contract():
  x = jnp.ones((8, 12))
  rv = RVmeta(12, "zinb")
  assert rv.is_zero_inflated
  y = _head_output(rv, x)
  assert isinstance(y.distribution, D.ZeroInflated)
  assert isinstance(y.distribution.count_distribution, D.NegativeBinomial)


def test_rv_mse_contract():
  x = jnp.asarray(np.random.default_rng(1).random((8, 12)), jnp.float32)
  rv = RVmeta(12, "mse")
  assert rv.is_deterministic and not rv.is_zero_inflated
  y = _head_output(rv, x)
  assert isinstance(y, D.VectorDeterministic)
  z = jnp.asarray(np.random.default_rng(2).random((8, 12)), jnp.float32)
  np.testing.assert_allclose(np.asarray(-y.log_prob(z)),
                             np.mean(np.asarray(z - y.mean()) ** 2, -1),
                             atol=1e-6)


@pytest.mark.slow
def test_rv_all_posteriors_build():
  """Every registered posterior constructs, evaluates log_prob, samples."""
  x = jnp.ones((4, 16))
  counts = jnp.asarray(
      np.random.default_rng(3).poisson(2, (4, 6)), jnp.float32)
  for name in ("normal", "diag", "nb", "nbd", "zinb", "zinbd", "poisson",
               "zip", "bernoulli", "mse", "linear", "relu", "mixgaus",
               "mixnb", "mdn", "onehot", "tril", "mixtril"):
    rv = RVmeta(6, name, kwargs={"n_components": 2})
    y = _head_output(rv, x)
    target = counts if name not in ("onehot",) else jax.nn.one_hot(
        jnp.arange(4) % 6, 6)
    lp = y.log_prob(target)
    assert lp.shape == (4,), (name, lp.shape)
    assert bool(jnp.isfinite(lp).all()), name
    s = y.sample(KEY)
    assert s.shape == (4, 6), (name, s.shape)


def test_rv_constrained_params_passthrough():
  """projection=False heads take final params (SCVI decode contract)."""
  rv = RVmeta(4, "nbd", projection=False)
  rate = jnp.full((2, 4), 3.0)
  disp = jnp.full((2, 4), 2.0)
  y = _head_output(rv, jnp.concatenate([rate, disp], -1))
  np.testing.assert_allclose(np.asarray(y.distribution.loc), 3.0)
  np.testing.assert_allclose(np.asarray(y.distribution.disp), 2.0)


def test_rv_unknown_posterior():
  with pytest.raises(ValueError, match="Unknown posterior"):
    RVmeta(4, "zinbb")


def test_parse_shortcuts():
  assert parse_rv({"dim": 5, "posterior": "nb"}).posterior == "nb"
  assert parse_rv((5, "zinb", "rna")).name == "rna"
  assert parse_netconf({"hidden_dim": 32, "nlayers": 3}).units == (32, 32, 32)
  assert parse_netconf(64).units == (64,)
  assert NetConf(units=128, nlayers=2).units == (128, 128)
  assert NetConf(units=(64, 64), pyramid=True).units == (64, 32)


def test_mlp_shapes_and_dropout():
  conf = NetConf((32, 16), batchnorm=True, dropout=0.2, input_dropout=0.3)
  mlp = MLP(conf)
  x = jnp.ones((8, 20))
  vs = mlp.init({"params": KEY, "dropout": KEY}, x, training=True)
  out, mut = mlp.apply(vs, x, training=True, rngs={"dropout": KEY},
                       mutable=["batch_stats"])
  assert out.shape == (8, 16)
  # eval path is deterministic
  o1 = mlp.apply(vs, x, training=False)
  o2 = mlp.apply(vs, x, training=False)
  np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))


def test_netconf_conv_applies_regularization():
  """use_conv must honor batchnorm/dropout (review finding)."""
  import jax
  from sisua_tpu.nn import MLP, NetConf
  conf = NetConf(units=(8,), batchnorm=True, dropout=0.3, use_conv=True)
  m = MLP(conf)
  x = jnp.ones((4, 32))
  variables = m.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)}, x, training=True)
  names = set(variables["params"].keys())
  assert any("bn" in n for n in names), names
  assert "batch_stats" in variables
