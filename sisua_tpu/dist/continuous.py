"""Continuous distributions: Normal, MVN-diag, MVN-tril, Deterministic, Gamma.

Parity notes (behavior pinned by the reference's contract tests,
``/root/reference/tests/test_singlecell_models.py:41-91``):
  * ``'diag'`` posterior → MultivariateNormalDiag with event_shape ``(D,)``.
  * ``'mse'`` posterior → VectorDeterministic with
    ``-log_prob(x) == mean squared error(x, mean())`` (TF ``losses.mse`` is a
    *mean* over the event axis — we match that exactly).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .base import Array, Distribution, Independent, register_kl

__all__ = [
    "Normal",
    "MultivariateNormalDiag",
    "MultivariateNormalTriL",
    "VectorDeterministic",
    "NonzeroMaskedDeterministic",
    "Gamma",
    "LogNormal",
]

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


class Normal(Distribution):
  loc: Array
  scale: Array

  @property
  def batch_shape(self):
    return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))

  def log_prob(self, x):
    z = (x - self.loc) / self.scale
    return -0.5 * z * z - jnp.log(self.scale) - _HALF_LOG_2PI

  def mean(self):
    return jnp.broadcast_to(self.loc, self.batch_shape)

  def variance(self):
    return jnp.broadcast_to(self.scale * self.scale, self.batch_shape)

  def mode(self):
    return self.mean()

  def entropy(self):
    return 0.5 + _HALF_LOG_2PI + jnp.log(self.scale)

  def sample(self, key, sample_shape=()):
    shape = tuple(sample_shape) + self.batch_shape
    eps = jax.random.normal(key, shape, dtype=jnp.result_type(self.loc))
    return self.loc + self.scale * eps


@register_kl(Normal, Normal)
def _kl_normal_normal(p: Normal, q: Normal):
  var_ratio = jnp.square(p.scale / q.scale)
  t1 = jnp.square((p.loc - q.loc) / q.scale)
  return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


class MultivariateNormalDiag(Distribution):
  """MVN with diagonal covariance — the default latent posterior ('diag').

  NOTE: pytree classes must keep the generated ``__init__`` (unflatten calls
  ``cls(**fields)``), hence a first-class dataclass rather than an Independent
  wrapper.
  """

  loc: Array         # (..., D)
  scale_diag: Array  # (..., D)

  @property
  def event_shape(self):
    return (self.loc.shape[-1],)

  @property
  def batch_shape(self):
    return jnp.broadcast_shapes(self.loc.shape[:-1],
                                self.scale_diag.shape[:-1])

  def log_prob(self, x):
    z = (x - self.loc) / self.scale_diag
    return jnp.sum(-0.5 * z * z - jnp.log(self.scale_diag) - _HALF_LOG_2PI,
                   axis=-1)

  def mean(self):
    return jnp.broadcast_to(self.loc, self.batch_shape + self.event_shape)

  def variance(self):
    return jnp.broadcast_to(jnp.square(self.scale_diag),
                            self.batch_shape + self.event_shape)

  def mode(self):
    return self.mean()

  def entropy(self):
    return jnp.sum(0.5 + _HALF_LOG_2PI + jnp.log(self.scale_diag), axis=-1)

  def covariance(self):
    d = jnp.square(self.scale_diag)
    return jnp.einsum("...i,ij->...ij", d, jnp.eye(d.shape[-1], dtype=d.dtype))

  def sample(self, key, sample_shape=()):
    shape = tuple(sample_shape) + self.batch_shape + self.event_shape
    eps = jax.random.normal(key, shape, dtype=jnp.result_type(self.loc))
    return self.loc + self.scale_diag * eps


@register_kl(MultivariateNormalDiag, MultivariateNormalDiag)
def _kl_mvndiag_mvndiag(p: MultivariateNormalDiag, q: MultivariateNormalDiag):
  var_ratio = jnp.square(p.scale_diag / q.scale_diag)
  t1 = jnp.square((p.loc - q.loc) / q.scale_diag)
  return 0.5 * jnp.sum(var_ratio + t1 - 1.0 - jnp.log(var_ratio), axis=-1)


class MultivariateNormalTriL(Distribution):
  """MVN parameterized by a lower-triangular scale (for 'mixtril')."""

  loc: Array           # (..., D)
  scale_tril: Array    # (..., D, D)

  @property
  def event_shape(self):
    return (self.loc.shape[-1],)

  @property
  def batch_shape(self):
    return jnp.broadcast_shapes(self.loc.shape[:-1], self.scale_tril.shape[:-2])

  def log_prob(self, x):
    d = self.loc.shape[-1]
    diff = x - self.loc
    # solve L y = diff  → y, with log|Sigma|^{1/2} = sum log diag(L)
    y = jax.scipy.linalg.solve_triangular(self.scale_tril, diff[..., None],
                                          lower=True)[..., 0]
    log_det = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(self.scale_tril, axis1=-2,
                                                   axis2=-1))), axis=-1)
    return -0.5 * jnp.sum(y * y, -1) - log_det - d * _HALF_LOG_2PI

  def mean(self):
    return jnp.broadcast_to(self.loc, self.batch_shape + self.event_shape)

  def variance(self):
    return jnp.sum(self.scale_tril * self.scale_tril, axis=-1)

  def mode(self):
    return self.mean()

  def sample(self, key, sample_shape=()):
    shape = tuple(sample_shape) + self.batch_shape + self.event_shape
    eps = jax.random.normal(key, shape, dtype=self.loc.dtype)
    return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)


class VectorDeterministic(Distribution):
  """Deterministic 'distribution' for the 'mse'/'linear'/'relu' posteriors.

  Contract (reference test ``test_singlecell_models.py:82-91``):
  ``-log_prob(x) == tf.losses.mse(x, mean())`` i.e. the MEAN of squared errors
  over the event axis. This makes DCA's reconstruction loss literally MSE.
  """

  loc: Array  # (..., D)

  @property
  def event_shape(self):
    return (self.loc.shape[-1],)

  @property
  def batch_shape(self):
    return self.loc.shape[:-1]

  def log_prob(self, x):
    return -jnp.mean(jnp.square(x - self.loc), axis=-1)

  def mean(self):
    return self.loc

  def variance(self):
    return jnp.zeros_like(self.loc)

  def mode(self):
    return self.loc

  def sample(self, key, sample_shape=()):
    return jnp.broadcast_to(
        self.loc, tuple(sample_shape) + self.loc.shape)


class NonzeroMaskedDeterministic(VectorDeterministic):
  """Deterministic head whose reconstruction error counts only *observed*
  (non-zero) entries of the target — the scScope training objective
  (Deng et al. 2019): dropout zeros carry no penalty, so the decoder is
  free to impute them.

  ``-log_prob(x)`` = sum of squared errors over entries where ``x > 0``,
  divided by the number of such entries (mean over observed entries; 0 for
  an all-zero row). The mask is derived from ``x`` at scoring time, keeping
  the distribution a pure function of its parameters.

  ``log_space=True`` (the 'nzmse' head default): ``loc`` lives in
  ``log1p``-count space and the squared error is taken between ``log1p(x)``
  and ``loc`` — raw single-cell counts span 4+ decades, and squared error on
  them is dominated by the few largest counts (the gradient signal for
  everything else vanishes). ``mean()``/``mode()``/``sample()`` still return
  count-space values (``expm1(loc)``) so imputation/analysis see counts.
  """

  log_space: bool = struct.field(pytree_node=False, default=False)

  def log_prob(self, x):
    m = (x > 0).astype(self.loc.dtype)
    t = jnp.log1p(x) if self.log_space else x
    se = jnp.square(t - self.loc) * m
    n = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    return -jnp.sum(se, axis=-1) / n

  def mean(self):
    return jnp.expm1(self.loc) if self.log_space else self.loc

  def mode(self):
    return self.mean()

  def sample(self, key, sample_shape=()):
    return jnp.broadcast_to(self.mean(),
                            tuple(sample_shape) + self.loc.shape)


@register_kl(VectorDeterministic, Distribution)
def _kl_deterministic_any(p: VectorDeterministic, q: Distribution):
  # KL(δ_loc ‖ q) = -log q(loc) up to an (infinite, constant) entropy term;
  # the reference treats deterministic latents as contributing zero KL
  # (DCA has no KL term), so we return 0 — documented deviation from strict math.
  return jnp.zeros(p.batch_shape, dtype=p.loc.dtype)


class Gamma(Distribution):
  concentration: Array
  rate: Array

  @property
  def batch_shape(self):
    return jnp.broadcast_shapes(jnp.shape(self.concentration),
                                jnp.shape(self.rate))

  def log_prob(self, x):
    a, b = self.concentration, self.rate
    return a * jnp.log(b) + (a - 1.0) * jnp.log(x) - b * x - jax.lax.lgamma(a)

  def mean(self):
    return self.concentration / self.rate

  def variance(self):
    return self.concentration / jnp.square(self.rate)

  def mode(self):
    return jnp.maximum(self.concentration - 1.0, 0.0) / self.rate

  def sample(self, key, sample_shape=()):
    shape = tuple(sample_shape) + self.batch_shape
    g = jax.random.gamma(key, jnp.broadcast_to(self.concentration, shape))
    return g / self.rate


class LogNormal(Distribution):
  loc: Array
  scale: Array

  @property
  def batch_shape(self):
    return jnp.broadcast_shapes(jnp.shape(self.loc), jnp.shape(self.scale))

  def log_prob(self, x):
    lx = jnp.log(x)
    z = (lx - self.loc) / self.scale
    return -0.5 * z * z - jnp.log(self.scale) - _HALF_LOG_2PI - lx

  def mean(self):
    return jnp.exp(self.loc + 0.5 * self.scale * self.scale)

  def variance(self):
    s2 = self.scale * self.scale
    return (jnp.exp(s2) - 1.0) * jnp.exp(2.0 * self.loc + s2)

  def sample(self, key, sample_shape=()):
    shape = tuple(sample_shape) + self.batch_shape
    eps = jax.random.normal(key, shape, dtype=jnp.result_type(self.loc))
    return jnp.exp(self.loc + self.scale * eps)
