"""Discrete distributions: Categorical / OneHotCategorical.

``'onehot'`` is the reference's label likelihood for celltype / disease /
progenitor omics (``sisua/data/_single_cell_base.py:518-533``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Array, Distribution

__all__ = ["Categorical", "OneHotCategorical"]


class Categorical(Distribution):
  logits: Array  # (..., K)

  @property
  def event_shape(self):
    return ()

  @property
  def batch_shape(self):
    return self.logits.shape[:-1]

  def probs(self):
    return jax.nn.softmax(self.logits, axis=-1)

  def log_prob(self, x):
    lp = jax.nn.log_softmax(self.logits, axis=-1)
    x = x.astype(jnp.int32)
    return jnp.take_along_axis(lp, x[..., None], axis=-1)[..., 0]

  def mode(self):
    return jnp.argmax(self.logits, axis=-1)

  def mean(self):
    k = self.logits.shape[-1]
    return jnp.sum(self.probs() * jnp.arange(k, dtype=self.logits.dtype), -1)

  def entropy(self):
    lp = jax.nn.log_softmax(self.logits, axis=-1)
    return -jnp.sum(jnp.exp(lp) * lp, axis=-1)

  def sample(self, key, sample_shape=()):
    shape = tuple(sample_shape) + self.batch_shape
    return jax.random.categorical(key, self.logits, axis=-1, shape=shape)


class OneHotCategorical(Distribution):
  """Categorical over one-hot (or soft/probabilistic) label vectors.

  ``log_prob`` accepts soft labels: it is the inner product ⟨x, log softmax⟩,
  matching TFP's behavior on relaxed one-hot inputs (the reference feeds
  GMM-probabilized protein labels through this, cf.
  ``sisua/label_threshold.py`` → 'onehot' heads).
  """

  logits: Array  # (..., K)

  @property
  def event_shape(self):
    return (self.logits.shape[-1],)

  @property
  def batch_shape(self):
    return self.logits.shape[:-1]

  def probs(self):
    return jax.nn.softmax(self.logits, axis=-1)

  def log_prob(self, x):
    lp = jax.nn.log_softmax(self.logits, axis=-1)
    return jnp.sum(x * lp, axis=-1)

  def mean(self):
    return self.probs()

  def variance(self):
    p = self.probs()
    return p * (1.0 - p)

  def mode(self):
    return jax.nn.one_hot(jnp.argmax(self.logits, -1),
                          self.logits.shape[-1], dtype=self.logits.dtype)

  def entropy(self):
    lp = jax.nn.log_softmax(self.logits, axis=-1)
    return -jnp.sum(jnp.exp(lp) * lp, axis=-1)

  def sample(self, key, sample_shape=()):
    shape = tuple(sample_shape) + self.batch_shape
    idx = jax.random.categorical(key, self.logits, axis=-1, shape=shape)
    return jax.nn.one_hot(idx, self.logits.shape[-1],
                          dtype=self.logits.dtype)
