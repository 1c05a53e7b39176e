"""Mixture distributions: 'mixgaus', 'mixnb', 'mixtril', 'mdn' posteriors.

The reference coerces label posteriors to mixtures in MISA
(``sisua/models/vae.py:47-98``: 'mixnb'/'mixgaussian'/'mdn', default
``n_components=2``) and SCALE's latent to 'mixgaus' with ``n_components=10``
(``sisua/models/scale.py:13-49``).

Convention: component parameters carry an extra axis at position -2 (between
batch and event): e.g. a mixture of K diagonal Gaussians over a D-dim event has
``loc`` of shape ``(..., K, D)`` and ``mixture_logits`` of shape ``(..., K)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import Array, Distribution

__all__ = ["MixtureSameFamily"]


class MixtureSameFamily(Distribution):
  """Finite mixture whose components share one (vector-event) family.

  ``components`` is a single Distribution whose batch shape ends with the
  component axis K (i.e. per-component params stacked on axis -2 relative to
  the event). Component log-probs must reduce their own event dims.
  """

  mixture_logits: Array        # (..., K)
  components: Distribution     # batch shape (..., K), event (D,) or ()

  @property
  def event_shape(self):
    return self.components.event_shape

  @property
  def batch_shape(self):
    return self.mixture_logits.shape[:-1]

  @property
  def n_components(self):
    return self.mixture_logits.shape[-1]

  def log_prob(self, x):
    # insert the component axis into x: (..., D) -> (..., 1, D)
    ed = len(self.components.event_shape)
    xk = jnp.expand_dims(x, axis=-1 - ed)
    comp_lp = self.components.log_prob(xk)           # (..., K)
    mix_lp = jax.nn.log_softmax(self.mixture_logits, axis=-1)
    return jax.scipy.special.logsumexp(mix_lp + comp_lp, axis=-1)

  def mean(self):
    w = jax.nn.softmax(self.mixture_logits, axis=-1)
    m = self.components.mean()                       # (..., K, D?) or (..., K)
    ed = len(self.components.event_shape)
    if ed:
      w = jnp.expand_dims(w, tuple(range(-ed, 0)))
    return jnp.sum(w * m, axis=-1 - ed)

  def variance(self):
    w = jax.nn.softmax(self.mixture_logits, axis=-1)
    m = self.components.mean()
    v = self.components.variance()
    ed = len(self.components.event_shape)
    if ed:
      w = jnp.expand_dims(w, tuple(range(-ed, 0)))
    mix_mean = jnp.sum(w * m, axis=-1 - ed, keepdims=True)
    return jnp.sum(w * (v + jnp.square(m - mix_mean)), axis=-1 - ed)

  def mode(self):
    # mode of the most probable component (approximation, standard practice)
    k = jnp.argmax(self.mixture_logits, axis=-1)
    modes = self.components.mode()
    ed = len(self.components.event_shape)
    idx = jnp.expand_dims(k, tuple(range(-1 - ed, 0)))
    return jnp.take_along_axis(modes, idx.astype(jnp.int32),
                               axis=-1 - ed).squeeze(-1 - ed)

  def sample(self, key, sample_shape=()):
    kc, ks = jax.random.split(key)
    shape = tuple(sample_shape) + self.batch_shape
    k = jax.random.categorical(kc, self.mixture_logits, axis=-1, shape=shape)
    samples = self.components.sample(ks, sample_shape)  # shape + (..., K[, D])
    ed = len(self.components.event_shape)
    idx = jnp.expand_dims(k, tuple(range(-1 - ed, 0))).astype(jnp.int32)
    idx = jnp.broadcast_to(
        idx, samples.shape[: samples.ndim - 1 - ed] + (1,) +
        samples.shape[samples.ndim - ed:])
    return jnp.take_along_axis(samples, idx, axis=-1 - ed).squeeze(-1 - ed)
