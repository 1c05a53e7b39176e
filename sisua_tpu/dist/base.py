"""Distribution foundation: params-first pytree distributions.

Design notes (TPU-first, not a port):

The reference (trungnt13/sisua) relies on TensorFlow-Probability distribution
*objects* flowing through the model (``sisua/models/single_cell_model.py:153-211``
returns TFP distributions, and ``odin.bay`` provides ``concat_distributions`` to
merge per-batch distributions). In JAX the idiomatic equivalent is a
*params-first* design: every distribution is a registered pytree dataclass whose
leaves are its parameter arrays. That makes the three hard requirements trivial:

1. distributions can cross ``jit`` boundaries (they are pytrees),
2. batched-inference results concatenate with a ``tree_map`` over leaves
   (the ``concat_distributions`` capability, cf. reference
   ``sisua/models/single_cell_model.py:183-211``),
3. ``vmap``/``scan``/``shard_map`` transforms apply directly to distributions.

All ``log_prob``/``mean``/``kl`` math is pure jax.numpy so XLA fuses it into the
surrounding ELBO computation; see ``sisua_tpu.ops`` for Pallas-fused fast paths.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

__all__ = [
    "Distribution",
    "Independent",
    "kl_divergence",
    "register_kl",
    "concat_distributions",
    "stack_distributions",
]

Array = jax.Array


class Distribution(struct.PyTreeNode):
  """Base class for all distributions.

  Shape semantics follow TFP (the reference's substrate, so its tests pin
  these): a distribution has a *batch shape* and an *event shape*.
  ``log_prob(x)`` returns an array of batch shape; ``sample(key, shape)``
  returns ``shape + batch_shape + event_shape``.
  """

  # ---- shape protocol -------------------------------------------------
  @property
  def event_shape(self) -> Tuple[int, ...]:
    return ()

  @property
  def batch_shape(self) -> Tuple[int, ...]:
    raise NotImplementedError

  @property
  def dtype(self):
    return jnp.result_type(*[l for l in jax.tree_util.tree_leaves(self)])

  # ---- distribution protocol ------------------------------------------
  def log_prob(self, x: Array) -> Array:
    raise NotImplementedError

  def prob(self, x: Array) -> Array:
    return jnp.exp(self.log_prob(x))

  def mean(self) -> Array:
    raise NotImplementedError

  def variance(self) -> Array:
    raise NotImplementedError

  def stddev(self) -> Array:
    return jnp.sqrt(self.variance())

  def mode(self) -> Array:
    raise NotImplementedError

  def sample(self, key: Array, sample_shape: Tuple[int, ...] = ()) -> Array:
    """Draw samples; reparameterized where the family permits."""
    raise NotImplementedError

  def sample_and_log_prob(self, key, sample_shape=()):
    s = self.sample(key, sample_shape)
    return s, self.log_prob(s)

  def entropy(self) -> Array:
    raise NotImplementedError

  # ---- conveniences -----------------------------------------------------
  def __getitem__(self, idx):
    """Index into the batch dimensions of every parameter leaf."""
    return jax.tree_util.tree_map(lambda p: p[idx], self)

  def __repr__(self):  # compact, shapes only — params may be huge
    fields = []
    for f in dataclasses.fields(self):
      v = getattr(self, f.name)
      if isinstance(v, (jax.Array,)) or hasattr(v, "shape"):
        fields.append(f"{f.name}={getattr(v, 'shape', v)}")
      else:
        fields.append(f"{f.name}={v!r}")
    return f"{type(self).__name__}({', '.join(fields)})"


class Independent(Distribution):
  """Reinterpret the rightmost batch dims of ``base`` as event dims.

  Mirrors ``tfd.Independent`` which the reference uses for every vector
  likelihood (e.g. ``Independent(Normal(...), 1)`` for the scVI library prior,
  reference ``sisua/models/scvi.py:102``).
  """

  base: Distribution
  reinterpreted_batch_ndims: int = struct.field(pytree_node=False, default=1)

  @property
  def distribution(self) -> Distribution:  # TFP-compatible alias
    return self.base

  @property
  def event_shape(self):
    n = self.reinterpreted_batch_ndims
    bs = self.base.batch_shape
    return tuple(bs[len(bs) - n:]) + tuple(self.base.event_shape)

  @property
  def batch_shape(self):
    bs = self.base.batch_shape
    return tuple(bs[: len(bs) - self.reinterpreted_batch_ndims])

  def log_prob(self, x):
    lp = self.base.log_prob(x)
    return jnp.sum(lp, axis=tuple(range(-self.reinterpreted_batch_ndims, 0)))

  def mean(self):
    return self.base.mean()

  def variance(self):
    return self.base.variance()

  def mode(self):
    return self.base.mode()

  def entropy(self):
    ent = self.base.entropy()
    return jnp.sum(ent, axis=tuple(range(-self.reinterpreted_batch_ndims, 0)))

  def sample(self, key, sample_shape=()):
    return self.base.sample(key, sample_shape)


# --------------------------------------------------------------------------
# KL divergence registry (analytic where known, else raise → caller uses MC)
# --------------------------------------------------------------------------
_KL_REGISTRY: dict[tuple[type, type], Callable] = {}


def register_kl(p_cls: type, q_cls: type):
  def deco(fn):
    _KL_REGISTRY[(p_cls, q_cls)] = fn
    return fn

  return deco


class NoAnalyticKL(NotImplementedError):
  pass


def kl_divergence(p: Distribution, q: Distribution) -> Array:
  """Analytic KL(p ‖ q). Raises NoAnalyticKL when no closed form is known."""
  # unwrap matched Independent pairs
  if isinstance(p, Independent) and isinstance(q, Independent) and (
      p.reinterpreted_batch_ndims == q.reinterpreted_batch_ndims):
    kl = kl_divergence(p.base, q.base)
    return jnp.sum(kl, axis=tuple(range(-p.reinterpreted_batch_ndims, 0)))
  for pc in type(p).__mro__:
    for qc in type(q).__mro__:
      fn = _KL_REGISTRY.get((pc, qc))
      if fn is not None:
        return fn(p, q)
  raise NoAnalyticKL(f"No analytic KL for {type(p).__name__} ‖ {type(q).__name__}")


def mc_kl_divergence(p: Distribution, q: Distribution, key: Array,
                     n_samples: int = 1) -> Array:
  """Monte-Carlo KL(p ‖ q) = E_p[log p − log q] (used when analytic=False,
  e.g. SCALE's mixture posterior, reference ``sisua/models/scale.py:44-48``)."""
  z = p.sample(key, (n_samples,))
  return jnp.mean(p.log_prob(z) - q.log_prob(z), axis=0)


# --------------------------------------------------------------------------
# Distribution concat / stack — the `concat_distributions` capability
# --------------------------------------------------------------------------
def _tree_join(dists: Sequence[Distribution], join: Callable) -> Distribution:
  if len(dists) == 1:
    return dists[0]
  treedef = jax.tree_util.tree_structure(dists[0])
  for d in dists[1:]:
    if jax.tree_util.tree_structure(d) != treedef:
      raise ValueError("All distributions must share the same structure; got "
                       f"{treedef} vs {jax.tree_util.tree_structure(d)}")
  return jax.tree_util.tree_map(lambda *leaves: join(leaves), *dists)


def concat_distributions(dists: Sequence[Distribution], axis: int = 0
                         ) -> Distribution:
  """Merge per-minibatch distributions along a batch axis.

  Replaces ``odin.bay.concat_distributions`` used by the reference's
  ``predict`` loop (``sisua/models/single_cell_model.py:183-211``). Because our
  distributions are params-first pytrees this is a single tree_map.
  """
  return _tree_join(dists, lambda ls: jnp.concatenate(ls, axis=axis))


def stack_distributions(dists: Sequence[Distribution], axis: int = 0
                        ) -> Distribution:
  return _tree_join(dists, lambda ls: jnp.stack(ls, axis=axis))
