"""SOLO — doublet detection via simulated doublets on a trained latent
(Bernstein et al. 2020, Cell Systems; scvi-tools ``SOLO``).

Beyond-reference surface: the reference has no QC story for doublets (its
loaders take the upstream filtering as given, e.g.
``/root/reference/sisua/data/data_loader/pbmc8k.py``); SOLO is the
scvi-tools companion every SCVI user runs before analysis, and it composes
directly with this framework's model zoo:

  1. take a TRAINED generative model (SCVI family — anything exposing the
     framework's ``encode``/``predict`` latent surface);
  2. simulate doublets by summing random pairs of observed cells (their
     count profiles add; library roughly doubles) — the key insight that
     turns doublet detection into supervised classification without any
     labeled doublets;
  3. embed observed cells and simulated doublets with the FROZEN encoder
     (latent posterior mean ⊕ log library — the two signals scvi-tools
     feeds its classifier);
  4. train a small MLP softmax classifier singlet-vs-doublet on the
     embeddings and score every observed cell.

TPU notes: the classifier is a jitted optax loop over static-shape
minibatches of (z ⊕ log-library) features — tiny matmuls that compile in
seconds; the expensive part (encoding) rides the existing batched predict
path, so device residency / transfer compression are inherited. Everything
is seeded and deterministic given (model, data, seed).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

__all__ = ["SOLO"]


class _Classifier(nn.Module):
  hidden: Tuple[int, ...] = (64, 32)

  @nn.compact
  def __call__(self, h, training: bool = False):
    for w in self.hidden:
      h = nn.relu(nn.Dense(w)(h))
      h = nn.Dropout(0.2, deterministic=not training)(h)
    return nn.Dense(2)(h)  # [singlet, doublet] logits


def _simulate_doublets(x: np.ndarray, n_doublets: int,
                       rng: np.random.Generator) -> np.ndarray:
  """Sum ``n_doublets`` random (distinct) cell pairs — scvi-tools'
  ``create_doublets``: count profiles add."""
  n = x.shape[0]
  i = rng.integers(0, n, n_doublets)
  j = rng.integers(0, n - 1, n_doublets)
  j = np.where(j >= i, j + 1, j)  # distinct partner, uniform over pairs
  return x[i] + x[j]


class SOLO:
  """Doublet classifier over a trained generative model's latent space.

  >>> scvi = SCVI(RVmeta(G, "zinbd", name="rna")).fit(sco)
  >>> solo = SOLO.from_scvi_model(scvi)
  >>> solo.fit(sco)                       # simulates doublets internally
  >>> proba = solo.predict_doublet_proba(sco)   # (n_cells,) P(doublet)
  >>> keep = proba < 0.5

  ``doublet_ratio`` controls how many doublets are simulated per observed
  cell (scvi-tools default 2). The generative model is FROZEN — only the
  small classifier trains here.
  """

  def __init__(self, model, hidden: Tuple[int, ...] = (64, 32),
               seed: int = 0):
    self.model = model
    self.classifier = _Classifier(tuple(int(h) for h in hidden))
    self.seed = int(seed)
    self._params = None
    self._feat_mean = None
    self._feat_std = None

  @classmethod
  def from_scvi_model(cls, model, **kwargs) -> "SOLO":
    """scvi-tools' constructor name; any SingleCellModel with a latent
    works."""
    return cls(model, **kwargs)

  # ---------------------------------------------------------------- embed
  def _embed(self, x: np.ndarray, batch_size: int = 512) -> np.ndarray:
    """Latent posterior mean ⊕ log1p(library) under the frozen encoder."""
    zs = []
    for s in range(0, x.shape[0], batch_size):
      xb = np.asarray(x[s:s + batch_size], np.float32)
      qZ = self.model.encode(xb)
      qz = qZ[0] if isinstance(qZ, (tuple, list)) else qZ
      zs.append(np.asarray(qz.mean(), np.float32))
    z = np.concatenate(zs, 0)
    log_lib = np.log1p(np.asarray(x, np.float32).sum(-1, keepdims=True))
    return np.concatenate([z, log_lib], -1)

  # ------------------------------------------------------------------ fit
  def fit(self,
          data,
          doublet_ratio: float = 2.0,
          epochs: int = 60,
          batch_size: int = 256,
          learning_rate: float = 1e-3,
          valid_fraction: float = 0.1,
          verbose: bool = False) -> "SOLO":
    x = np.asarray(data.numpy() if hasattr(data, "numpy") else data,
                   np.float32)
    rng = np.random.default_rng(self.seed)
    n_doublets = int(round(doublet_ratio * x.shape[0]))
    doublets = _simulate_doublets(x, n_doublets, rng)
    feats = np.concatenate([self._embed(x), self._embed(doublets)], 0)
    labels = np.concatenate([np.zeros(x.shape[0], np.int32),
                             np.ones(n_doublets, np.int32)])
    # standardize features (the log-library column dominates otherwise)
    self._feat_mean = feats.mean(0)
    self._feat_std = feats.std(0) + 1e-6
    feats = (feats - self._feat_mean) / self._feat_std
    perm = rng.permutation(feats.shape[0])
    feats, labels = feats[perm], labels[perm]
    n_valid = max(int(valid_fraction * feats.shape[0]), batch_size) \
        if valid_fraction > 0 else 0
    fv, lv = feats[:n_valid], labels[:n_valid]
    ft, lt = feats[n_valid:], labels[n_valid:]

    key = jax.random.PRNGKey(self.seed)
    key, k_init = jax.random.split(key)
    params = self.classifier.init(
        {"params": k_init}, jnp.zeros((1, feats.shape[1]), jnp.float32),
        training=False)["params"]
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    def loss_fn(p, h, y, k):
      logits = self.classifier.apply({"params": p}, h, training=True,
                                     rngs={"dropout": k})
      ll = jax.nn.log_softmax(logits, -1)
      return -jnp.mean(jnp.take_along_axis(ll, y[:, None], -1))

    @jax.jit
    def step(p, s, h, y, k):
      loss, g = jax.value_and_grad(loss_fn)(p, h, y, k)
      updates, s = tx.update(g, s, p)
      return optax.apply_updates(p, updates), s, loss

    @jax.jit
    def eval_loss(p, h, y):
      logits = self.classifier.apply({"params": p}, h, training=False)
      ll = jax.nn.log_softmax(logits, -1)
      return -jnp.mean(jnp.take_along_axis(ll, y[:, None], -1))

    steps_per_epoch = max(ft.shape[0] // batch_size, 1)
    best = (np.inf, params)
    for epoch in range(int(epochs)):
      order = np.random.default_rng(self.seed + 1 + epoch).permutation(
          ft.shape[0])
      for it in range(steps_per_epoch):
        sl = order[it * batch_size:(it + 1) * batch_size]
        if sl.shape[0] < batch_size:
          break
        key, k = jax.random.split(key)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(ft[sl]), jnp.asarray(lt[sl]), k)
      if n_valid:
        vl = float(eval_loss(params, jnp.asarray(fv), jnp.asarray(lv)))
        if vl < best[0]:
          best = (vl, jax.tree_util.tree_map(lambda a: a, params))
        if verbose:
          print(f"[solo] epoch {epoch}: valid loss {vl:.4f}")
    self._params = best[1] if n_valid else params
    return self

  # ------------------------------------------------------------- inference
  def predict_doublet_proba(self, data,
                            batch_size: int = 512) -> np.ndarray:
    """P(doublet) per observed cell, shape ``(n_cells,)``."""
    assert self._params is not None, "call fit() first"
    x = np.asarray(data.numpy() if hasattr(data, "numpy") else data,
                   np.float32)
    feats = (self._embed(x, batch_size) - self._feat_mean) / self._feat_std
    logits = self.classifier.apply({"params": self._params},
                                   jnp.asarray(feats), training=False)
    return np.asarray(jax.nn.softmax(logits, -1))[:, 1]

  def predict(self, data, soft: bool = True, threshold: float = 0.5):
    """scvi-tools surface: soft probabilities (default) or a boolean
    is-doublet call at ``threshold``."""
    proba = self.predict_doublet_proba(data)
    return proba if soft else proba >= threshold
