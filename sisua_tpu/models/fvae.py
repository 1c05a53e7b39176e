"""FVAE / SemiFVAE — FactorVAE (Kim & Mnih 2018) disentanglement family.

Reference semantics (``/root/reference/sisua/models/fvae.py:9-18``): pure
mixins of `[odin]` ``factorVAE``/``SemifactorVAE``. The capability re-built
here: the ELBO gains a γ-weighted total-correlation (TC) term estimated by an
adversarial density-ratio discriminator

    TC(z) ≈ E_q(z)[log D(z)₀ − log D(z)₁]

where D is trained to separate joint latent samples from dimension-wise
permuted ones (the permute-dims trick). The discriminator is a second
parameter group (``TrainState.aux_params``) trained with its own Adam inside
the same jitted step — both updates compile into one executable.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from .base import SingleCellModel, _flatten
from .module import VAEOutput
from .vae import SISUA

__all__ = ["FVAE", "SemiFVAE"]


class _TCDiscriminator(nn.Module):
  """MLP density-ratio discriminator (FactorVAE paper: deep leaky-ReLU)."""

  hidden: Tuple[int, ...] = (256, 256, 256)

  @nn.compact
  def __call__(self, z):
    h = z
    for i, u in enumerate(self.hidden):
      h = nn.Dense(u, name=f"dense{i}")(h)
      h = nn.leaky_relu(h, 0.2)
    return nn.Dense(2, name="logits")(h)  # [joint, permuted]


def _permute_dims(z: jax.Array, key: jax.Array) -> jax.Array:
  """Independently shuffle each latent dimension across the batch."""
  def perm_col(k, col):
    return jax.random.permutation(k, col)
  keys = jax.random.split(key, z.shape[-1])
  return jnp.stack([perm_col(k, z[:, i]) for i, k in enumerate(keys)], -1)


class FVAE(SingleCellModel):
  """FactorVAE: β-VAE + γ·TC adversarial penalty."""

  def __init__(self, outputs, gamma: float = 6.0,
               discriminator_units: Tuple[int, ...] = (256, 256, 256),
               discriminator_lr: float = 1e-4, **kwargs):
    self._disc_units = tuple(discriminator_units)
    self._disc_lr = float(discriminator_lr)
    self.discriminator = _TCDiscriminator(hidden=self._disc_units)
    super().__init__(outputs, gamma=gamma, **kwargs)
    self._init_kwargs_for_save.update(
        discriminator_units=list(self._disc_units),
        discriminator_lr=self._disc_lr)

  # -------------------------------------------------------------- aux group
  def _latent_dim(self) -> int:
    if self.reduce_latent == "concat":
      return sum(z.dim for z in self.latents)
    return self.latents[0].dim

  def _init_aux(self, params, key):
    return self.discriminator.init(key, jnp.zeros((2, self._latent_dim())))[
        "params"]

  def _reduced_z(self, out: VAEOutput) -> jax.Array:
    zs = [z.reshape(-1, z.shape[-1]) for z in out.latent_samples]
    return jnp.concatenate(zs, -1) if (
        self.reduce_latent == "concat" and len(zs) > 1) else zs[0]

  # --------------------------------------------------------------- TC terms
  def _extra_loss(self, params, aux_params, out: VAEOutput, batch, key,
                  training: bool):
    if aux_params is None or not training:
      return None
    z = self._reduced_z(out)
    logits = self.discriminator.apply({"params": aux_params}, z)
    # density-ratio TC estimate; discriminator params are constants here
    tc = jnp.mean(logits[:, 0] - logits[:, 1])
    return self.gamma * tc, {"tc": tc}

  def _aux_step(self, state, batch, key, metrics):
    """One discriminator update on fresh latents (permute-dims trick)."""
    if state.aux_params is None:
      return state, metrics
    x = batch["inputs"][0]
    lib = batch.get("library")
    variables = {"params": state.params}
    if state.batch_stats is not None:
      variables["batch_stats"] = state.batch_stats
    # decorrelate from the generator step first: split(key, 3)[0] equals
    # split(key, 2)[0], so without fold_in the discriminator would score
    # latents drawn with the SAME reparameterization noise the generator
    # gradient just used — FactorVAE prescribes an independent draw
    k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 0xD15C), 3)
    out = self.module.apply(variables, x, rngs={"sample": k1, "dropout": k3},
                            training=False, **self._apply_kwargs(lib))
    z = jax.lax.stop_gradient(self._reduced_z(out))
    z_perm = _permute_dims(z, k2)

    def disc_loss(dp):
      lj = jax.nn.log_softmax(
          self.discriminator.apply({"params": dp}, z), -1)
      lp = jax.nn.log_softmax(
          self.discriminator.apply({"params": dp}, z_perm), -1)
      return -0.5 * (jnp.mean(lj[:, 0]) + jnp.mean(lp[:, 1]))

    dloss, grads = jax.value_and_grad(disc_loss)(state.aux_params)
    updates, new_aux_opt = self._aux_tx.update(grads, state.aux_opt_state,
                                               state.aux_params)
    new_aux = optax.apply_updates(state.aux_params, updates)
    metrics = dict(metrics)
    metrics["disc_loss"] = dloss
    return state.replace(aux_params=new_aux,
                         aux_opt_state=new_aux_opt), metrics

  def make_train_step_core(self, tx):
    self._ensure_initialized()
    self._aux_tx = optax.adam(self._disc_lr)
    if self._state.aux_opt_state is None:
      self._state = self._state.replace(
          aux_opt_state=self._aux_tx.init(self._state.aux_params))
    return super().make_train_step_core(tx)


class SemiFVAE(FVAE):
  """Semi-supervised FactorVAE: TC penalty + masked label heads."""

  mask_outputs = True

  def __init__(self, outputs, **kwargs):
    outputs = _flatten(outputs)
    assert len(outputs) >= 2, "SemiFVAE requires ≥2 outputs"
    super().__init__(outputs, **kwargs)
