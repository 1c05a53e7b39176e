"""PeakVI — variational inference for single-cell chromatin accessibility
(Ashuach et al. 2022, scvi-tools `PEAKVI`).

No reference equivalent (the reference models ATAC with SCALE's
count-likelihood GMM latent, ``/root/reference/sisua/models/scale.py``);
PeakVI is the scvi-tools surface ATAC users expect, and the natural
companion to the `dataset10x` cell-atac catalog + `read_10x_mtx` peaks
ingestion:

  * accessibility is BINARIZED (x > 0) — both the encoder input and the
    likelihood target;
  * generative model: per-cell-per-peak Bernoulli with probability
    ``p = y · d · r`` where ``y = σ(decoder)`` is the latent-driven
    accessibility estimate, ``d = σ(depth_net(x))`` is a per-cell depth
    factor (sequencing-depth analogue of SCVI's library), and
    ``r = σ(ρ_j)`` is a learned per-peak region factor absorbing peak
    width/detectability;
  * standard normal latent prior, analytic KL.

TPU notes: the three factors compose in log-space
(``log p = logσ(ℓ_y)+logσ(ℓ_d)+logσ(ℓ_r)``) and convert to a single
Bernoulli logit once — one fused elementwise chain after the peak-wide
decoder matmul, no per-peak gathers; everything static-shape.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn import NetConf, parse_netconf
from ..rv import RVmeta, parse_rv
from .base import SingleCellModel, _flatten
from .module import Array, VAEModule, VAEOutput

__all__ = ["PEAKVI", "PEAKVIModule"]


def _compose_logits(ly: Array, ld: Optional[Array],
                    lr: Optional[Array]) -> Array:
  """Bernoulli logit of p = σ(ly)·σ(ld)·σ(lr) (missing factors = 1).
  log p sums stably via log-sigmoids; log(1−p) via expm1."""
  log_p = jax.nn.log_sigmoid(ly)
  if ld is not None:
    log_p = log_p + jax.nn.log_sigmoid(ld)
  if lr is not None:
    log_p = log_p + jax.nn.log_sigmoid(lr)
  log_p = jnp.minimum(log_p, -1e-7)  # keep 1−p > 0
  return log_p - jnp.log(-jnp.expm1(log_p))


class PEAKVIModule(VAEModule):
  """VAE engine specialization: binarizing preprocess, depth factor from a
  dedicated encoder, per-peak region factor, composed Bernoulli decode."""

  depth_conf: Optional[NetConf] = None

  def setup(self):
    super().setup()
    R = self.outputs[0].dim
    self.region_factor = self.param(
        "region_factor", nn.initializers.zeros, (R,))
    self.depth_net = self.depth_conf.build(name="depth_encoder")
    self.depth_head = nn.Dense(1, name="depth_logit")
    self.y_dense = nn.Dense(R, name="AccessibilityScale")

  def preprocess(self, x: Array) -> Array:
    return (x > 0).astype(jnp.float32)

  def depth_logit(self, x: Array, training: bool = False) -> Array:
    xb, _ = self.split_batch(x)
    return self.depth_head(
        self.depth_net(self.preprocess(xb), training=training))

  def decode(self, z: Array, library: Optional[Array] = None,
             training: bool = False, batch: Optional[Array] = None,
             depth_logit: Optional[Array] = None,
             region: bool = True):
    """``depth_logit=None`` (user decode()/denoising calls) drops the depth
    factor — the depth-free accessibility estimate; ``region=False`` also
    drops the per-peak factor."""
    if self.n_batch and batch is None:
      batch = jnp.full(z.shape[:-1] + (self.n_batch,), 1.0 / self.n_batch,
                       jnp.float32)
    h = self.decoders[0](self._with_batch(z, batch), training=training)
    ly = self.y_dense(h).astype(jnp.float32)
    logits = _compose_logits(ly, depth_logit,
                             self.region_factor if region else None)
    pX = self.output_heads[0](logits)
    pY = tuple(head(h) for head in self.output_heads[1:])
    return (pX,) + pY

  def __call__(self, x: Array, library: Optional[Array] = None,
               training: bool = False,
               sample_shape: Tuple[int, ...] = ()) -> VAEOutput:
    _, b = self.split_batch(x)
    qZ = self.encode(x, library=library, training=training)
    key = self.make_rng("sample")
    keys = jax.random.split(key, len(qZ))
    zs = tuple(q.sample(k, sample_shape) for q, k in zip(qZ, keys))
    z = self.reduce_latents(zs)
    dl = self.depth_logit(x, training=training)
    pX = self.decode(z, training=training, batch=b, depth_logit=dl)
    return VAEOutput(outputs=pX, latents=qZ, latent_samples=zs,
                     priors=self.latent_priors(library=library))


class PEAKVI(SingleCellModel):
  """Chromatin-accessibility VAE (scvi-tools `PEAKVI` surface).

  ``outputs[0]`` is coerced to a ``'bernoulli'`` likelihood over peaks; raw
  fragment/read counts are accepted — the model binarizes both the encoder
  input and the likelihood target internally (``_loss_targets``).

  ``get_accessibility_estimates(sco)`` returns the depth-free per-cell
  per-peak accessibility probability ``σ(y)·σ(ρ)`` at the latent posterior
  mean (scvi-tools' estimator; ``region=False`` for the region-normalized
  ``σ(y)`` alone).
  """

  module_cls = PEAKVIModule

  def __init__(self, outputs, depth=None, **kwargs):
    outputs = [parse_rv(o, f"output{i}")
               for i, o in enumerate(_flatten(outputs))]
    outputs[0] = outputs[0].replace(posterior="bernoulli", projection=False,
                                    kwargs=())
    kwargs.setdefault("log_norm", False)  # preprocess binarizes instead
    if depth is None:
      depth = kwargs.pop("depth_conf", NetConf((32,), name="depth"))
    super().__init__(outputs,
                     depth_conf=parse_netconf(depth, "depth"),
                     **kwargs)

  def _loss_targets(self, batch):
    targets = list(batch["inputs"])
    x = jnp.asarray(targets[0])
    targets[0] = (x > 0).astype(jnp.float32)
    return targets

  def get_accessibility_estimates(self, data, batch_size: int = 256,
                                  region: bool = True) -> np.ndarray:
    """Depth-free accessibility probabilities at the z posterior mean."""
    self._ensure_initialized()
    _, qZ = self.predict(data, batch_size=batch_size)
    qz = qZ[0] if isinstance(qZ, (tuple, list)) else qZ
    z_mean = jnp.asarray(qz.mean())
    variables = {"params": self._state.params}
    if self._state.batch_stats is not None:
      variables["batch_stats"] = self._state.batch_stats
    out = self.module.apply(variables, z_mean, training=False,
                            method=PEAKVIModule.decode, region=region,
                            rngs={"sample": self._next_key()})
    return np.asarray(out[0].mean())
