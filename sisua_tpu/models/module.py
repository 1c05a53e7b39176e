"""Core variational-autoencoder flax module (the BetaVAE engine).

This is the TPU-native re-design of the reference's `[odin] BetaVAE` +
``SingleCellModel`` forward path (``/root/reference/sisua/models/
single_cell_model.py:119-151``): a pure flax module mapping

    batch dict {x, library?} ──encode──► q(Z|X) ──sample──► decode ──► p(X|Z)

and returning a ``VAEOutput`` pytree carrying *distributions* (params-first —
see ``sisua_tpu.dist``), latent samples, and per-latent priors, so the ELBO is
a pure function over the output (``objective.py``). Everything is static-shape
and jit-friendly; per-batch stochasticity comes from flax rng streams
('sample', 'dropout').

Multi-encoder / multi-latent conventions (reference parity):
  * encoder i feeds latent head i (extra heads reuse the last encoder) —
    SCVI's (z, l) double-encoder layout (``scvi.py:33-106``).
  * ``reduce_latent``: 'concat' (default) | 'first' | 'sum' | 'mean' over
    latent samples before decoding (``single_cell_model.py:74-101``).
  * the first input is the main (transcriptomic) omic; it is ``log1p``-ed when
    ``log_norm`` (``single_cell_model.py:119-139``). Additional inputs are
    *labels* — they supervise extra output heads, never enter the encoder.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from .. import dist as D
from ..nn import DistributionDense, NetConf
from ..rv import RVmeta

__all__ = ["VAEOutput", "VAEModule", "SCVIModule"]

Array = jax.Array


class VAEOutput(struct.PyTreeNode):
  """Forward-pass result: everything the ELBO / analysis needs."""

  outputs: Tuple[D.Distribution, ...]        # p(X_i | Z)
  latents: Tuple[D.Distribution, ...]        # q(Z_j | X)
  latent_samples: Tuple[Array, ...]          # reparameterized draws, aligned
  priors: Tuple[Optional[D.Distribution], ...]  # p(Z_j); None → unit normal
  # optional extra reconstruction heads a topology wants in its loss but not
  # in predict/analysis (e.g. scScope's intermediate recurrent cycles);
  # consumed by the model's _extra_loss hook
  aux_outputs: Tuple = ()


class VAEModule(nn.Module):
  """β-VAE engine over RVmeta/NetConf specs. Subclass for custom topologies."""

  outputs: Tuple[RVmeta, ...]
  latents: Tuple[RVmeta, ...]
  encoder_confs: Tuple[NetConf, ...]
  decoder_confs: Tuple[NetConf, ...]
  log_norm: bool = True
  reduce_latent: str = "concat"
  # 'bfloat16' → head matmuls on the MXU in bf16 (raw distribution params
  # are cast back to float32 inside DistributionDense); None → exact float32
  compute_dtype: Optional[str] = None
  # scVI-style batch-covariate conditioning (scvi-tools semantics, beyond
  # the reference): when n_batch > 0 the input may carry a trailing batch
  # one-hot block, concatenated into both the encoder input and the decoder
  # input so the latent is encouraged to be batch-free. Inputs without the
  # block (e.g. user encode()/decode() calls) condition on the uniform
  # batch prior, keeping every parameter shape identical.
  n_batch: int = 0

  def setup(self):
    self.encoders = [c.build(name=f"encoder{i}")
                     for i, c in enumerate(self.encoder_confs)]
    self.decoders = [c.build(name=f"decoder{i}")
                     for i, c in enumerate(self.decoder_confs)]
    self.latent_heads = [
        DistributionDense(rv, compute_dtype=self.compute_dtype,
                          name=f"latent_head_{rv.name or i}")
        for i, rv in enumerate(self.latents)]
    self.output_heads = [
        DistributionDense(rv, compute_dtype=self.compute_dtype,
                          name=f"output_head_{rv.name or i}")
        for i, rv in enumerate(self.outputs)]

  # ---- pieces -------------------------------------------------------------
  def preprocess(self, x: Array) -> Array:
    return jnp.log1p(x) if self.log_norm else x

  def split_batch(self, x: Array):
    """Split off the trailing batch one-hot block when present; fall back
    to the uniform batch prior so widths (→ parameter shapes) never vary."""
    nb = self.n_batch
    if not nb:
      return x, None
    main_dim = self.outputs[0].dim
    if x.shape[-1] == main_dim + nb:
      return x[..., :main_dim], x[..., main_dim:]
    assert x.shape[-1] == main_dim, (
        f"input width {x.shape[-1]} is neither {main_dim} nor "
        f"{main_dim + nb} (n_batch={nb})")
    b = jnp.full(x.shape[:-1] + (nb,), 1.0 / nb, jnp.float32)
    return x, b

  def _with_batch(self, h: Array, b: Optional[Array]) -> Array:
    if b is None:
      return h
    b = jnp.broadcast_to(b, h.shape[:-1] + (b.shape[-1],))
    return jnp.concatenate([h, b.astype(h.dtype)], axis=-1)

  def encode(self, x: Array, library: Optional[Array] = None,
             training: bool = False) -> Tuple[D.Distribution, ...]:
    x, b = self.split_batch(x)
    h = self._with_batch(self.preprocess(x), b)
    hs = [enc(h, training=training) for enc in self.encoders]
    qZ = tuple(
        head(hs[min(i, len(hs) - 1)])
        for i, head in enumerate(self.latent_heads))
    return qZ

  def reduce_latents(self, zs: Sequence[Array]) -> Array:
    if len(zs) == 1:
      return zs[0]
    if self.reduce_latent == "concat":
      return jnp.concatenate(zs, axis=-1)
    if self.reduce_latent == "first":
      return zs[0]
    if self.reduce_latent == "sum":
      return sum(zs)
    if self.reduce_latent == "mean":
      return sum(zs) / len(zs)
    raise ValueError(f"unknown reduce_latent: {self.reduce_latent}")

  def decode(self, z: Array, library: Optional[Array] = None,
             training: bool = False,
             batch: Optional[Array] = None) -> Tuple[D.Distribution, ...]:
    if self.n_batch and batch is None:
      batch = jnp.full(z.shape[:-1] + (self.n_batch,), 1.0 / self.n_batch,
                       jnp.float32)
    d = self.decoders[0](self._with_batch(z, batch), training=training)
    return tuple(head(d) for head in self.output_heads)

  def latent_priors(self, library: Optional[Array] = None
                    ) -> Tuple[Optional[D.Distribution], ...]:
    return tuple(rv.create_prior() for rv in self.latents)

  # ---- full pass ------------------------------------------------------------
  def __call__(self, x: Array, library: Optional[Array] = None,
               training: bool = False,
               sample_shape: Tuple[int, ...] = ()) -> VAEOutput:
    _, b = self.split_batch(x)
    qZ = self.encode(x, library=library, training=training)
    key = self.make_rng("sample")
    keys = jax.random.split(key, len(qZ))
    zs = tuple(q.sample(k, sample_shape) for q, k in zip(qZ, keys))
    z = self.reduce_latents(zs)
    pX = self.decode(z, library=library, training=training, batch=b)
    return VAEOutput(outputs=pX, latents=qZ, latent_samples=zs,
                     priors=self.latent_priors(library=library))


class SCVIModule(VAEModule):
  """scVI topology (reference ``sisua/models/scvi.py:19-175``), TPU-native.

  Differences from the generic engine, matching the reference exactly:
    * two encoders — z and library l; latent spec = (z_rv, library_rv(1,
      'normal')); the library prior is ``Normal(local_mean, sqrt(local_var))``
      built per-batch from dataset statistics (``scvi.py:88-106``).
    * only z is decoded (``reduce_latent → first``); library samples are
      clipped to [0, clip_library], then ``px_rate = exp(L)·softmax(scale)``
      with scale clipped to [1e-7, 1-1e-7]; ``px_r = exp(raw)`` when
      dispersion='full'; gate logits raw (``scvi.py:117-166``).
    * the main output head receives final parameters (projection=False).
    * extra (semi-supervised) heads decode from the shared hidden ``d``
      (``scvi.py:170``).
  """

  dispersion: str = "full"      # 'full' → per-cell-per-gene; 'single' shared
  inflation: str = "full"
  clip_library: float = 1e3

  def setup(self):
    super().setup()
    n_dims = self.outputs[0].dim
    # the gene-dim-wide decoder heads are the dominant matmuls — run them in
    # the compute dtype (bf16 on MXU); results are cast back to float32 in
    # decode() before softmax/exp so the likelihood math stays exact
    dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
    self.px_scale = nn.Dense(n_dims, dtype=dt, name="MeanScale")
    if self.outputs[0].is_zero_inflated and self.inflation == "full":
      self.px_dropout = nn.Dense(n_dims, dtype=dt, name="DropoutLogits")
    if self.dispersion == "full":
      self.px_r = nn.Dense(n_dims, dtype=dt, name="Dispersion")
    else:
      self.px_r_single = self.param(
          "px_r_single", nn.initializers.zeros, (n_dims,))

  def latent_priors(self, library: Optional[Array] = None):
    priors = [rv.create_prior() for rv in self.latents]
    if library is not None:
      mean, var = jnp.split(library, 2, axis=-1)
      priors[-1] = D.Independent(
          D.Normal(loc=mean, scale=jnp.sqrt(var)), 1)
    return tuple(priors)

  def decode(self, latent_samples, library: Optional[Array] = None,
             training: bool = False, batch: Optional[Array] = None):
    # latent_samples here is the tuple (z, l) — SCVI needs both separately,
    # so reduce_latents is bypassed via __call__ override below.
    z, l = latent_samples
    l = jnp.clip(l, 0.0, self.clip_library)
    if self.n_batch and batch is None:
      batch = jnp.full(z.shape[:-1] + (self.n_batch,), 1.0 / self.n_batch,
                       jnp.float32)
    d = self.decoders[0](self._with_batch(z, batch), training=training)
    px_scale_logits = self.px_scale(d).astype(jnp.float32)
    zi = self.outputs[0].is_zero_inflated and self.inflation == "full"
    if self.dispersion == "full":
      # Per-cell-per-gene dispersion decodes fully in LOG space, like the
      # single-dispersion branch below: log μ = L + log_softmax(scale)
      # (floored at log 1e-7) and log θ = the raw Dispersion matmul output
      # — NegativeBinomialLog. The linear construction exponentiated both
      # (exp(L)·softmax, exp(Dense)) only for the likelihood to take their
      # logs again; in the bandwidth-bound wide regime each exp→log round
      # trip was a (B, D) HBM intermediate, and the fused kernel now reads
      # log θ raw (constrained=False exponentiates it in VMEM).
      log_scale = jnp.maximum(-16.118095,  # log 1e-7
                              jax.nn.log_softmax(px_scale_logits, axis=-1))
      log_rate = l + log_scale
      log_r = self.px_r(d).astype(jnp.float32)
      nb = D.NegativeBinomialLog(log_loc=log_rate, log_disp=log_r)
      if zi:
        gate = self.px_dropout(d).astype(jnp.float32)
        pX = D.Independent(D.ZeroInflated(count_distribution=nb,
                                          gate_logits=gate), 1)
      else:
        pX = D.Independent(nb, 1)
    else:
      # Single dispersion decodes fully in LOG space:
      #   log μ = L + log_softmax(scale) (floored at log 1e-7, the linear
      #   path's clip), carried by NegativeBinomialDispLog — the exp·
      #   softmax → log(μ+eps) round trip of the linear path never
      #   happens, so between the MeanScale matmul and the fused
      #   likelihood kernel exactly ONE (B, D) intermediate (the NB
      #   logits) is materialized.
      # The dispersion stays a per-gene (1, D) row — never broadcast to
      # (B, D): the fused kernel broadcasts it in VMEM and reduces its
      # gradient in-kernel (2.2× faster fwd+bwd at 1024×33k,
      # benchmarks/results_kernel_probe.md). Built directly (the head's
      # flat-concat protocol needs same-shape params).
      log_scale = jnp.maximum(-16.118095,  # log 1e-7
                              jax.nn.log_softmax(px_scale_logits, axis=-1))
      log_rate = l + log_scale
      px_r = jnp.exp(self.px_r_single)[None].astype(jnp.float32)
      nb = D.NegativeBinomialDispLog(log_loc=log_rate, disp=px_r)
      if zi:
        gate = self.px_dropout(d).astype(jnp.float32)
        pX = D.Independent(D.ZeroInflated(count_distribution=nb,
                                          gate_logits=gate), 1)
      else:
        pX = D.Independent(nb, 1)
    pY = self._label_heads(d, z, training=training)
    return (pX,) + pY

  def _label_heads(self, d: Array, z: Array, training: bool = False):
    """Extra (semi-supervised) heads decode from the shared hidden ``d``
    (reference scvi.py:170). SCANVI reroutes these through its latent-space
    classifier (``scanvi.py``)."""
    return tuple(head(d) for head in self.output_heads[1:])

  def __call__(self, x: Array, library: Optional[Array] = None,
               training: bool = False,
               sample_shape: Tuple[int, ...] = ()) -> VAEOutput:
    _, b = self.split_batch(x)
    qZ = self.encode(x, library=library, training=training)
    key = self.make_rng("sample")
    keys = jax.random.split(key, len(qZ))
    zs = tuple(q.sample(k, sample_shape) for q, k in zip(qZ, keys))
    pX = self.decode(zs, library=library, training=training, batch=b)
    return VAEOutput(outputs=pX, latents=qZ, latent_samples=zs,
                     priors=self.latent_priors(library=library))
