"""MultiVI — joint RNA + chromatin-accessibility variational inference
(Ashuach et al. 2023, scvi-tools `MULTIVI`).

No reference equivalent (the reference handles ATAC with SCALE only,
``/root/reference/sisua/models/scale.py``, and never models two omics
jointly outside the multitask-label SISUA path); this completes the
scvi-tools multi-omic trio next to ``TotalVI`` (RNA+protein) and
``PEAKVI`` (ATAC). Semantics:

  * per-modality encoders: q_r(z | rna) over log1p counts and
    q_a(z | atac) over binarized peaks; the JOINT posterior mixes them as
    the average latent — z = Σ w_m z_m with modality weights w_m, i.e.
    a diag normal with μ = Σ w_m μ_m and σ² = Σ w_m² σ_m² — reducing to
    the single observed modality for unpaired cells;
  * RNA decode: the SCVI path (library latent with per-batch prior,
    softmax scale, per-gene dispersion, optional zero inflation);
  * ATAC decode: the PeakVI path (Bernoulli with per-cell depth factor ×
    per-peak region factor composed in log space);
  * alignment: a Jeffreys (symmetric KL) penalty between q_r and q_a for
    cells where both modalities are observed (scvi-tools' default
    ``modality_penalty='Jeffreys'``), weighted by ``modality_penalty``
    and applied OUTSIDE the β/KL-warm-up scaling;
  * mosaic (unpaired) data needs no extra plumbing: a cell whose modality
    row is all-zero is treated as missing that modality — its likelihood
    term is gated off (``objective.elbo_terms(output_masks=...)``), its
    encoder branch gets zero posterior weight, and the alignment penalty
    skips it.

TPU notes: both decoders are wide static matmuls feeding fused
elementwise likelihoods (NB via the Pallas-routed log-space path, Bernoulli
via one log-sigmoid chain); modality weights are (B, 1) broadcasts, so the
mosaic gating adds no gathers and no dynamic shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .. import dist as D
from ..nn import DistributionDense, NetConf, parse_netconf
from ..rv import RVmeta, parse_rv
from .base import SingleCellModel, _flatten
from .module import Array, VAEModule, VAEOutput
from .peakvi import _compose_logits

__all__ = ["MULTIVI", "MULTIVIModule"]


def _modality_weights(m_r: Array, m_a: Array) -> Tuple[Array, Array]:
  """(B, 1) mixture weights from observed-modality indicators; a cell with
  neither modality (all-zero row in both) falls back to an even mix."""
  total = m_r + m_a
  safe = jnp.maximum(total, 1.0)
  w_r = jnp.where(total > 0, m_r / safe, 0.5)
  w_a = jnp.where(total > 0, m_a / safe, 0.5)
  return w_r[:, None], w_a[:, None]


class MULTIVIModule(VAEModule):
  """Two-encoder mixture-of-experts module; input x = concat(rna, atac)."""

  n_genes: int = 0
  n_regions: int = 0
  clip_library: float = 1e3
  depth_conf: Optional[NetConf] = None

  def setup(self):
    super().setup()
    assert self.n_genes > 0 and self.n_regions > 0
    assert len(self.encoder_confs) == 2 and len(self.decoder_confs) == 2, \
        "MULTIVI builds (rna, atac) encoder/decoder pairs"
    zrv = self.latents[0]
    # modality-specific posteriors over the SAME latent space; the base
    # latent_heads stay unused (flax creates no params for uncalled heads)
    self.z_head_rna = DistributionDense(
        zrv.replace(name="z_rna"), compute_dtype=self.compute_dtype,
        name="latent_head_z_rna")
    self.z_head_atac = DistributionDense(
        zrv.replace(name="z_atac"), compute_dtype=self.compute_dtype,
        name="latent_head_z_atac")
    # RNA heads: SCVI single-dispersion log-space decode
    dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
    self.px_scale = nn.Dense(self.n_genes, dtype=dt, name="RnaScale")
    self.px_r_single = self.param("px_r_single", nn.initializers.zeros,
                                  (self.n_genes,))
    if self.outputs[0].is_zero_inflated:
      self.px_dropout = nn.Dense(self.n_genes, dtype=dt, name="RnaDropout")
    # ATAC heads: PeakVI composed-Bernoulli decode
    self.region_factor = self.param("region_factor", nn.initializers.zeros,
                                    (self.n_regions,))
    self.y_dense = nn.Dense(self.n_regions, dtype=dt,
                            name="AccessibilityScale")
    self.depth_net = self.depth_conf.build(name="depth_encoder")
    self.depth_head = nn.Dense(1, name="depth_logit")

  # ---- input handling -----------------------------------------------------
  def split_batch(self, x):
    nb = self.n_batch
    main_dim = self.n_genes + self.n_regions
    if nb and x.shape[-1] == main_dim + nb:
      return x[..., :main_dim], x[..., main_dim:]
    assert x.shape[-1] == main_dim, (
        f"input width {x.shape[-1]} is neither {main_dim} nor "
        f"{main_dim + nb} (n_batch={nb})")
    if not nb:
      return x, None
    b = jnp.full(x.shape[:-1] + (nb,), 1.0 / nb, jnp.float32)
    return x, b

  def _split_modalities(self, x: Array) -> Tuple[Array, Array]:
    return x[..., :self.n_genes], x[..., self.n_genes:]

  # ---- encode -------------------------------------------------------------
  def encode(self, x: Array, library: Optional[Array] = None,
             training: bool = False) -> Tuple[D.Distribution, ...]:
    """Returns (q_joint, q_library, q_rna, q_atac); the trailing pair are
    ELBO internals (alignment penalty), excluded from the model's public
    ``encode`` like TotalVI's background posterior."""
    x, b = self.split_batch(x)
    rna, atac = self._split_modalities(x)
    xr = self._with_batch(jnp.log1p(rna), b)
    xa = self._with_batch((atac > 0).astype(jnp.float32), b)
    h_r = self.encoders[0](xr, training=training)
    h_a = self.encoders[1](xa, training=training)
    q_r = self.z_head_rna(h_r)
    q_a = self.z_head_atac(h_a)
    # library latent (SCVI) from the RNA branch
    q_l = self.latent_heads[1](h_r)
    m_r = (jnp.sum(rna, axis=-1) > 0).astype(jnp.float32)
    m_a = (jnp.sum(atac, axis=-1) > 0).astype(jnp.float32)
    w_r, w_a = _modality_weights(m_r, m_a)
    # mixture-of-experts joint: z = w_r·z_r + w_a·z_a over the modality
    # posteriors ('diag' → MultivariateNormalDiag)
    mu = w_r * q_r.loc + w_a * q_a.loc
    var = w_r**2 * q_r.scale_diag**2 + w_a**2 * q_a.scale_diag**2
    q_joint = D.MultivariateNormalDiag(
        loc=mu, scale_diag=jnp.sqrt(jnp.maximum(var, 1e-8)))
    return q_joint, q_l, q_r, q_a

  def latent_priors(self, library: Optional[Array] = None):
    z_prior = self.latents[0].create_prior()
    lib_prior = self.latents[1].create_prior()
    if library is not None:
      mean, var = jnp.split(library, 2, axis=-1)
      lib_prior = D.Independent(D.Normal(loc=mean, scale=jnp.sqrt(var)), 1)
    # trailing None priors: q_rna/q_atac carry no KL of their own — their
    # alignment cost is the Jeffreys penalty in MULTIVI._extra_loss
    return z_prior, lib_prior, None, None

  # ---- decode -------------------------------------------------------------
  def decode(self, latent_samples, library: Optional[Array] = None,
             training: bool = False, batch: Optional[Array] = None,
             depth_logit: Optional[Array] = None, region: bool = True):
    z, l = latent_samples[0], latent_samples[1]
    l = jnp.clip(l, 0.0, self.clip_library)
    if self.n_batch and batch is None:
      batch = jnp.full(z.shape[:-1] + (self.n_batch,), 1.0 / self.n_batch,
                       jnp.float32)
    # RNA: SCVI log-space decode (cf. module.SCVIModule.decode)
    d_r = self.decoders[0](self._with_batch(z, batch), training=training)
    log_scale = jnp.maximum(-16.118095,  # log 1e-7
                            jax.nn.log_softmax(
                                self.px_scale(d_r).astype(jnp.float32),
                                axis=-1))
    px_r = jnp.exp(self.px_r_single)[None].astype(jnp.float32)
    nb = D.NegativeBinomialDispLog(log_loc=l + log_scale, disp=px_r)
    if self.outputs[0].is_zero_inflated:
      pX = D.Independent(D.ZeroInflated(
          count_distribution=nb,
          gate_logits=self.px_dropout(d_r).astype(jnp.float32)), 1)
    else:
      pX = D.Independent(nb, 1)
    # ATAC: PeakVI composed-Bernoulli decode
    d_a = self.decoders[1](self._with_batch(z, batch), training=training)
    ly = self.y_dense(d_a).astype(jnp.float32)
    logits = _compose_logits(ly, depth_logit,
                             self.region_factor if region else None)
    pA = self.output_heads[1](logits)
    return pX, pA

  def depth_logit(self, x: Array, training: bool = False) -> Array:
    x, _ = self.split_batch(x)
    _, atac = self._split_modalities(x)
    return self.depth_head(
        self.depth_net((atac > 0).astype(jnp.float32), training=training))

  def __call__(self, x: Array, library: Optional[Array] = None,
               training: bool = False,
               sample_shape: Tuple[int, ...] = ()) -> VAEOutput:
    _, b = self.split_batch(x)
    qZ = self.encode(x, library=library, training=training)
    q_joint, q_l, q_r, q_a = qZ
    key = self.make_rng("sample")
    k1, k2 = jax.random.split(key)
    z = q_joint.sample(k1, sample_shape)
    l = q_l.sample(k2, sample_shape)
    dl = self.depth_logit(x, training=training)
    pX = self.decode((z, l), library=library, training=training, batch=b,
                     depth_logit=dl)
    # modality posteriors ride the latent tuples with None priors (zero
    # KL); samples are their means — only the distributions are consumed,
    # by the Jeffreys penalty in MULTIVI._extra_loss
    return VAEOutput(outputs=pX,
                     latents=qZ,
                     latent_samples=(z, l, q_r.mean(), q_a.mean()),
                     priors=self.latent_priors(library=library))


class MULTIVI(SingleCellModel):
  """Joint RNA+ATAC model (scvi-tools `MULTIVI` surface).

  ``outputs = (rna RVmeta, atac RVmeta)``: the RNA posterior must be a
  count likelihood ('nbd'/'zinbd'/'nb'/'zinb'); the ATAC output is coerced
  to a Bernoulli over binarized peaks (raw fragment counts accepted — the
  loss binarizes internally, like PEAKVI).

  Mosaic data: cells with an all-zero RNA or ATAC row are treated as
  missing that modality (gated likelihood, single-expert posterior) — mix
  scRNA-only, scATAC-only, and paired multiome cells in one matrix pair.
  """

  module_cls = MULTIVIModule

  def __init__(self,
               outputs,
               latents=None,
               library=None,
               encoder=None,
               depth=None,
               clip_library: float = 1e3,
               modality_penalty: float = 1.0,
               **kwargs):
    outputs = [parse_rv(o, f"output{i}")
               for i, o in enumerate(_flatten(outputs))]
    assert len(outputs) == 2, "MULTIVI takes exactly (rna, atac) outputs"
    assert outputs[0].posterior in ("zinbd", "nbd", "zinb", "nb"), \
        f"rna posterior must be a count likelihood, got {outputs[0].posterior}"
    outputs[0] = outputs[0].replace(projection=False)
    outputs[1] = outputs[1].replace(posterior="bernoulli", projection=False,
                                    kwargs=())
    if isinstance(latents, (tuple, list)) and len(latents) == 2 \
        and library is None:  # metamodel reconstruction passes both back
      latents, library = latents
    if latents is None:
      latents = RVmeta(16, "diag", True, "latents")
    latents = parse_rv(latents, "latents")
    if library is None:
      library = RVmeta(1, "normal", True, "library")
    library = parse_rv(library, "library")
    if encoder is None:
      encoder = (NetConf((128, 128), batchnorm=True, dropout=0.1,
                         name="encoder_rna"),
                 NetConf((128, 128), batchnorm=True, dropout=0.1,
                         name="encoder_atac"))
    encoder = tuple(parse_netconf(e, f"encoder{i}")
                    for i, e in enumerate(_flatten(encoder)))
    if len(encoder) == 1:
      encoder = (encoder[0], encoder[0].replace(name="encoder_atac"))
    decoder = kwargs.pop("decoder", None)
    if decoder is None:
      decoder = (NetConf((128, 128), batchnorm=True, name="decoder_rna"),
                 NetConf((128, 128), batchnorm=True, name="decoder_atac"))
    decoder = tuple(parse_netconf(d, f"decoder{i}")
                    for i, d in enumerate(_flatten(decoder)))
    if len(decoder) == 1:
      decoder = (decoder[0], decoder[0].replace(name="decoder_atac"))
    if depth is None:
      depth = kwargs.pop("depth_conf", NetConf((32,), name="depth"))
    kwargs.pop("reduce_latent", None)
    kwargs.pop("n_genes", None)
    kwargs.pop("n_regions", None)
    super().__init__(tuple(outputs), latents=(latents, library),
                     encoder=encoder, decoder=decoder,
                     reduce_latent="first",
                     n_genes=outputs[0].dim,
                     n_regions=outputs[1].dim,
                     clip_library=float(clip_library),
                     depth_conf=parse_netconf(depth, "depth"),
                     **kwargs)
    self.modality_penalty = float(modality_penalty)
    self._init_kwargs_for_save["modality_penalty"] = float(modality_penalty)

  @property
  def uses_library(self) -> bool:
    return True

  def encode(self, x, library=None, training: bool = False,
             sample_shape: Tuple[int, ...] = ()):
    """(q(z|x), q(l|x)) — the modality posteriors q_rna/q_atac are ELBO
    internals (alignment penalty), not embeddings."""
    res = super().encode(x, library=library, training=training,
                         sample_shape=sample_shape)
    return res[:self.n_latents] if isinstance(res, tuple) else res

  def _module_input(self, inputs):
    assert len(inputs) >= 2, "MULTIVI batches need (rna, atac) inputs"
    parts = [jnp.asarray(inputs[0]), jnp.asarray(inputs[1])]
    if self.n_batch and len(inputs) >= 3 \
        and inputs[-1].shape[-1] == self.n_batch:
      parts.append(jnp.asarray(inputs[-1]))
    return jnp.concatenate(parts, axis=-1)

  def _serving_source_indices(self, n_sources: int):
    idx = [0, 1]
    if self.n_batch and n_sources >= 3:
      idx.append(n_sources - 1)
    return idx

  def _loss_targets(self, batch):
    targets = list(batch["inputs"])
    a = jnp.asarray(targets[1])
    targets[1] = (a > 0).astype(jnp.float32)
    return targets

  def _output_masks(self, batch):
    rna = jnp.asarray(batch["inputs"][0])
    atac = jnp.asarray(batch["inputs"][1])
    m_r = (jnp.sum(rna, axis=-1) > 0).astype(jnp.float32)
    m_a = (jnp.sum(atac, axis=-1) > 0).astype(jnp.float32)
    return [m_r, m_a]

  def _latent_masks(self, batch):
    """The library latent is encoded from the RNA branch: its KL is gated
    by the RNA-observed mask so ATAC-only cells (all-zero RNA rows) don't
    pull the library encoder toward the per-batch prior from non-data
    (scvi-tools restricts library inference/KL to RNA-observed cells;
    ADVICE r4). Joint z and the zero-KL modality posteriors stay ungated."""
    m_r, _ = self._output_masks(batch)
    return [None, m_r, None, None]

  def _extra_loss(self, params, aux_params, out: VAEOutput, batch, key,
                  training: bool):
    """Jeffreys alignment penalty ½·[KL(q_r‖q_a) + KL(q_a‖q_r)] over cells
    with BOTH modalities observed, weighted by ``modality_penalty`` —
    deliberately outside the β schedule (scvi-tools keeps the modality
    penalty un-annealed). Normalized by the PAIRED-cell count, not the
    batch size: a batch mean would silently dilute the alignment pressure
    by the paired fraction on heavily mosaic data (90% unpaired → 10×
    weaker for the same ``modality_penalty``; ADVICE r4)."""
    if self.modality_penalty <= 0:
      return None
    q_r, q_a = out.latents[2], out.latents[3]
    jeff = 0.5 * (D.kl_divergence(q_r, q_a) + D.kl_divergence(q_a, q_r))
    m_r, m_a = self._output_masks(batch)
    m = m_r * m_a
    pen = self.modality_penalty * (
        jnp.sum(jeff * m) / jnp.maximum(jnp.sum(m), 1.0))
    return pen, {"modality_penalty": pen}

  def _dummy_batch(self, batch_size: int = 2):
    x = jnp.zeros((batch_size, self.outputs[0].dim + self.outputs[1].dim),
                  jnp.float32)
    lib = jnp.ones((batch_size, 2), jnp.float32)
    return x, lib

  def get_accessibility_estimates(self, data, batch_size: int = 256,
                                  region: bool = True) -> np.ndarray:
    """Depth-free per-cell per-peak accessibility probability at the joint
    latent posterior mean (PeakVI's estimator over the joint latent)."""
    self._ensure_initialized()
    _, qZ = self.predict(data, batch_size=batch_size)
    z_mean = jnp.asarray(qZ[0].mean())
    l_mean = jnp.asarray(qZ[1].mean())
    variables = {"params": self._state.params}
    if self._state.batch_stats is not None:
      variables["batch_stats"] = self._state.batch_stats
    out = self.module.apply(variables, (z_mean, l_mean), training=False,
                            method=MULTIVIModule.decode, region=region,
                            rngs={"sample": self._next_key()})
    return np.asarray(out[1].mean())