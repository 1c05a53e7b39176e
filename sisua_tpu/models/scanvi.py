"""SCANVI — semi-supervised single-cell annotation (Xu et al. 2021).

The scvi-tools companion surface to SCVI/LDVAE (no reference equivalent —
the reference's semi-supervision is protein-head multitasking,
``/root/reference/sisua/models/vae.py:19-44``; SCANVI is the canonical
*cell-type* semi-supervised model users of that ecosystem expect):

  * the SCVI generative model for counts — two encoders (z, library),
    library prior from per-batch dataset statistics, direct-param decode
    ``px_rate = exp(L)·softmax(scale)``;
  * an amortized classifier ``q(y|z₁)`` over cell types, trained on the
    labeled fraction (the framework's semi-supervised mask) with weight
    ``alpha`` (scvi-tools' ``classification_ratio``, default 50);
  * a latent hierarchy ``z₂ → (z₁, y)``: ``q(z₂|z₁,y)`` and ``p(z₁|z₂,y)``
    replace the unit-normal z₁ prior. For LABELED cells the hierarchy terms
    evaluate at the true ``y``; for UNLABELED cells ``y`` is marginalized
    under ``q(y|z₁)`` plus a ``KL(q(y|z₁) ‖ Uniform)`` term — the M1+M2
    semi-supervised VAE objective (Kingma et al. 2014) specialized to
    counts.

TPU notes: the marginalization is a single batched pass with a leading
class axis ``[C, B, ·]`` (no per-class Python loop, no dynamic shapes), so
XLA tiles the small hierarchy matmuls alongside the gene-wide decoder; all
control flow is static.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import dist as D
from ..nn import DistributionDense, NetConf, parse_netconf
from ..rv import RVmeta, parse_rv
from .base import _flatten
from .module import Array, VAEOutput
from .scvi import SCVI, SCVIModule

__all__ = ["SCANVI", "SCANVIModule"]


class SCANVIModule(SCVIModule):
  """SCVI topology + latent classifier + (z₂ | z₁, y) hierarchy.

  ``outputs[1]`` must be a ``'onehot'`` RV over cell types; its head is the
  classifier ``q(y|z₁)`` (projected from the classifier trunk on the z₁
  sample, NOT from the gene decoder's hidden state). ``hierarchy_terms``
  returns the per-class penalty ``KL(q(z₂|z₁,y)‖p(z₂)) − E[log p(z₁|z₂,y)]``
  with a leading class axis; ``__call__`` stashes it in ``aux_outputs`` so
  the model's ``_extra_loss`` consumes it without a second forward pass
  (and so flax initialization materializes the hierarchy parameters)."""

  classifier_conf: Optional[NetConf] = None
  encoder_z2_conf: Optional[NetConf] = None
  decoder_z1_conf: Optional[NetConf] = None

  def setup(self):
    super().setup()
    z_rv = self.latents[0]
    self.classifier_net = self.classifier_conf.build(name="classifier")
    self.u_encoder = self.encoder_z2_conf.build(name="encoder_z2")
    self.u_head = DistributionDense(z_rv.replace(name="z2"),
                                    name="latent_head_z2")
    self.pz1_net = self.decoder_z1_conf.build(name="decoder_z1")
    self.pz1_head = DistributionDense(z_rv.replace(name="pz1"),
                                      name="prior_head_z1")

  @property
  def n_labels(self) -> int:
    return self.outputs[1].dim

  def latent_priors(self, library: Optional[Array] = None):
    priors = list(super().latent_priors(library=library))
    priors[0] = None  # z₁'s prior is the hierarchy p(z₁|z₂,y), not N(0,I)
    return tuple(priors)

  def _label_heads(self, d: Array, z: Array, training: bool = False):
    h = self.classifier_net(z, training=training)
    return tuple(head(h) for head in self.output_heads[1:])

  def classify(self, z: Array, training: bool = False) -> D.Distribution:
    """q(y|z₁) from a latent point (used by ``SCANVI.predict_labels`` on
    the posterior mean for deterministic annotation)."""
    return self._label_heads(None, z, training=training)[0]

  def hierarchy_terms(self, z1: Array, training: bool = False) -> Array:
    """``[C, *batch]`` per-class penalty for every candidate label:
    ``KL(q(z₂|z₁,y)‖N(0,I)) − E_{q(z₂)}[log p(z₁|z₂,y)]`` (one MC draw of
    z₂, analytic z₂ KL). Batched over the class axis — one pass, no loop."""
    C = self.n_labels
    lead = z1.shape[:-1]
    eye = jnp.eye(C, dtype=z1.dtype)
    z1b = jnp.broadcast_to(z1[None], (C,) + z1.shape)            # [C,*,dz]
    yb = jnp.broadcast_to(eye.reshape((C,) + (1,) * len(lead) + (C,)),
                          (C,) + lead + (C,))                    # [C,*,C]
    hu = self.u_encoder(jnp.concatenate([z1b, yb], axis=-1),
                        training=training)
    qu = self.u_head(hu)                                         # q(z₂|z₁,y)
    u = qu.sample(self.make_rng("sample"))
    kl_u = D.kl_divergence(qu, self.latents[0].create_prior())   # [C,*]
    pd = self.pz1_net(jnp.concatenate([u, yb], axis=-1),
                      training=training)
    pz1 = self.pz1_head(pd)                                      # p(z₁|z₂,y)
    return kl_u - pz1.log_prob(z1b)

  def __call__(self, x: Array, library: Optional[Array] = None,
               training: bool = False,
               sample_shape: Tuple[int, ...] = ()) -> VAEOutput:
    out = super().__call__(x, library=library, training=training,
                           sample_shape=sample_shape)
    penalty = self.hierarchy_terms(out.latent_samples[0], training=training)
    return out.replace(aux_outputs=(penalty,))


class SCANVI(SCVI):
  """Semi-supervised cell-type annotation over the SCVI generative model.

  ``outputs = [rna_rv('zinbd'|'nbd'), celltype_rv]`` — the second RV is
  coerced to a ``'onehot'`` posterior over ``n_labels`` classes (soft /
  GMM-probabilized labels are accepted by its log-prob, so
  ``ProbabilisticEmbedding`` outputs plug straight in). The data pipeline's
  per-example mask (``fit(labels_percent=…)``) decides which cells count as
  labeled; unlabeled cells train through classifier marginalization.

  ``alpha`` is the classification weight on labeled cells (scvi-tools
  ``classification_ratio``; default 50).

  ``predict_labels(data)`` returns amortized per-cell class probabilities
  ``q(y|z̄₁)`` evaluated at the posterior mean.
  """

  mask_outputs = True
  module_cls = SCANVIModule
  #: experimenter/CLI output selection: SCANVI supervises the cell-type
  #: omic only (not every label omic the dataset carries)
  supervised_omics = ("celltype",)

  def __init__(self,
               outputs,
               labels: Optional[RVmeta] = None,
               classifier=None,
               encoder_z2=None,
               decoder_z1=None,
               alpha: float = 50.0,
               **kwargs):
    outputs = [parse_rv(o, f"output{i}")
               for i, o in enumerate(_flatten(outputs))]
    if labels is not None:
      outputs = [outputs[0], parse_rv(labels, "celltype")]
    assert len(outputs) >= 2, (
        "SCANVI needs the transcriptomic RV plus a cell-type label RV "
        "(pass as outputs=[rna, celltype] or labels=celltype)")
    # the label head is categorical by construction
    y = outputs[1]
    if y.posterior != "onehot":
      y = y.replace(posterior="onehot", kwargs=())
    outputs[1] = y.replace(projection=True)
    # metamodel reconstruction passes the assembled *_conf kwargs back in
    if classifier is None:
      classifier = kwargs.pop("classifier_conf",
                              NetConf((32,), dropout=0.1, name="classifier"))
    if encoder_z2 is None:
      encoder_z2 = kwargs.pop("encoder_z2_conf",
                              NetConf((32,), name="encoder_z2"))
    if decoder_z1 is None:
      decoder_z1 = kwargs.pop("decoder_z1_conf",
                              NetConf((32,), name="decoder_z1"))
    super().__init__(outputs, alpha=float(alpha),
                     classifier_conf=parse_netconf(classifier, "classifier"),
                     encoder_z2_conf=parse_netconf(encoder_z2, "encoder_z2"),
                     decoder_z1_conf=parse_netconf(decoder_z1, "decoder_z1"),
                     **kwargs)

  @property
  def n_labels(self) -> int:
    return self.outputs[1].dim

  # ------------------------------------------------------------------ loss
  def _extra_loss(self, params, aux_params, out: VAEOutput, batch, key,
                  training: bool):
    """The hierarchical z₁ term of the SCANVI ELBO (replaces the standard
    ``KL(q(z₁)‖N(0,I))``, which ``latent_priors`` zeroed out):

      labeled:    log q(z₁|x) + penalty(y_true)
      unlabeled:  log q(z₁|x) + Σ_y q(y|z₁)·penalty(y)
                  + KL(q(y|z₁) ‖ Uniform)

    All terms are per-example; MC sample dims (if any) average out. The
    labeled classification loss itself rides the standard masked-label
    likelihood path in ``objective.compute_loss`` (α·mask·log q(y|z₁))."""
    penalty = jnp.moveaxis(out.aux_outputs[0], 0, -1)       # [*lead, C]
    z1 = out.latent_samples[0]
    lq = out.latents[0].log_prob(z1)                        # [*lead]
    log_qy = jax.nn.log_softmax(out.outputs[1].logits, axis=-1)
    qy = jnp.exp(log_qy)
    B = z1.shape[-2]
    y = jnp.asarray(batch["inputs"][1], jnp.float32) if len(
        batch["inputs"]) > 1 else None
    mask = batch.get("mask")
    if not training or mask is None or y is None:
      m = jnp.ones((B,), jnp.float32)
    else:
      m = jnp.asarray(mask, jnp.float32).reshape(B)
    if y is None:
      # inference-style batch without labels: everything marginalizes
      pen_lab = jnp.zeros(penalty.shape[:-1], jnp.float32)
      m = jnp.zeros((B,), jnp.float32)
    else:
      pen_lab = jnp.sum(y * penalty, axis=-1)               # [*lead]
    kl_y = jnp.sum(qy * (log_qy + jnp.log(float(self.n_labels))), axis=-1)
    pen_unlab = jnp.sum(qy * penalty, axis=-1) + kl_y
    term = lq + m * pen_lab + (1.0 - m) * pen_unlab         # [*lead]
    extra = term.ndim - 1
    if extra > 0:
      term = jnp.mean(term, axis=tuple(range(extra)))
    loss = jnp.mean(term)
    return loss, {"klqp_hierarchy": loss,
                  "kl_y": jnp.mean(kl_y)}

  # ------------------------------------------------------------- inference
  def predict_labels(self, data, batch_size: int = 256,
                     hard: bool = False) -> np.ndarray:
    """Amortized cell-type posterior ``q(y|z̄₁)`` at the z₁ posterior mean.

    Returns ``[n_cells, n_labels]`` probabilities, or class indices when
    ``hard=True`` (scvi-tools' ``SCANVI.predict`` surface)."""
    self._ensure_initialized()
    _, qZ = self.predict(data, batch_size=batch_size)
    qz1 = qZ[0] if isinstance(qZ, (tuple, list)) else qZ
    z_mean = jnp.asarray(qz1.mean())
    variables = {"params": self._state.params}
    if self._state.batch_stats is not None:
      variables["batch_stats"] = self._state.batch_stats
    pY = self.module.apply(variables, z_mean, training=False,
                           method=SCANVIModule.classify,
                           rngs={"sample": self._next_key()})
    probs = np.asarray(pY.probs())
    return probs.argmax(-1) if hard else probs
