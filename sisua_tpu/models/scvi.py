"""SCVI — single-cell variational inference (Lopez et al. 2018).

Reference semantics (``/root/reference/sisua/models/scvi.py:19-175``):
  * two encoders — z and library l — with latents
    ``[z_rv, RVmeta(1, 'normal', 'Library')]``; the library prior is
    ``Normal(local_mean, sqrt(local_var))`` built per batch from dataset
    statistics; library samples clipped to [0, clip_library=1e3];
  * the main output must be 'zinbd' | 'nbd' with ``projection=False``: the
    reference's decode computes ``px_rate = exp(L)·clip(softmax(scale),
    1e-7, 1-1e-7)``, ``px_r = exp(raw)`` when dispersion='full', gate
    logits raw — here the same likelihood decodes fully in LOG space
    (``log μ = L + log_softmax(scale)``, ``log θ = raw``; see
    ``module.SCVIModule.decode`` — no exp→log round-trip (B, D)
    intermediates in the bandwidth-bound wide regime);
  * extra semi-supervised label heads decode from the shared hidden ``d``.

The module-level compute lives in ``SCVIModule``
(``sisua_tpu/models/module.py``); this wrapper wires the spec coercions.
"""

from __future__ import annotations

from ..nn import NetConf, parse_netconf
from ..rv import RVmeta, parse_rv
from .base import SingleCellModel, _flatten
from .module import SCVIModule

__all__ = ["SCVI"]


class SCVI(SingleCellModel):

  module_cls = SCVIModule

  def __init__(self,
               outputs,
               latents=None,
               library=None,
               encoder=None,
               encoder_l=None,
               clip_library: float = 1e3,
               **kwargs):
    outputs = [parse_rv(o, f"output{i}")
               for i, o in enumerate(_flatten(outputs))]
    assert outputs[0].posterior in ("zinbd", "nbd"), (
        "scVI only supports transcriptomic distribution 'zinbd' or 'nbd', "
        f"given: {outputs[0].posterior}")
    self.dispersion = kwargs.pop(
        "dispersion", dict(outputs[0].kwargs).get("dispersion", "full"))
    self.inflation = kwargs.pop(
        "inflation", dict(outputs[0].kwargs).get("inflation", "full"))
    kwargs.pop("reduce_latent", None)  # always 'first' for SCVI
    # metamodel reconstruction passes the already-assembled tuples back in
    if isinstance(latents, (tuple, list)) and len(latents) == 2 \
        and library is None:
      latents, library = latents
    if isinstance(encoder, (tuple, list)) and len(encoder) == 2 \
        and encoder_l is None:
      encoder, encoder_l = encoder
    outputs[0] = outputs[0].replace(projection=False)
    if latents is None:
      latents = RVmeta(10, "diag", True, "latents")
    latents = parse_rv(latents, "latents")
    if library is None:
      library = RVmeta(1, "normal", True, "library")
    library = parse_rv(library, "library")
    if encoder is None:
      encoder = NetConf((64, 64), batchnorm=True, dropout=0.1, name="encoder")
    if encoder_l is None:
      encoder_l = NetConf((64,), batchnorm=True, dropout=0.1,
                          name="encoder_l")
    super().__init__(tuple(outputs), latents=(latents, library),
                     encoder=(parse_netconf(encoder, "encoder"),
                              parse_netconf(encoder_l, "encoder_l")),
                     reduce_latent="first",
                     clip_library=float(clip_library),
                     dispersion=self.dispersion,
                     inflation=self.inflation,
                     **kwargs)

  @property
  def uses_library(self) -> bool:
    return True
