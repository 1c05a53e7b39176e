"""SCALE / SCALAR — scATAC VAEs with Gaussian-mixture latent.

Reference semantics (``/root/reference/sisua/models/scale.py``):
  * ``SCALE`` (:13-49): the latent posterior is coerced to 'mixgaus' with
    ``n_components=10`` and ``analytic=False`` — the KL is estimated by
    Monte-Carlo from the forward reparameterized sample (mixtures have no
    closed-form KL to the unit-normal prior).
  * ``SCALAR`` (:52-60): SCALE + SISUA's semi-supervised masked label heads.
"""

from __future__ import annotations

from ..rv import RVmeta, parse_rv
from .base import SingleCellModel, _flatten

__all__ = ["SCALE", "SCALAR"]


def _coerce_mixture_latents(latents, n_components: int):
  if latents is None:
    latents = RVmeta(10, "mixgaus", True, "latents",
                     (("n_components", int(n_components)),))
  lat = []
  for i, z in enumerate(_flatten(latents)):
    z = parse_rv(z, f"latent{i}")
    if z.posterior not in ("mixgaus", "mixtril", "mdn"):
      kw = dict(z.kwargs)
      kw.setdefault("n_components", int(n_components))
      z = z.replace(posterior="mixgaus", kwargs=tuple(sorted(kw.items())))
    lat.append(z)
  return tuple(lat)


class SCALE(SingleCellModel):

  def __init__(self, outputs, latents=None, n_components: int = 10, **kwargs):
    kwargs["analytic"] = False  # MC KL — mixtures have no closed form
    super().__init__(outputs,
                     latents=_coerce_mixture_latents(latents, n_components),
                     **kwargs)


class SCALAR(SCALE):
  """SCALE + semi-supervised (masked) label recombination."""

  mask_outputs = True

  def __init__(self, outputs, **kwargs):
    outputs = _flatten(outputs)
    assert len(outputs) >= 2, "SCALAR requires ≥2 outputs (atac + labels)"
    super().__init__(outputs, **kwargs)
