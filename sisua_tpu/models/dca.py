"""DeepCountAutoencoder (Eraslan et al. 2019).

Reference semantics (``/root/reference/sisua/models/dca.py:13-28``): a
deterministic-latent count autoencoder — the latent posterior is coerced to
the deterministic 'linear' (or 'relu') head, so the KL term vanishes and the
objective reduces to the count reconstruction log-likelihood (NB/ZINB) or
plain MSE.
"""

from __future__ import annotations

from ..rv import RVmeta, parse_rv
from .base import SingleCellModel, _flatten

__all__ = ["DeepCountAutoencoder"]


class DeepCountAutoencoder(SingleCellModel):

  def __init__(self, outputs, latents=None, latent_dim: int = 10, **kwargs):
    if latents is None:
      latents = RVmeta(int(latent_dim), "linear", True, "latents")
    else:
      latents = [parse_rv(z, f"latent{i}")
                 for i, z in enumerate(_flatten(latents))]
      latents = tuple(
          z if z.is_deterministic else z.replace(posterior="linear")
          for z in latents)
    super().__init__(outputs, latents=latents, **kwargs)
