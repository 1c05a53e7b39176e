"""VAE, SISUA, MISA — the core β-VAE family.

Reference semantics (``/root/reference/sisua/models/vae.py``):
  * ``VAE`` (:15-16): plain β-VAE with a count likelihood — pure inheritance.
  * ``SISUA`` (:19-44): multitask semi-supervised VAE. First output = ZINB
    transcriptomic reconstruction; extra outputs = protein/label heads whose
    log-likelihoods are weighted by α and masked by the per-example
    Bernoulli(labels_percent) mask from the data pipeline. Paper config:
    ``RVmeta(rna, 'zinbd'|'zinb')`` + ``RVmeta(adt, 'onehot'|'nbd'|'nb')``.
  * ``MISA`` (:47-98): SISUA with mixture label posteriors — label RVs are
    coerced to 'mixnb'/'mixgaussian'/'mdn' with ``n_components`` (default 2)
    and optional ``zero_inflated`` injected into their kwargs.
"""

from __future__ import annotations

from typing import Sequence, Union

from ..rv import RVmeta, parse_rv
from .base import SingleCellModel, _flatten

__all__ = ["VAE", "SISUA", "MISA"]


class VAE(SingleCellModel):
  """Unsupervised β-VAE over count likelihoods."""


class SISUA(SingleCellModel):
  """SemI-SUpervised generative Autoencoder: masked multitask VAE."""

  mask_outputs = True

  def __init__(self, outputs, **kwargs):
    outputs = _flatten(outputs)
    assert len(outputs) >= 2, \
        "SISUA requires ≥2 outputs (transcriptomic + ≥1 label omic)"
    super().__init__(outputs, **kwargs)


_MIXTURE_COERCE = {
    # any-label posterior → its mixture analogue
    "nb": "mixnb", "nbd": "mixnb", "zinb": "mixnb", "zinbd": "mixnb",
    "normal": "mixgaus", "gaus": "mixgaus", "gaussian": "mixgaus",
    "diag": "mixgaus", "onehot": "onehot",  # categorical already a mixture
    # already-mixture posteriors stay put (idempotent re-coercion on load)
    "mixnb": "mixnb", "mixgaus": "mixgaus", "mdn": "mdn",
    "mixtril": "mixtril",
}


class MISA(SISUA):
  """MIxture-posterior SISUA: label heads become mixture distributions
  (reference vae.py:47-98)."""

  def __init__(self, outputs, n_components: int = 2,
               zero_inflated: bool = False, **kwargs):
    outputs = [parse_rv(o, f"output{i}")
               for i, o in enumerate(_flatten(outputs))]
    coerced = [outputs[0]]
    for rv in outputs[1:]:
      post = _MIXTURE_COERCE.get(rv.posterior, "mdn")
      kw = dict(rv.kwargs)
      kw.setdefault("n_components", int(n_components))
      if post == "mixnb":
        kw.setdefault("zero_inflated", bool(zero_inflated))
      if post == "onehot":
        kw.pop("n_components", None)
      coerced.append(rv.replace(posterior=post,
                                kwargs=tuple(sorted(kw.items()))))
    super().__init__(tuple(coerced), **kwargs)
