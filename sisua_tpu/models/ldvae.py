"""LDVAE — linearly-decoded variational autoencoder (Svensson et al. 2020).

Beyond-reference surface: the reference ships no linear-decoder family, but
scvi-tools users migrating here expect one (``LinearSCVI``). Semantics: the
inference network and count likelihood are exactly SCVI's
(``/root/reference/sisua/models/scvi.py:19-175`` — two encoders, library
prior from per-batch dataset statistics, ``px_rate = exp(L)·softmax(scale)``),
but the decoder stack is the *identity*, so the ``px_scale`` logits are one
linear map from the latent (plus the batch one-hot under ``n_batch``). Each
latent dimension then carries an interpretable per-gene loading vector —
a probabilistic count-model analogue of PCA/factor analysis — recoverable
via :meth:`get_loadings`.

Implementation notes (TPU): ``decoder=NetConf(units=())`` builds the
zero-layer MLP (identity), so the only decoder-side parameters are the
existing SCVI heads (``MeanScale`` / ``Dispersion`` / ``DropoutLogits``
Dense layers) applied directly to ``z`` — one wide (latent → genes) matmul
that XLA tiles straight onto the MXU; nothing else changes, so every SCVI
path (device-resident training, fused likelihood, mesh sharding,
checkpoints) is inherited unchanged. Dispersion defaults to the gene-level
``'single'`` (LinearSCVI's default); per-cell ``'full'`` dispersion would
route through another Dense on ``z`` and stays available but is no longer
"the" loadings matrix.
"""

from __future__ import annotations

import numpy as np

from ..nn import NetConf
from .scvi import SCVI

__all__ = ["LDVAE"]


class LDVAE(SCVI):
  """SCVI with a linear decoder and interpretable per-gene loadings."""

  def __init__(self, outputs, **kwargs):
    # the linear decoder is the family's definition — ignore any user/
    # checkpoint-roundtrip decoder spec and force the identity stack
    kwargs.pop("decoder", None)
    kwargs.setdefault("dispersion", "single")
    super().__init__(outputs,
                     decoder=NetConf(units=(), name="decoder_identity"),
                     **kwargs)

  def get_loadings(self, var_names=None):
    """Per-gene loadings of each latent dimension: the ``MeanScale`` kernel
    rows belonging to ``z`` (batch one-hot columns excluded), shape
    ``(n_genes, n_latent)``. With ``var_names`` (or recorded metadata from
    :meth:`set_metadata`) returns a pandas DataFrame indexed by gene."""
    self._ensure_initialized()
    kernel = np.asarray(self.params["MeanScale"]["kernel"], np.float32)
    zdim = int(self.latents[0].dim)
    loadings = kernel[:zdim, :].T  # (genes, z)
    if var_names is None:
      main = self.outputs[0].name or "transcriptomic"
      meta = self.metadata.get(main) or self.metadata.get("transcriptomic")
      var_names = meta
    if var_names is not None and len(var_names) == loadings.shape[0]:
      import pandas as pd
      return pd.DataFrame(
          loadings, index=list(var_names),
          columns=[f"Z{i}" for i in range(loadings.shape[1])])
    return loadings
