"""sisua_tpu.ops — Pallas TPU kernels for the ELBO hot path.

The fused ZINB/NB log-likelihood row reduction lives here; it is routed into
the training objective automatically for shapes in its winning regime
(see ``sisua_tpu.models.objective._fast_log_prob``).
"""

from .zinb_pallas import (nb_log_prob_rowsum, pallas_available,
                          zinb_log_prob_rowsum)

__all__ = ["zinb_log_prob_rowsum", "nb_log_prob_rowsum", "pallas_available"]
