"""sisua_tpu.dist — params-first pytree distributions for TPU VAEs.

Replaces the reference's TFP/odin.bay distribution layer (see
``SURVEY.md`` §2.4 "RVmeta posterior vocabulary") with pure-JAX pytree
dataclasses that cross jit/vmap/pjit boundaries and concatenate across
minibatches with a tree_map.
"""

from .base import (
    Distribution,
    Independent,
    NoAnalyticKL,
    concat_distributions,
    kl_divergence,
    mc_kl_divergence,
    register_kl,
    stack_distributions,
)
from .continuous import (
    Gamma,
    LogNormal,
    MultivariateNormalDiag,
    MultivariateNormalTriL,
    NonzeroMaskedDeterministic,
    Normal,
    VectorDeterministic,
)
from .count import (
    Bernoulli,
    NegativeBinomial,
    NegativeBinomialDisp,
    NegativeBinomialDispLog,
    NegativeBinomialLog,
    NegativeBinomialMixture,
    Poisson,
    ZeroInflated,
)
from .discrete import Categorical, OneHotCategorical
from .mixture import MixtureSameFamily

__all__ = [
    "Distribution", "Independent", "NoAnalyticKL", "concat_distributions",
    "kl_divergence", "mc_kl_divergence", "register_kl", "stack_distributions",
    "Gamma", "LogNormal", "MultivariateNormalDiag", "MultivariateNormalTriL",
    "Normal", "VectorDeterministic", "NonzeroMaskedDeterministic",
    "Bernoulli", "NegativeBinomial",
    "NegativeBinomialDisp", "NegativeBinomialDispLog",
    "NegativeBinomialLog",
    "NegativeBinomialMixture", "Poisson",
    "ZeroInflated", "Categorical",
    "OneHotCategorical", "MixtureSameFamily",
]
