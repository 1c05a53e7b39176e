"""sisua_tpu.analysis — posterior evaluation, metrics, disentanglement,
training callbacks, and multi-model comparison (reference ``sisua/analysis``).
"""

from .criticizer import Criticizer, discretize_factors
from .imputation import (correlation_scores, imputation_mean_score,
                         imputation_score, imputation_std_score,
                         plot_imputation)
from .latent import (clustering_scores, multi_label_adj_Rindex,
                     plot_distance_heatmap, plot_latents_binary,
                     plot_latents_protein_pairs, streamline_classifier,
                     unsupervised_clustering_accuracy)
from .posterior import Posterior
from .results_sheet import ResultsSheet
from .sc_metrics import (ClusteringScores, CorrelationScores,
                         ImputationError, NegativeLogLikelihood,
                         SingleCellMetric)
from .sc_monitor import (HeatmapPlot, LearningCurves, ScatterPlot,
                         SingleCellMonitor)

__all__ = [
    "Posterior", "ResultsSheet", "Criticizer", "discretize_factors",
    "imputation_score", "imputation_mean_score", "imputation_std_score",
    "correlation_scores", "plot_imputation", "clustering_scores",
    "unsupervised_clustering_accuracy", "multi_label_adj_Rindex",
    "streamline_classifier", "plot_distance_heatmap",
    "plot_latents_protein_pairs", "plot_latents_binary",
    "SingleCellMetric", "NegativeLogLikelihood", "ImputationError",
    "CorrelationScores", "ClusteringScores", "SingleCellMonitor",
    "LearningCurves", "ScatterPlot", "HeatmapPlot",
]
