from .io_utils import load_data_from_csv, save_data_to_R, save_data_to_csv
from .others import (UnitTimer, dimension_reduction,
                     filtering_experiment_path, profile_trace,
                     thresholding_by_sparsity)
from .plot_utils import plot_monitoring_epoch, plot_series_statistics
from .visualization import (Visualizer, fast_scatter,
                            plot_evaluate_classifier,
                            plot_evaluate_reconstruction,
                            plot_evaluate_regressor, save_figures)

__all__ = [
    "save_data_to_csv", "save_data_to_R", "load_data_from_csv",
    "filtering_experiment_path", "dimension_reduction",
    "thresholding_by_sparsity", "UnitTimer", "profile_trace",
    "plot_series_statistics", "plot_monitoring_epoch",
    "Visualizer", "fast_scatter", "plot_evaluate_classifier",
    "plot_evaluate_regressor", "plot_evaluate_reconstruction",
    "save_figures",
]
