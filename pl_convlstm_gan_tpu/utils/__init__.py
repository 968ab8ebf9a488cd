from .visualization import (plot_sequence_comparison, plot_stations_vs_pred,
                            plot_training_curves)
from .profiling import Timer, benchmark_chained, benchmark_fn

__all__ = ["plot_sequence_comparison", "plot_stations_vs_pred",
           "plot_training_curves", "Timer", "benchmark_chained", "benchmark_fn"]
