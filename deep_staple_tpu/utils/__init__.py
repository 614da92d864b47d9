from .logging import MetricWriter, get_global_idx, log_data_parameter_stats, log_class_dices

__all__ = ["MetricWriter", "get_global_idx", "log_data_parameter_stats", "log_class_dices"]
