from .engine import Study, Trial, GridSampler, RandomSampler, TPESampler, create_study

__all__ = ["Study", "Trial", "GridSampler", "RandomSampler", "TPESampler", "create_study"]
