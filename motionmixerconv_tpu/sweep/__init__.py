from .engine import Study, Trial, GridSampler, RandomSampler, create_study

__all__ = ["Study", "Trial", "GridSampler", "RandomSampler", "create_study"]
