from .engine import Study, Trial, GridSampler, RandomSampler, TPESampler, create_study
from .optuna_export import export_optuna_sqlite

__all__ = ["Study", "Trial", "GridSampler", "RandomSampler", "TPESampler",
           "create_study", "export_optuna_sqlite"]
