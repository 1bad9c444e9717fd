from . import constants
from .windows import (
    WindowedCorpus,
    batch_starts,
    find_indices_256,
    find_indices_srnn,
    gather_windows,
)
from .h36m import H36MDataset, read_csv_floats
from .amass import AMASSDataset
from .ais import AISDataset, canonicalize_frames, ewm_mean
from .cmu import (
    CMUDataset,
    define_actions_cmu,
    load_data_cmu,
    load_data_cmu_3d,
)
from .normalization import (
    normalization_stats,
    normalize_data,
    revert_output_format,
    unNormalizeData,
)
from . import fixtures

__all__ = [
    "normalization_stats",
    "normalize_data",
    "revert_output_format",
    "unNormalizeData",
    "constants",
    "WindowedCorpus",
    "batch_starts",
    "find_indices_256",
    "find_indices_srnn",
    "gather_windows",
    "H36MDataset",
    "read_csv_floats",
    "AMASSDataset",
    "AISDataset",
    "canonicalize_frames",
    "ewm_mean",
    "CMUDataset",
    "define_actions_cmu",
    "load_data_cmu",
    "load_data_cmu_3d",
    "fixtures",
]
