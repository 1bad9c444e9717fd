from .rotations import (
    expmap2rotmat,
    rotmat2euler,
    rotmat2quat,
    expmap2quat,
    quat2expmap,
    rotmat2expmap,
    quat_norm_valid,
    rodrigues,
)
from .forward_kinematics import (
    h36m_skeleton,
    cmu_skeleton,
    fkl,
    expmap2xyz,
)
from .graph import get_adj_AMASS, normalize_A, spatio_temporal_graph
from .smpl import ang2joint, load_smpl_skeleton
from .dct import get_dct_matrix, dct_transform, idct_transform

__all__ = [
    "expmap2rotmat",
    "rotmat2euler",
    "rotmat2quat",
    "expmap2quat",
    "quat2expmap",
    "rotmat2expmap",
    "quat_norm_valid",
    "rodrigues",
    "h36m_skeleton",
    "cmu_skeleton",
    "fkl",
    "expmap2xyz",
    "ang2joint",
    "get_adj_AMASS",
    "normalize_A",
    "spatio_temporal_graph",
    "load_smpl_skeleton",
    "get_dct_matrix",
    "dct_transform",
    "idct_transform",
]
