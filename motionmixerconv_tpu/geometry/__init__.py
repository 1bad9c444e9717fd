from .rotations import (
    expmap2rotmat,
    rotmat2euler,
    rotmat2quat,
    expmap2quat,
    rodrigues,
)
from .forward_kinematics import (
    h36m_skeleton,
    cmu_skeleton,
    fkl,
    expmap2xyz,
)
from .smpl import ang2joint, load_smpl_skeleton
from .dct import get_dct_matrix, dct_transform, idct_transform

__all__ = [
    "expmap2rotmat",
    "rotmat2euler",
    "rotmat2quat",
    "expmap2quat",
    "rodrigues",
    "h36m_skeleton",
    "cmu_skeleton",
    "fkl",
    "expmap2xyz",
    "ang2joint",
    "load_smpl_skeleton",
    "get_dct_matrix",
    "dct_transform",
    "idct_transform",
]
