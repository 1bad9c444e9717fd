from .rotations import (
    expmap2rotmat,
    rotmat2euler,
    rotmat2quat,
    expmap2quat,
    rodrigues,
)
from .forward_kinematics import (
    h36m_skeleton,
    fkl,
    expmap2xyz,
)
from .smpl import ang2joint, load_smpl_skeleton

__all__ = [
    "expmap2rotmat",
    "rotmat2euler",
    "rotmat2quat",
    "expmap2quat",
    "rodrigues",
    "h36m_skeleton",
    "fkl",
    "expmap2xyz",
    "ang2joint",
    "load_smpl_skeleton",
]
