from .metrics import (
    mpjpe_error,
    pck,
    auc_pck_metric,
    joint_angle_error,
    euler_error,
    l1_angle_loss,
    delta_2_gt,
)

__all__ = [
    "mpjpe_error",
    "pck",
    "auc_pck_metric",
    "joint_angle_error",
    "euler_error",
    "l1_angle_loss",
    "delta_2_gt",
]
