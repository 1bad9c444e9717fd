from .metrics import (
    criterion_cos,
    criterion_cos2,
    mpjpe_error,
    pck,
    auc_pck_metric,
    joint_angle_error,
    euler_error,
    l1_angle_loss,
    delta_2_gt,
)

__all__ = [
    "criterion_cos",
    "criterion_cos2",
    "mpjpe_error",
    "pck",
    "auc_pck_metric",
    "joint_angle_error",
    "euler_error",
    "l1_angle_loss",
    "delta_2_gt",
]
