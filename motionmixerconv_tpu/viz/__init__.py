from .gif import visualize_batch, visualize_batch_ais
from .live import pose_animation

__all__ = ["visualize_batch", "visualize_batch_ais", "pose_animation"]
