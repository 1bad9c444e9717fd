from .gif import visualize_batch, visualize_batch_ais

__all__ = ["visualize_batch", "visualize_batch_ais"]
