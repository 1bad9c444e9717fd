from .activations import get_activation, gelu_exact, mish

__all__ = ["get_activation", "gelu_exact", "mish"]
