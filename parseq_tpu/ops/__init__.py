from . import layers
from .layers import dropout, layer_norm, linear, mha, mlp

__all__ = ['layers', 'linear', 'layer_norm', 'mha', 'mlp', 'dropout']
