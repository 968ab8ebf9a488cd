from .generator import Generator, resolve_scale, num_upsample_blocks
from .discriminator import Discriminator
from .forecaster import ConvLSTMForecaster
from .layers import Conv2dTorch, ConvLSTMCell, UpsampleBlock, GatedCovariateAttention

__all__ = [
    "Generator", "Discriminator", "ConvLSTMForecaster",
    "Conv2dTorch", "ConvLSTMCell", "UpsampleBlock", "GatedCovariateAttention",
    "resolve_scale", "num_upsample_blocks",
]
