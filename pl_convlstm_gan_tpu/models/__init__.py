from .generator import Generator, resolve_scale, num_upsample_blocks
from .discriminator import Discriminator
from .forecaster import ConvLSTMForecaster
from .layers import Conv2dTorch, ConvLSTMCell, UpsampleBlock, GatedCovariateAttention
from .quantized import (Int8Forecaster, prepare_int8_forecaster, rollout_int8,
                        rollout_int8_from_state)

__all__ = [
    "Generator", "Discriminator", "ConvLSTMForecaster",
    "Conv2dTorch", "ConvLSTMCell", "UpsampleBlock", "GatedCovariateAttention",
    "resolve_scale", "num_upsample_blocks",
    "Int8Forecaster", "prepare_int8_forecaster", "rollout_int8",
    "rollout_int8_from_state",
]
