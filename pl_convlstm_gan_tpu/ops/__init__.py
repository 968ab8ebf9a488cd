from .coords import add_coord_channels, coord_channels
from .resize import resize_bilinear, resize_nearest, resize_area, resize
from .pixel_shuffle import pixel_shuffle
from .convlstm import convlstm_gates, ConvLSTMParams

__all__ = [
    "add_coord_channels",
    "coord_channels",
    "resize_bilinear",
    "resize_nearest",
    "resize_area",
    "resize",
    "pixel_shuffle",
    "convlstm_gates",
    "ConvLSTMParams",
]
