"""pl_convlstm_gan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for ConvLSTM-based
spatiotemporal precipitation downscaling and video/radar frame prediction.

Re-implementation (not a port) of the capabilities of the reference repo
`Tomzhuiowewie/Pl-ConvLSTM-GAN` (see SURVEY.md), extended with GAN training, bf16 mixed
precision, scheduled sampling, and shard_map data parallelism per the north-star targets.

Layout
------
- ``ops``       pure functional primitives (resize with torch-`F.interpolate` parity,
                pixel shuffle, coord channels, ConvLSTM cell math, Pallas kernels)
- ``models``    flax modules: Generator (downscaling), Discriminator, ConvLSTM forecaster
- ``losses``    physics-informed CombinedLoss, adversarial BCE+L1, SSIM
- ``data``      Fenhe dataset semantics in numpy, synthetic sequence sources, batching +
                device prefetch pipeline
- ``parallel``  mesh construction and shard_map data-parallel train steps
- ``train``     Trainer mirroring the reference public surface, optimizers, early
                stopping, checkpointing (save *and* restore)
- ``utils``     visualization, profiling helpers
- ``tools``     offline ETL (CMORPH ingest, DEM/LUCC coarsening, merges, station compare)
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
from .config import Config, load_config  # noqa: F401

# heavyweight entry points resolve lazily (importing them pulls in jax/flax)
_LAZY = {
    "Trainer": ("pl_convlstm_gan_tpu.train.trainer", "Trainer"),
    "SequenceTrainer": ("pl_convlstm_gan_tpu.train.sequence_trainer",
                        "SequenceTrainer"),
    "load_predictor": ("pl_convlstm_gan_tpu.predict", "load_predictor"),
    "build_model": ("pl_convlstm_gan_tpu.predict", "build_model"),
    "StreamingForecaster": ("pl_convlstm_gan_tpu.streaming",
                            "StreamingForecaster"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
