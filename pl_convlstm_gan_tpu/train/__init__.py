from .early_stopping import EarlyStopping
from .plateau import ReduceLROnPlateau
from .checkpoint import CheckpointWriter, save_checkpoint, restore_checkpoint
from .steps import (TrainState, GANTrainState, make_optimizer,
                    make_generator_train_step, make_generator_eval_step,
                    make_forecaster_train_step, make_forecaster_eval_step,
                    make_gan_train_step, aggregate_generator_eval,
                    aggregate_sequence_eval)
from .trainer import Trainer
from .sequence_trainer import SequenceTrainer

__all__ = [
    "SequenceTrainer",
    "EarlyStopping", "ReduceLROnPlateau", "CheckpointWriter",
    "save_checkpoint", "restore_checkpoint",
    "TrainState", "GANTrainState", "make_optimizer",
    "make_generator_train_step", "make_generator_eval_step",
    "make_forecaster_train_step", "make_forecaster_eval_step",
    "make_gan_train_step", "aggregate_generator_eval",
    "aggregate_sequence_eval", "Trainer",
]
