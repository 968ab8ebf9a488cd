from .mesh import (make_mesh, make_mesh_2d, batch_sharding, replicated_sharding,
                   shard_batch, replicate)
from .train_parallel import (make_dp_generator_train_step, make_dp_gan_train_step,
                             make_dp_forecaster_train_step)
from .tensor_parallel import (make_tp_convlstm_step, shard_cell_params,
                              unshard_cell_params, tp_permute_tree,
                              tp_state_shardings)

__all__ = [
    "make_mesh", "make_mesh_2d", "batch_sharding", "replicated_sharding",
    "shard_batch", "replicate",
    "make_dp_generator_train_step", "make_dp_gan_train_step",
    "make_dp_forecaster_train_step",
    "make_tp_convlstm_step", "shard_cell_params", "unshard_cell_params",
    "tp_permute_tree", "tp_state_shardings",
]
