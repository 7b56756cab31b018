from .mesh import make_mesh, data_sharding, replicated
from .dp import make_dp_train_step, shard_batch
from .mp import choose_slice_bonds, make_sliced_siamese_fn, sliced_nll_loss
from .trainer import DistributedConfig, DistributedTrainer
from .health import check_mesh_health
from .multihost import detect_multihost, initialize_multihost, is_main_process

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "make_dp_train_step",
    "shard_batch",
    "choose_slice_bonds",
    "make_sliced_siamese_fn",
    "sliced_nll_loss",
    "DistributedConfig",
    "DistributedTrainer",
    "check_mesh_health",
    "detect_multihost",
    "initialize_multihost",
    "is_main_process",
]
