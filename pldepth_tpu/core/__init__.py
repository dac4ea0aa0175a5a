from pldepth_tpu.core.config import ExperimentConfig, MeshConfig
from pldepth_tpu.core.mesh import make_mesh, data_sharding, replicated_sharding
from pldepth_tpu.core.rng import fold_in_str

__all__ = [
    "ExperimentConfig",
    "MeshConfig",
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "fold_in_str",
]
