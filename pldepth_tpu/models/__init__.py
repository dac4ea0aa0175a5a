from pldepth_tpu.models.pldepth_net import (
    MODEL_REGISTRY,
    PLDepthModel,
    get_model_type_by_name,
    get_pl_depth_net,
    partition_params,
)

__all__ = [
    "MODEL_REGISTRY",
    "PLDepthModel",
    "get_model_type_by_name",
    "get_pl_depth_net",
    "partition_params",
]
