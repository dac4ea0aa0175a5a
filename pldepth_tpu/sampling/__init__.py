from pldepth_tpu.sampling.relations import depth_relation
from pldepth_tpu.sampling.samplers import (
    SAMPLERS,
    SamplerSpec,
    get_sampler,
    sample_rankings,
    sample_rankings_batch,
)

__all__ = [
    "SAMPLERS",
    "SamplerSpec",
    "depth_relation",
    "get_sampler",
    "sample_rankings",
    "sample_rankings_batch",
]
