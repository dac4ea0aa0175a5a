from pldepth_tpu.active.acquisition import (
    acquire_pixels,
    oracle_label,
    tile_hausdorff,
)
from pldepth_tpu.active.loop import active_learning_round, run_active_loop

__all__ = [
    "acquire_pixels",
    "active_learning_round",
    "oracle_label",
    "run_active_loop",
    "tile_hausdorff",
]
