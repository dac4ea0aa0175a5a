from pldepth_tpu.ops.listmle import (
    gather_ranked_scores,
    listmle_nll,
    pl_ranking_loss,
    pl_ranking_loss_from_scores,
)
from pldepth_tpu.ops.sparse_tail import sparse_upsample2x_taps

__all__ = [
    "gather_ranked_scores",
    "listmle_nll",
    "pl_ranking_loss",
    "pl_ranking_loss_from_scores",
    "sparse_upsample2x_taps",
]
