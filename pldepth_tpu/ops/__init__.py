from pldepth_tpu.ops.listmle import (
    gather_ranked_scores,
    listmle_nll,
    pl_ranking_loss,
)

__all__ = ["gather_ranked_scores", "listmle_nll", "pl_ranking_loss"]
