from pldepth_tpu.eval.metrics import (
    depth_edge_metric,
    ndcg_at_k,
    ordinal_error,
    whdr,
)
from pldepth_tpu.eval.device_metrics import (
    eval_metrics_batch,
    ndcg_sampled,
    pairwise_disagreement,
)
from pldepth_tpu.eval.evaluator import Evaluator

__all__ = [
    "Evaluator",
    "depth_edge_metric",
    "eval_metrics_batch",
    "ndcg_at_k",
    "ndcg_sampled",
    "ordinal_error",
    "pairwise_disagreement",
    "whdr",
]
