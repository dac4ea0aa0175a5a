from pldepth_tpu.eval.metrics import (
    depth_edge_metric,
    ndcg_at_k,
    ordinal_error,
    whdr,
)
from pldepth_tpu.eval.evaluator import Evaluator

__all__ = [
    "Evaluator",
    "depth_edge_metric",
    "ndcg_at_k",
    "ordinal_error",
    "whdr",
]
