from pldepth_tpu.data.datasets import DATASETS, SyntheticDepthDataset, get_dataset
from pldepth_tpu.data.pipeline import (
    BatchIterator,
    pregenerate_val_rankings,
    train_val_split,
    val_batches,
)

__all__ = [
    "DATASETS",
    "BatchIterator",
    "SyntheticDepthDataset",
    "get_dataset",
    "pregenerate_val_rankings",
    "train_val_split",
    "val_batches",
]
