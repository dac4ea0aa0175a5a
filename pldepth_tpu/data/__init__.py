from pldepth_tpu.data.datasets import DATASETS, SyntheticDepthDataset, get_dataset
from pldepth_tpu.data.scenes import SceneDepthDataset
from pldepth_tpu.data.pipeline import (
    BatchIterator,
    pregenerate_val_rankings,
    train_val_split,
    val_batches,
)
from pldepth_tpu.data.resident import ResidentStore, build_resident_store

__all__ = [
    "DATASETS",
    "BatchIterator",
    "ResidentStore",
    "SceneDepthDataset",
    "SyntheticDepthDataset",
    "build_resident_store",
    "get_dataset",
    "pregenerate_val_rankings",
    "train_val_split",
    "val_batches",
]
