from codenerf_tpu.data.srn import SRNDataset
from codenerf_tpu.data.blender import BlenderNeRFDataset
from codenerf_tpu.data.llff import LLFFDataset
from codenerf_tpu.data.loader import (
    DATASET_REGISTRY,
    build_dataset,
    BatchIterator,
    PrefetchIterator,
)

__all__ = [
    "SRNDataset",
    "BlenderNeRFDataset",
    "LLFFDataset",
    "DATASET_REGISTRY",
    "build_dataset",
    "BatchIterator",
    "PrefetchIterator",
]
