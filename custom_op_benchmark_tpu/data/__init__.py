"""Datasets, neighbor sampling, and minibatch pipelines (SURVEY.md §7.5)."""

from custom_op_benchmark_tpu.data.synthetic import (
    NodeClassificationDataset,
    planted_partition,
    cora_like,
    arxiv_like,
)
from custom_op_benchmark_tpu.data.sampling import (
    NeighborSampler,
    SampledBatch,
)
from custom_op_benchmark_tpu.data.pipeline import prefetch

__all__ = [
    "NodeClassificationDataset",
    "planted_partition",
    "cora_like",
    "arxiv_like",
    "NeighborSampler",
    "SampledBatch",
    "prefetch",
]
