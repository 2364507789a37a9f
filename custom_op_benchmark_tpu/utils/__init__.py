"""Utilities: benchmarking, rooflines, configs, logging."""

from custom_op_benchmark_tpu.utils.benchlib import (
    BenchRecord,
    bench_fn,
    hbm_bandwidth_bytes,
)
from custom_op_benchmark_tpu.utils.config import (
    GraphConfig,
    ModelConfig,
    TrainConfig,
    BenchConfig,
)

__all__ = [
    "BenchRecord",
    "bench_fn",
    "hbm_bandwidth_bytes",
    "GraphConfig",
    "ModelConfig",
    "TrainConfig",
    "BenchConfig",
]
