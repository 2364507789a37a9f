"""Pallas TPU kernels over the block-sparse tiling (SURVEY.md §7.3).

These replace the reference's entire native stack (CUDA kernels +
atomics + launch-geometry tuning, graphop/graphop_kernel.cu +
graphop/atomic.cuh): every op is dense MXU math over nonzero adjacency
tiles, with one grid program owning each output row block — conflict-free
by construction, no atomics, deterministic.
"""

from custom_op_benchmark_tpu.ops.pallas.tiled_kernels import (
    sddmm_tiles_kernel,
    spmm_row_sweep_kernel,
    spmm_col_sweep_kernel,
)
from custom_op_benchmark_tpu.ops.pallas.attention import (
    fused_attention_rows,
)

__all__ = [
    "sddmm_tiles_kernel",
    "spmm_row_sweep_kernel",
    "spmm_col_sweep_kernel",
    "fused_attention_rows",
]
