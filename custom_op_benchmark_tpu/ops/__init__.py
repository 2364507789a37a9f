"""The differentiable sparse op family (the framework's L1–L5).

Reference parity: the four ops of graphop/graphop_kernel.cu behind the
autograd wrappers of wrapper.py:8-55 —

- :func:`sddmm`         — masked A·Bᵀ edge scores (``maskedmm_csr``);
- :func:`node_mul_edge` — node×edge-feature dot products;
- :func:`edge_softmax`  — numerically-stable segment softmax
  (``sparse_softmax``), direction-agnostic;
- :func:`vector_spmm`   — per-head weighted neighborhood aggregation.

Each op has a pure-XLA segment implementation (ops/xla.py — the oracle) and
a Pallas block-sparse implementation (ops/pallas/), both behind the same
``jax.custom_vjp`` with the VJP contracts of SURVEY.md §2.3. There are no
atomics anywhere: scatters are sorted segment reductions or row-owned tiles.
"""

from custom_op_benchmark_tpu.ops.primitives import (
    attention,
    sddmm,
    node_mul_edge,
    edge_softmax,
    vector_spmm,
    gat_attention,
    gspmm,
    gsddmm,
    softmax_aggregate_dst,
)
from custom_op_benchmark_tpu.ops.ell import (
    PackedEdgeWeights,
    ell_attention,
    ell_combine_rows,
    ell_copy_spmm,
    ell_cross_packed,
    ell_dual,
    ell_edge_bias_attention,
    ell_gat_attention,
    ell_gather_edges,
    ell_node_mul_edge,
    ell_pack_weights,
    ell_scatter_edges,
    ell_sddmm,
    ell_softmax,
    ell_spmm,
    ell_unpack_weights,
)
from custom_op_benchmark_tpu.ops.dense_block import (
    block_attention,
    block_copy_spmm,
    block_gat_attention,
    block_node_mul_edge,
    block_sddmm,
    block_softmax,
    block_spmm,
)

__all__ = [
    "attention",
    "gat_attention",
    "sddmm",
    "node_mul_edge",
    "edge_softmax",
    "vector_spmm",
    "gspmm",
    "gsddmm",
    "softmax_aggregate_dst",
    "block_sddmm",
    "block_node_mul_edge",
    "block_softmax",
    "block_spmm",
    "block_attention",
    "block_copy_spmm",
    "block_gat_attention",
    "ell_attention",
    "ell_combine_rows",
    "ell_copy_spmm",
    "ell_cross_packed",
    "ell_dual",
    "ell_edge_bias_attention",
    "ell_gat_attention",
    "ell_gather_edges",
    "ell_node_mul_edge",
    "ell_scatter_edges",
    "ell_sddmm",
    "ell_softmax",
    "ell_spmm",
    "ell_pack_weights",
    "ell_unpack_weights",
    "PackedEdgeWeights",
]
