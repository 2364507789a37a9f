"""Multi-chip execution: mesh construction + edge-partitioned ops.

The reference is strictly single-device (SURVEY.md §2.4: no
torch.distributed, no NCCL — its only 'partitioning' is the intra-GPU row
chunking of part_csr.py). This package generalizes that chunking across a
``jax.sharding.Mesh``: the canonical (row-sorted) edge list is split into
contiguous, equally-padded shards per device; segment reductions stay local
except at boundary rows, which are healed by collectives over ICI.
"""

from custom_op_benchmark_tpu.parallel.mesh import make_mesh
from custom_op_benchmark_tpu.parallel.shard_ops import (
    DistGraph,
    dist_graph,
    dist_sddmm,
    dist_edge_softmax,
    dist_vector_spmm,
    dist_gat_attention,
)
from custom_op_benchmark_tpu.parallel.halo import (
    HaloEll,
    HaloGraph,
    HaloPackedWeights,
    halo_pack_weights,
    halo_attention_ell,
    halo_ell,
    halo_edge_data,
    halo_gat_attention,
    halo_graph,
    halo_spmm,
    halo_spmm_ell,
    shard_halo_nodes,
)
from custom_op_benchmark_tpu.parallel.tp import (
    head_sharding,
    shard_heads,
    tp_attention,
    tp_gat_attention,
    tp_transformer_block,
)
from custom_op_benchmark_tpu.parallel.train_dist import (
    dist_gat_forward,
    dist_transformer_forward,
    fit_edge_partitioned,
    init_dist_gat,
    init_dist_transformer,
)

__all__ = [
    "make_mesh",
    "head_sharding",
    "shard_heads",
    "tp_attention",
    "tp_gat_attention",
    "tp_transformer_block",
    "DistGraph",
    "dist_graph",
    "dist_sddmm",
    "dist_edge_softmax",
    "dist_vector_spmm",
    "dist_gat_attention",
    "init_dist_gat",
    "dist_gat_forward",
    "init_dist_transformer",
    "dist_transformer_forward",
    "fit_edge_partitioned",
    "HaloGraph",
    "halo_graph",
    "halo_spmm",
    "halo_gat_attention",
    "halo_edge_data",
    "shard_halo_nodes",
    "HaloEll",
    "halo_ell",
    "halo_pack_weights",
    "HaloPackedWeights",
    "halo_attention_ell",
    "halo_spmm_ell",
]
