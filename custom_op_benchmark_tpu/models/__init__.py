"""Model layers composing the sparse op family (SURVEY.md §7 layer 4).

The reference benchmarks the decomposition ``SDDMM → edge-softmax →
vector-SpMM`` piecewise (wrapper.py:148-485); these modules compose it into
trainable layers: GAT, GCN, GraphSAGE, GIN, and a masked graph transformer (the
reference's clique workload *is* batched masked self-attention).
"""

from custom_op_benchmark_tpu.models.gat import GAT, GATLayer
from custom_op_benchmark_tpu.models.gcn import GCN, GCNLayer
from custom_op_benchmark_tpu.models.gin import GIN, GINLayer
from custom_op_benchmark_tpu.models.sage import GraphSAGE, SAGELayer
from custom_op_benchmark_tpu.models.transformer import (
    GraphTransformer,
    GraphTransformerLayer,
)

__all__ = [
    "GAT",
    "GATLayer",
    "GCN",
    "GCNLayer",
    "GIN",
    "GINLayer",
    "GraphSAGE",
    "SAGELayer",
    "GraphTransformer",
    "GraphTransformerLayer",
]
