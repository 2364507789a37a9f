"""Graph Attention Network (GAT) on the sparse op family.

The attention layer is the composition the reference benchmarks piecewise
(SURVEY.md §2.3): additive attention scores on edges → masked edge-softmax
→ vector-SpMM aggregation, all through the framework's custom-vjp ops.
"""

from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from custom_op_benchmark_tpu.graph.graph import Graph
from custom_op_benchmark_tpu.ops import edge_softmax, vector_spmm


def aggregate_to_dst(g: Graph, edata: jax.Array, x: jax.Array) -> jax.Array:
    """``out[v] = Σ_{e=(u,v)} edata[e]·x[u]`` via the transpose graph.

    vector_spmm aggregates over CSR rows (to src — reference
    wrapper.py:274 semantics); in-edge aggregation runs the same op on
    ``g.reverse()``, whose canonical order is this graph's CSC order, so
    edge data is permuted by ``csc_perm`` (the reference backward kernels
    pull the same trick — graphop_kernel.cu:398, 586-597).
    """
    # impl pinned: g.reverse() is a fresh object per call, so "auto"
    # would rebuild strategy views at every trace.
    return vector_spmm(g.reverse(), edata[g.csc_perm], x, impl="xla")


class GATLayer(nn.Module):
    """One multi-head GAT layer (additive attention, LeakyReLU scores).

    score[e,h] = LeakyReLU(a_l·Wx[src] + a_r·Wx[dst]);
    α = edge_softmax over in-edges of dst; out[v] = Σ α·Wx[src].
    """

    out_dim: int
    num_heads: int = 1
    negative_slope: float = 0.2
    concat_heads: bool = True
    residual: bool = False
    dropout_rate: float = 0.0
    param_dtype: jnp.dtype = jnp.float32
    # Compute dtype (mixed precision): params stay param_dtype, the z
    # tensor — and therefore every gathered (R, D, d) tile in the fused
    # ops — runs at this width. bf16 halves the backward's dominant
    # gather traffic (measured: attn bwd 74 → 59.3 ms at 2M edges);
    # accumulation stays f32 inside the ops (preferred_element_type).
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, g: Graph, x: jax.Array, *, deterministic: bool = True,
                 ell=None, block=None):
        h, d = self.num_heads, self.out_dim
        w = nn.Dense(h * d, use_bias=False, name="W",
                     param_dtype=self.param_dtype, dtype=self.dtype)

        a_l = self.param("a_l", nn.initializers.glorot_uniform(), (h, d),
                         self.param_dtype)
        a_r = self.param("a_r", nn.initializers.glorot_uniform(), (h, d),
                         self.param_dtype)
        if self.dtype is not None:
            a_l = a_l.astype(self.dtype)
            a_r = a_r.astype(self.dtype)

        if block is not None and (self.dropout_rate == 0.0
                                  or deterministic):
            # Dense-block fast path, whole-stack layout: x arrives in
            # (B, L, F) (GAT scatters once at the stack entry).
            from custom_op_benchmark_tpu.ops import block_gat_attention

            bsz, ln = x.shape[0], x.shape[1]
            z = w(x).reshape(bsz, ln, h, d)
            out = block_gat_attention(
                block, a_l, a_r, z, negative_slope=self.negative_slope)
            if self.residual:
                res = x if x.shape[-1] == h * d else nn.Dense(
                    h * d, use_bias=False, name="W_res",
                    param_dtype=self.param_dtype, dtype=self.dtype)(x)
                out = out + res.reshape(bsz, ln, h, d)
            if self.concat_heads:
                return out.reshape(bsz, ln, h * d)
            return out.mean(axis=-2)

        n = x.shape[0]
        z = w(x).reshape(n, h, d)

        use_fused = ell is not None and (
            self.dropout_rate == 0.0 or deterministic
        )
        if use_fused:
            # Degree-bucketed fused path (ops/ell.py): score, softmax and
            # aggregation in one scatter-free sweep per bucket.
            from custom_op_benchmark_tpu.ops import ell_gat_attention

            src_ell, dst_ell = ell
            out = ell_gat_attention(
                dst_ell, src_ell, a_l, a_r, z,
                negative_slope=self.negative_slope,
            )
        else:
            el = jnp.einsum("nhd,hd->nh", z, a_l)
            er = jnp.einsum("nhd,hd->nh", z, a_r)
            # Additive scores per edge; padded edge endpoints clamp
            # (garbage masked below).
            nclamp = jnp.minimum(g.src, n - 1), jnp.minimum(g.dst, n - 1)
            scores = el[nclamp[0]] + er[nclamp[1]]
            scores = nn.leaky_relu(scores, self.negative_slope)

            # Fused dst-softmax + aggregation stays in CSC order — saves
            # two cancelling full-edge permutation gathers per layer
            # (round-1 weak #10).
            from custom_op_benchmark_tpu.ops import softmax_aggregate_dst

            dropout_fn = None
            if self.dropout_rate > 0.0:
                drop = nn.Dropout(self.dropout_rate)
                dropout_fn = (
                    lambda a: drop(a, deterministic=deterministic))
            out = softmax_aggregate_dst(
                g, scores, z, dropout_fn=dropout_fn)   # (n, h, d)

        if self.residual:
            res = x if x.shape[-1] == h * d else nn.Dense(
                h * d, use_bias=False, name="W_res",
                param_dtype=self.param_dtype, dtype=self.dtype)(x)
            out = out + res.reshape(n, h, d)
        if self.concat_heads:
            return out.reshape(n, h * d)
        return out.mean(axis=1)


class GAT(nn.Module):
    """A GAT stack for node classification (ELU between layers).

    ``remat=True`` checkpoints each layer (``jax.checkpoint`` via
    ``nn.remat``): the fused attention's gathered z tiles (GBs at ogbn
    edge counts) are recomputed in the backward instead of living from
    each layer's forward until its backward — trades one extra gather
    pass per layer for O(layers·e·d) HBM. Use it when a full-graph
    training step OOMs.
    """

    hidden_dim: int
    out_dim: int
    num_layers: int = 2
    num_heads: int = 8
    dropout_rate: float = 0.0
    remat: bool = False
    # Mixed precision: dtype=jnp.bfloat16 runs every layer's z tensor
    # (and the fused ops' gathered tiles) at bf16 with f32 params and
    # f32 in-op accumulation; logits are returned in f32.
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, g: Graph, x: jax.Array, *, deterministic: bool = True,
                 ell=None, block=None):
        # Dense-block whole-stack layout (same pass as GraphTransformer):
        # scatter once, run every layer in (B, L, ·), gather once.
        block_layout = block is not None and (
            self.dropout_rate == 0.0 or deterministic)
        if block_layout:
            x = block.scatter_nodes(x)
        blk = block if block_layout else None
        layer_cls = nn.remat(
            GATLayer, static_argnums=(), prevent_cse=True
        ) if self.remat else GATLayer
        for i in range(self.num_layers - 1):
            x = layer_cls(
                self.hidden_dim,
                self.num_heads,
                dropout_rate=self.dropout_rate,
                residual=i > 0,
                dtype=self.dtype,
                name=f"layer{i}",
            )(g, x, deterministic=deterministic, ell=ell, block=blk)
            x = nn.elu(x)
            if self.dropout_rate > 0.0:
                x = nn.Dropout(self.dropout_rate)(
                    x, deterministic=deterministic
                )
        out = GATLayer(
            self.out_dim,
            num_heads=1,
            concat_heads=False,
            dtype=self.dtype,
            name=f"layer{self.num_layers - 1}",
        )(g, x, deterministic=deterministic, ell=ell, block=blk)
        if block_layout:
            out = block.gather_nodes(out)
        return out.astype(jnp.float32) if self.dtype is not None else out
