"""Aggregation ops for fanout-sampled minibatches.

Fanout sampling bounds every in-degree by ``max(fanouts) + 1``, so one
dense ``(N, W)`` neighbor matrix (``SampledBatch.in_cols``) covers the
batch with static shapes — no degree buckets, no repacking, one XLA
program per epoch. The forward is a single wide row-gather + masked sum
(scatter-free); the backward runs the transpose copy-sum as a
row-gather + SORTED segment reduction over the batch graph's canonical
(src-sorted) edge order — the same decomposition the reference's
vector_spmm backward uses over the transpose CSR
(graphop_kernel.cu:152-163), with sorted segments in place of atomics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from custom_op_benchmark_tpu.graph.graph import Graph
from custom_op_benchmark_tpu.ops import xla as _xla


def _pad_row(x):
    return jnp.pad(x, [(0, 1)] + [(0, 0)] * (x.ndim - 1))


@jax.custom_vjp
def _sampled_copy_sum(cols, src, dst, x):
    xp = _pad_row(x)                                # row N = zeros
    return jnp.sum(xp[cols], axis=1)                # (N, W, d) → (N, d)


def _scs_fwd(cols, src, dst, x):
    return _sampled_copy_sum(cols, src, dst, x), (src, dst, x.shape[0])


def _scs_bwd(res, dy):
    src, dst, n = res
    dyp = _pad_row(dy)
    msg = dyp[jnp.minimum(dst, n)]                  # (E, d) row gather
    dx = _xla.segment_sum(msg, src, n + 1, sorted_ids=True)[: n]
    return None, None, None, dx.astype(dy.dtype)


_sampled_copy_sum.defvjp(_scs_fwd, _scs_bwd)


def sampled_copy_spmm(in_cols: jax.Array, g: Graph, x: jax.Array, *,
                      reduce: str = "mean") -> jax.Array:
    """Unweighted neighbor aggregation over a sampled batch.

    ``in_cols``: (N, W) int32 in-neighbor matrix (pad slot = N);
    ``g``: the batch's padded Graph (supplies the canonical src/dst for
    the gather-only transpose in the VJP); ``x``: (N, d).
    """
    y = _sampled_copy_sum(in_cols, g.src, g.dst, x)
    if reduce == "sum":
        return y
    if reduce == "mean":
        deg = jnp.sum(in_cols < x.shape[0], axis=1).astype(x.dtype)
        return y / jnp.maximum(deg, 1)[:, None]
    raise ValueError(f"reduce must be sum/mean, got {reduce!r}")
