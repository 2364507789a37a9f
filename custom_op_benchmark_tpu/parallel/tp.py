"""Head-axis tensor parallelism for multi-head graph attention.

The reference loops heads inside each kernel launch
(graphop_kernel.cu:25, 421-422 — ``threads = h``); heads are fully
independent through score → softmax → aggregate, which makes the head
axis the natural tensor-parallel dimension (SURVEY.md §2.4). Layout:

- q/k/v activations are sharded ``P(None, "head", None)`` — every chip
  holds all nodes but only ``h/TP`` heads;
- the fused ELL attention runs UNCHANGED per shard (graph views are
  replicated index metadata — they describe structure, not features);
- zero collectives inside the op: the only communication in a
  transformer block is the unsharded→sharded transition at the QKV
  projection and the psum at the output projection, both inserted by
  the partitioner when the projection weights are sharded on the head
  axis.

Composes with edge partitioning on a 2-D ``("edge", "head")`` mesh: the
halo exchange moves only the local head slice, so ICI volume drops by
the TP factor.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def head_sharding(mesh: Mesh, axis: str = "head") -> NamedSharding:
    """Sharding for (n, h, d) activations: heads split over ``axis``."""
    return NamedSharding(mesh, P(None, axis, None))


def shard_heads(mesh: Mesh, x, axis: str = "head"):
    """Place an (n, h, d) array with its head axis sharded."""
    return jax.device_put(jnp.asarray(x), head_sharding(mesh, axis))


def tp_attention(ell, ell_t, mesh: Mesh, q, k, v, *,
                 axis: str = "head", scale: float = None):
    """Fused ELL attention with heads sharded over ``axis``.

    q, k, v: (n, h, d) with h divisible by the axis size. Output keeps
    the same sharding. The per-shard compute is the single-chip
    :func:`ops.ell_attention` on the local head slice — no collectives.
    """
    from custom_op_benchmark_tpu.ops import ell_attention

    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    tp = mesh.shape[axis]
    if q.shape[1] % tp:
        raise ValueError(
            f"heads {q.shape[1]} not divisible by TP degree {tp}"
        )

    def f(q, k, v):
        return ell_attention(ell, ell_t, q, k, v, scale=scale)

    spec = P(None, axis, None)
    return jax.shard_map(
        f, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def tp_gat_attention(ell, ell_t, mesh: Mesh, a_l, a_r, z, *,
                     axis: str = "head", negative_slope: float = 0.2):
    """Fused GAT core with heads sharded over ``axis``.

    a_l, a_r: (h, d) attention vectors (sharded on h); z: (n, h, d).
    """
    from custom_op_benchmark_tpu.ops import ell_gat_attention

    tp = mesh.shape[axis]
    if z.shape[1] % tp:
        raise ValueError(
            f"heads {z.shape[1]} not divisible by TP degree {tp}"
        )

    def f(a_l, a_r, z):
        return ell_gat_attention(
            ell, ell_t, a_l, a_r, z, negative_slope=negative_slope
        )

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(None, axis, None)),
        out_specs=P(None, axis, None),
        check_vma=False,
    )(a_l, a_r, z)


def tp_transformer_block(ell, ell_t, mesh: Mesh, params, x, *,
                         axis: str = "head"):
    """One Megatron-style graph-transformer block: column-parallel QKV,
    head-sharded fused attention, row-parallel output projection with
    the partitioner's psum.

    ``params``: dict with wq/wk/wv (f, h, d) and wo (h, d, f); the h
    axis of every weight is sharded over ``axis``. x: (n, f) replicated.
    Returns (n, f) replicated (one psum, at the output projection —
    the Megatron shard map applied to graph attention).
    """
    def f(wq, wk, wv, wo, x):
        ax = axis
        q = jnp.einsum("nf,fhd->nhd", x, wq)
        k = jnp.einsum("nf,fhd->nhd", x, wk)
        v = jnp.einsum("nf,fhd->nhd", x, wv)
        from custom_op_benchmark_tpu.ops import ell_attention

        out = ell_attention(ell, ell_t, q, k, v)
        y = jnp.einsum("nhd,hdf->nf", out, wo)
        return jax.lax.psum(y, ax)

    return jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None),
                  P(None, axis, None), P(axis, None, None), P()),
        out_specs=P(),
        check_vma=False,
    )(params["wq"], params["wk"], params["wv"], params["wo"], x)
