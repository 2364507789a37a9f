"""Bisect the grid-regime (pallas_tiled) gap to its byte-model roofline.

Round-4 verdict #1: grid SpMM at 17.0 ms moves ~3.2 GB under the
full-refetch byte model → ~23% of the 819 GB/s chip, and the tiled
attention backward is 6× its forward (177.3 vs 37.5 ms) with no
accounting. This script times the parts that could explain both:

SpMM (vals tile-dense (T, 128, 128)):
  vals_stream      pure read of the vals array (the layout's stream floor)
  spmm_f32         current kernel (f32 vals, f32 x)
  spmm_dotonly_f32 kernel with the vals load replaced by a constant —
                   isolates the f32 MXU cost (f32 matmuls run multi-pass
                   on the bf16-native MXU) from the vals bytes
  spmm_bf16        bf16 vals + bf16 x (f32 accumulation) — halves bytes
                   AND runs the MXU at native width

Attention forward:
  attn_fwd_f32     current fused kernel
  attn_fwd_noexp   exp() replaced by identity — the transcendental term
  attn_fwd_nomask  mask load + where dropped — the mask-byte term
  attn_fwd_bf16    bf16 q/k/v (f32 softmax stats + accumulation)

Attention backward (current decomposition = 1 sddmm recompute + XLA
scan softmax + col(dv) + sddmm(dα) + XLA dS + row(dq) + col(dk)):
  sddmm_alone, softmax_scan_alone, row_sweep_alone, col_sweep_alone
  → 2·sddmm + 2·col + 1·row + scan should ≈ the measured attn_bwd.

Run on the TPU under timeout, log to a file:
  timeout 2400 python scripts/exp_grid_bisect.py > /tmp/grid_bisect.log 2>&1
"""

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from custom_op_benchmark_tpu.utils.platform import honor_platform_env

honor_platform_env()

from custom_op_benchmark_tpu.graph import grid_graph  # noqa: E402
from custom_op_benchmark_tpu.graph.reorder import (  # noqa: E402
    reorder_graph, tile_aligned_order,
)
from custom_op_benchmark_tpu.graph.tiled import tile_graph  # noqa: E402
from custom_op_benchmark_tpu.ops.pallas.attention import (  # noqa: E402
    _M_INIT, _NEG_INF, _clamped_tile,
)
from custom_op_benchmark_tpu.ops.pallas.tiled_kernels import (  # noqa: E402
    sddmm_tiles_kernel, spmm_col_sweep_kernel, spmm_row_sweep_kernel,
)
from custom_op_benchmark_tpu.ops.tiled import (  # noqa: E402
    tiled_attention, tiled_spmm,
)
from custom_op_benchmark_tpu.utils.benchlib import bench_fn  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")


# --------------------------------------------------------------------------
# Variant kernels (experiment-only copies)
# --------------------------------------------------------------------------

def _row_sweep_dotonly_body(ptr_ref, cols_ref, x_ref, out_ref):
    i = pl.program_id(0)
    t = pl.program_id(1)
    n_t = ptr_ref[i + 1] - ptr_ref[i]

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(t < n_t)
    def _():
        # Constant LHS (no vals load): same MXU work, zero vals bytes.
        out_ref[...] += jnp.dot(
            jnp.full((128, 128), 0.01, jnp.float32), x_ref[...],
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def spmm_dotonly(tile_ptr, tile_cols, t, x, max_tiles):
    r = c = 128
    d = x.shape[1]
    nrb = tile_ptr.shape[0] - 1

    def x_map(i, s, ptr, cols):
        return (cols[_clamped_tile(i, s, ptr, t)], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nrb, max(max_tiles, 1)),
        in_specs=[pl.BlockSpec((c, d), x_map)],
        out_specs=pl.BlockSpec((r, d), lambda i, s, ptr, cols: (i, 0)),
    )
    return pl.pallas_call(
        _row_sweep_dotonly_body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrb * r, d), x.dtype),
    )(tile_ptr, tile_cols, x)


def _attn_body(ptr_ref, cols_ref, q_ref, k_ref, v_ref, mask_ref, out_ref,
               m_scr, l_scr, acc_scr, *, scale, use_exp, use_mask):
    i = pl.program_id(0)
    t = pl.program_id(1)
    n_t = ptr_ref[i + 1] - ptr_ref[i]
    n_sweep = pl.num_programs(1)

    @pl.when(t == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _M_INIT)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(t < n_t)
    def _():
        s = jax.lax.dot_general(
            q_ref[...], k_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if use_mask:
            s = jnp.where(mask_ref[0], s, _NEG_INF)
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, -1, keepdims=True))
        if use_exp:
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)
        else:
            p = s - m_new
            corr = m_prev - m_new
        l_new = l_scr[:, :1] * corr + jnp.sum(p, -1, keepdims=True)
        acc_scr[...] = acc_scr[...] * corr + jnp.dot(
            p.astype(v_ref.dtype), v_ref[...],
            preferred_element_type=jnp.float32)
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(t == n_sweep - 1)
    def _():
        l = l_scr[:, :1]
        out_ref[...] = jnp.where(
            l > 0, acc_scr[...] / jnp.maximum(l, 1e-30), 0.0
        ).astype(out_ref.dtype)


def attn_variant(tile_ptr, tile_cols, mask, q, k, v, max_tiles, scale,
                 use_exp=True, use_mask=True):
    t, r, c = mask.shape
    d = q.shape[1]
    nrb = tile_ptr.shape[0] - 1

    def q_map(i, s, ptr, cols):
        return (i, 0)

    def kv_map(i, s, ptr, cols):
        return (cols[_clamped_tile(i, s, ptr, t)], 0)

    def mask_map(i, s, ptr, cols):
        return (_clamped_tile(i, s, ptr, t), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nrb, max(max_tiles, 1)),
        in_specs=[
            pl.BlockSpec((r, d), q_map),
            pl.BlockSpec((c, d), kv_map),
            pl.BlockSpec((c, d), kv_map),
            pl.BlockSpec((1, r, c), mask_map),
        ],
        out_specs=pl.BlockSpec((r, d), lambda i, s, ptr, cols: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((r, 128), jnp.float32),
            pltpu.VMEM((r, 128), jnp.float32),
            pltpu.VMEM((r, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_attn_body, scale=scale, use_exp=use_exp,
                          use_mask=use_mask),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrb * r, d), q.dtype),
    )(tile_ptr, tile_cols, q, k, v, mask)


def main():
    rows = cols = 1024
    d = 128
    g = grid_graph(rows, cols)
    n, e = g.n_nodes, g.n_edges
    ro = tile_aligned_order(g, block=128)
    g_al, eperm = reorder_graph(g, ro)
    tg = tile_graph(g_al, 128, 128)
    t = tg.num_tiles
    nrb = tg.num_row_blocks
    print(f"grid n={n} e={e} T={t} nrb={nrb} "
          f"max_tpr={tg.max_tiles_per_row} density={tg.density:.4f}",
          flush=True)
    rng = np.random.default_rng(0)
    ed = jnp.asarray(rng.uniform(size=g.num_edges_padded).astype(np.float32))
    vals = jax.jit(
        lambda ed: tg.scatter_edges(ed[jnp.asarray(eperm)])[: tg.num_tiles]
    )(ed)
    q = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    q_al = ro.scatter_nodes(q)
    q_pad = jnp.pad(q_al, ((0, tg.n_rows_padded - q_al.shape[0]), (0, 0)))
    vals16 = vals.astype(jnp.bfloat16)
    q16 = q_pad.astype(jnp.bfloat16)
    scale = 1.0 / np.sqrt(d)

    out = {"static": dict(
        n=n, e=e, T=t, nrb=nrb, max_tpr=tg.max_tiles_per_row,
        density=round(tg.density, 5),
        vals_gb=round(vals.size * 4 / 1e9, 3),
        mask_gb=round(tg.mask.size / 1e9, 3),
    )}

    def bench(name, fn, *args, edges=e):
        rec = bench_fn(fn, args, warmup=1, iters="auto", name=name,
                       edges=edges)
        out[name] = round(rec.time_s * 1e3, 3)
        print(f"  {name:24s} {rec.time_s * 1e3:9.3f} ms", flush=True)

    # ---- SpMM ----
    bench("vals_stream", lambda v: (v * 2.0).sum(axis=(1, 2)), vals)
    bench("spmm_f32", lambda v, x: tiled_spmm(tg, v, x), vals, q_al)
    bench("spmm_dotonly_f32",
          lambda x: spmm_dotonly(tg.tile_ptr, tg.tile_cols, t, x,
                                 tg.max_tiles_per_row), q_pad)
    bench("spmm_bf16",
          lambda v, x: spmm_row_sweep_kernel(
              tg.tile_ptr, tg.tile_cols, v, x, tg.max_tiles_per_row),
          vals16, q16)

    # ---- attention forward ----
    tgT = tg.transpose()
    bench("attn_fwd_f32",
          lambda x: tiled_attention(tg, x, x, x, normalize="dst"), q_al)
    bench("attn_fwd_noexp",
          lambda x: attn_variant(tgT.tile_ptr, tgT.tile_cols, tgT.mask,
                                 x, x, x, tgT.max_tiles_per_row, scale,
                                 use_exp=False), q_pad)
    bench("attn_fwd_nomask",
          lambda x: attn_variant(tgT.tile_ptr, tgT.tile_cols, tgT.mask,
                                 x, x, x, tgT.max_tiles_per_row, scale,
                                 use_mask=False), q_pad)
    bench("attn_fwd_bf16",
          lambda x: attn_variant(tgT.tile_ptr, tgT.tile_cols, tgT.mask,
                                 x, x, x, tgT.max_tiles_per_row, scale),
          q16)

    # ---- attention backward: current composition + its parts ----
    bench("attn_bwd_f32",
          jax.grad(lambda x: (tiled_attention(
              tg, x, x, x, normalize="dst") ** 2).sum()), q_al)
    bench("sddmm_alone",
          lambda a, b: sddmm_tiles_kernel(
              tgT.tile_rows, tgT.tile_cols, tgT.mask, a, b), q_pad, q_pad)
    s0 = jax.jit(lambda a, b: sddmm_tiles_kernel(
        tgT.tile_rows, tgT.tile_cols, tgT.mask, a, b))(q_pad, q_pad)

    def softmax_scan(s):
        from custom_op_benchmark_tpu.ops.tiled import _sorted_seg_reduce
        sm = jnp.where(tgT.mask, s, -1e30)
        lmax = jnp.max(sm, axis=2)
        segm = _sorted_seg_reduce(lmax, tgT.tile_rows, tgT.tile_ptr, "max")
        z = jnp.where(tgT.mask,
                      jnp.exp(sm - segm[tgT.tile_rows][:, :, None]), 0.0)
        segs = _sorted_seg_reduce(jnp.sum(z, axis=2), tgT.tile_rows,
                                  tgT.tile_ptr, "sum")
        return z / jnp.maximum(segs[tgT.tile_rows][:, :, None], 1e-30)

    bench("softmax_scan_alone", softmax_scan, s0)
    bench("row_sweep_alone",
          lambda v, x: spmm_row_sweep_kernel(
              tgT.tile_ptr, tgT.tile_cols, v, x, tgT.max_tiles_per_row),
          s0, q_pad)
    bench("col_sweep_alone",
          lambda v, x: spmm_col_sweep_kernel(
              tgT.tile_ptr_c, tgT.tile_perm_c, tgT.tile_rows, v, x,
              tgT.max_tiles_per_col), s0, q_pad)

    print(json.dumps({"grid_bisect": out}))


if __name__ == "__main__":
    main()
