"""Manual-DMA SpMM row sweep for the grid/BSR regime (round-4 verdict
item 1, SURVEY §7 hard part 3: scalar-prefetch + manual DMA).

Diagnosis from exp_grid_bisect: spmm_dotonly (no vals load) 14.3 ms and
spmm_bf16 (half the bytes) 14.9 ms vs 17.0 full — the sweep is NOT
byte-bound; it is bound by one pipelined random x-block fetch per grid
step (40,960 steps × ~400 ns). Fix: one grid step per ROW BLOCK with
the row's ≤max_tpr x-tiles fetched by manual async DMAs, prefetched one
row ahead (2·max_tpr buffers in flight), and the vals streamed
contiguously in a dense-padded (nrb, max_tpr, R, C) layout whose zero
padding makes clamped fetches contribute exactly 0 — no @pl.when in the
inner loop, no per-tile grid steps.

Run on TPU: timeout 1800 python scripts/exp_grid_dma.py
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
from custom_op_benchmark_tpu.ops.tiled import tiled_spmm  # noqa: E402
from custom_op_benchmark_tpu.utils.benchlib import bench_fn  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")


def _dma_body(cols_ref, vals_ref, x_hbm, out_ref, xbuf, sems, *,
              max_tpr, c):
    i = pl.program_id(0)
    nrb = pl.num_programs(0)

    def copy(step, t):
        # Identical descriptor at start and wait time (cols is scalar-
        # prefetched, so the source slice is recomputable).
        cb = cols_ref[step, t]
        slot = (step % 2) * max_tpr + t
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(cb * c, c), :], xbuf.at[slot], sems.at[slot])

    def issue(step):
        @pl.when(step < nrb)
        def _():
            for t in range(max_tpr):
                copy(step, t).start()

    @pl.when(i == 0)
    def _():
        issue(0)

    issue(i + 1)                      # prefetch the next row block
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for t in range(max_tpr):
        copy(i, t).wait()
        slot_idx = (i % 2) * max_tpr + t
        acc += jnp.dot(vals_ref[0, t], xbuf[slot_idx],
                       preferred_element_type=jnp.float32)
    out_ref[...] = acc.astype(out_ref.dtype)


def spmm_row_sweep_dma(cols_pad, vals_pad, x, *, interpret=False):
    """cols_pad: (nrb, max_tpr) int32 (padded entries clamped to a valid
    col block); vals_pad: (nrb, max_tpr, R, C) zero-padded dense; x:
    (NCB·C, d) → y (nrb·R, d)."""
    nrb, max_tpr, r, c = vals_pad.shape
    d = x.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb,),
        in_specs=[
            pl.BlockSpec((1, max_tpr, r, c), lambda i, cols: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.TPUMemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((r, d), lambda i, cols: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2 * max_tpr, c, d), x.dtype),
            pltpu.SemaphoreType.DMA((2 * max_tpr,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_dma_body, max_tpr=max_tpr, c=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrb * r, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nrb * max_tpr * r * c * d,
            bytes_accessed=(nrb * max_tpr * (r * c + c * d)
                            + nrb * r * d) * vals_pad.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(cols_pad, vals_pad, x)


def _dma_body_v2(ptr_ref, cols_ref, vals_hbm, x_hbm, out_ref, vbuf,
                 xbuf, vsems, xsems, *, max_tpr, r, c, t_total):
    """Drop-in variant: reads the ORIGINAL (T, R, C) tile-list vals.
    A row's tiles are contiguous [ptr[i], ptr[i+1]) in T order, so one
    static-size (max_tpr, R, C) DMA with a clamped dynamic start fetches
    them; rows near the array end over-read earlier tiles, compensated
    by a dynamic in-buffer shift; padded t's are masked (t < n_t)."""
    i = pl.program_id(0)
    nrb = pl.num_programs(0)

    def vstart(step):
        return jnp.clip(ptr_ref[step], 0, t_total - max_tpr)

    def vcopy(step):
        slot = step % 2
        return pltpu.make_async_copy(
            vals_hbm.at[pl.ds(vstart(step), max_tpr)],
            vbuf.at[slot], vsems.at[slot])

    def xcopy(step, t):
        tt = jnp.clip(ptr_ref[step] + t, 0, t_total - 1)
        cb = cols_ref[tt]
        slot = (step % 2) * max_tpr + t
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(cb * c, c), :], xbuf.at[slot], xsems.at[slot])

    def issue(step):
        @pl.when(step < nrb)
        def _():
            vcopy(step).start()
            for t in range(max_tpr):
                xcopy(step, t).start()

    @pl.when(i == 0)
    def _():
        issue(0)

    issue(i + 1)
    vcopy(i).wait()
    shift = ptr_ref[i] - vstart(i)
    n_t = ptr_ref[i + 1] - ptr_ref[i]
    vslot = i % 2
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for t in range(max_tpr):
        xcopy(i, t).wait()
        vt = vbuf[vslot][pl.ds(shift + t, 1)][0]
        contrib = jnp.dot(vt, xbuf[(i % 2) * max_tpr + t],
                          preferred_element_type=jnp.float32)
        acc += jnp.where(t < n_t, contrib, 0.0)
    out_ref[...] = acc.astype(out_ref.dtype)


def spmm_row_sweep_dma_v2(tile_ptr, tile_cols, vals, x, max_tpr,
                          *, interpret=False):
    """Same signature family as spmm_row_sweep_kernel — vals stays
    (T, R, C)."""
    t_total, r, c = vals.shape
    d = x.shape[1]
    nrb = tile_ptr.shape[0] - 1
    max_tpr = max(int(max_tpr), 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nrb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.TPUMemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.TPUMemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((r, d), lambda i, ptr, cols: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, max_tpr, r, c), vals.dtype),
            pltpu.VMEM((2 * max_tpr, c, d), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2 * max_tpr,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_dma_body_v2, max_tpr=max_tpr, r=r, c=c,
                          t_total=t_total),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrb * r, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_total * r * c * d,
            bytes_accessed=(t_total * (r * c + c * d)
                            + nrb * r * d) * vals.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(tile_ptr, tile_cols, vals, x)


def pad_layout(tg, vals):
    """Host-side: (T,R,C) tile list -> (nrb, max_tpr, R, C) dense-padded
    vals + (nrb, max_tpr) clamped col ids."""
    nrb = tg.num_row_blocks
    mt = tg.max_tiles_per_row
    ptr = np.asarray(jax.device_get(tg.tile_ptr))
    cols = np.asarray(jax.device_get(tg.tile_cols))
    t, r, c = vals.shape
    cols_pad = np.zeros((nrb, mt), np.int32)
    vp = np.zeros((nrb, mt, r, c), np.float32)
    v_host = np.asarray(jax.device_get(vals))
    for i in range(nrb):
        k = ptr[i + 1] - ptr[i]
        cols_pad[i, :k] = cols[ptr[i]:ptr[i + 1]]
        if k < mt:
            cols_pad[i, k:] = cols_pad[i, max(k - 1, 0)]
        vp[i, :k] = v_host[ptr[i]:ptr[i + 1]]
    return jnp.asarray(cols_pad), jnp.asarray(vp)


def main():
    rows = cols = 1024
    d = 128
    g = grid_graph(rows, cols)
    n, e = g.n_nodes, g.n_edges
    ro = tile_aligned_order(g, block=128)
    g_al, eperm = reorder_graph(g, ro)
    tg = tile_graph(g_al, 128, 128)
    rng = np.random.default_rng(0)
    ed = jnp.asarray(rng.uniform(size=g.num_edges_padded).astype(np.float32))
    vals = jax.jit(
        lambda ed: tg.scatter_edges(ed[jnp.asarray(eperm)])[: tg.num_tiles]
    )(ed)
    q = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    q_al = ro.scatter_nodes(q)
    q_pad = jnp.pad(q_al, ((0, tg.n_rows_padded - q_al.shape[0]), (0, 0)))
    cols_pad, vals_pad = pad_layout(tg, vals)
    print(f"grid n={n} e={e} nrb={tg.num_row_blocks} "
          f"max_tpr={tg.max_tiles_per_row} "
          f"vals_pad_gb={vals_pad.size * 4 / 1e9:.3f}", flush=True)

    # Correctness vs the shipped kernel.
    with jax.default_matmul_precision("highest"):
        y_ref = jax.jit(lambda v, x: tiled_spmm(tg, v, x))(vals, q_al)
        y_dma = jax.jit(
            lambda cp, vp, x: spmm_row_sweep_dma(cp, vp, x))(
                cols_pad, vals_pad, q_pad)
        okd = np.allclose(np.asarray(y_ref), np.asarray(y_dma)[: len(y_ref)],
                          rtol=2e-3, atol=2e-3)
        y_dma2 = jax.jit(
            lambda v, x: spmm_row_sweep_dma_v2(
                tg.tile_ptr, tg.tile_cols, v, x, tg.max_tiles_per_row))(
                    vals, q_pad)
        okd2 = np.allclose(
            np.asarray(y_ref), np.asarray(y_dma2)[: len(y_ref)],
            rtol=2e-3, atol=2e-3)
    print(f"allclose dma vs shipped: {okd}  v2: {okd2}", flush=True)

    out = {"allclose": bool(okd), "allclose_v2": bool(okd2)}

    def bench(name, fn, *args):
        rec = bench_fn(fn, args, warmup=1, iters="auto", name=name,
                       edges=e)
        out[name] = round(rec.time_s * 1e3, 3)
        print(f"  {name:24s} {rec.time_s * 1e3:9.3f} ms", flush=True)

    bench("spmm_shipped", lambda v, x: tiled_spmm(tg, v, x), vals, q_al)
    bench("spmm_dma_f32", spmm_row_sweep_dma, cols_pad, vals_pad, q_pad)
    bench("spmm_dma_bf16", spmm_row_sweep_dma,
          cols_pad, vals_pad.astype(jnp.bfloat16),
          q_pad.astype(jnp.bfloat16))
    print(json.dumps({"grid_dma": out}))


if __name__ == "__main__":
    main()
