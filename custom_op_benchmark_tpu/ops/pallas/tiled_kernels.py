"""Core Pallas kernels on the block-sparse (BSR) tiling.

Three kernels cover the whole op family's forward and backward passes
(SURVEY.md §2.3 VJP contracts):

- :func:`sddmm_tiles_kernel` — per nonzero tile (I, J):
  ``S[t] = mask[t] ⊙ (A[I·R:(I+1)·R] @ B[J·C:(J+1)·C]ᵀ)``. Forward of
  SDDMM; also dvals of SpMM (with A=dy, B=x).
  (reference: maskedmm_csr_forward_kernel, graphop_kernel.cu:41-55 —
  there per-edge serial dot products; here one 128×d×128 MXU matmul per
  tile.)

- :func:`spmm_row_sweep_kernel` — per row block I, sweeping its tiles:
  ``Y[I] = Σ_t S[t] @ X[J(t)]``. Forward of vector-SpMM; also dA of SDDMM.
  Row-owned accumulation replaces the reference's AtomicAdd scatters
  (graphop_kernel.cu:119-130 + atomic.cuh).

- :func:`spmm_col_sweep_kernel` — per col block J, sweeping the
  column-sorted tile view: ``X'[J] = Σ_t S[t]ᵀ @ Y[I(t)]``. The
  transpose-graph backward (dB of SDDMM, dx of SpMM; reference launches
  its forward kernels over the column CSR instead —
  graphop_kernel.cu:355-409, 544-600).

Layout invariants: tiles are (tile_r × tile_c) = MXU-aligned; node arrays
padded to whole blocks; grid dim 1 (the tile sweep) is innermost so output
blocks stay resident in VMEM across a sweep (zero HBM traffic for
accumulators); duplicate clamped index_map entries make padding iterations
free (no re-fetch, compute skipped under ``pl.when``).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# SDDMM over tiles: grid = (T,)
# ---------------------------------------------------------------------------

def _sddmm_body(rows_ref, cols_ref, a_ref, b_ref, mask_ref, out_ref):
    s = jax.lax.dot_general(
        a_ref[...],
        b_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),   # A @ B^T
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = jnp.where(mask_ref[0], s, 0.0).astype(out_ref.dtype)


def sddmm_tiles_kernel(tile_rows, tile_cols, mask, A, B):
    """A: (NRB·R, d), B: (NCB·C, d) → scores (T, R, C), masked.

    d must be a multiple of 128 (callers pad).
    """
    t, r, c = mask.shape
    d = A.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((r, d), lambda i, rows, cols: (rows[i], 0)),
            pl.BlockSpec((c, d), lambda i, rows, cols: (cols[i], 0)),
            pl.BlockSpec((1, r, c), lambda i, rows, cols: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, c), lambda i, rows, cols: (i, 0, 0)),
    )
    return pl.pallas_call(
        _sddmm_body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, r, c), A.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * r * c * d,
            bytes_accessed=(t * (r + c) * d + t * r * c) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(tile_rows, tile_cols, A, B, mask)


# ---------------------------------------------------------------------------
# SpMM row sweep: grid = (NRB, MAX_TPR), t innermost
# ---------------------------------------------------------------------------

def _row_sweep_body(ptr_ref, cols_ref, vals_ref, x_ref, out_ref):
    i = pl.program_id(0)
    t = pl.program_id(1)
    n_t = ptr_ref[i + 1] - ptr_ref[i]

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(t < n_t)
    def _():
        out_ref[...] += jnp.dot(
            vals_ref[0], x_ref[...], preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


def _clamped_tile(i, t, ptr, tmax):
    # Clamp into the row block's own range so padded sweep iterations
    # re-address the previous tile (no re-fetch) and stay in bounds even
    # for empty row blocks.
    lo = ptr[i]
    hi = jnp.maximum(ptr[i + 1] - 1, lo)
    return jnp.clip(lo + t, 0, jnp.minimum(hi, tmax - 1))


def spmm_row_sweep_kernel(tile_ptr, tile_cols, vals, x, max_tiles: int):
    """vals: (T, R, C) tile-dense, x: (NCB·C, d) → y (NRB·R, d)."""
    t, r, c = vals.shape
    d = x.shape[1]
    nrb = tile_ptr.shape[0] - 1

    def vals_map(i, s, ptr, cols):
        return (_clamped_tile(i, s, ptr, t), 0, 0)

    def x_map(i, s, ptr, cols):
        return (cols[_clamped_tile(i, s, ptr, t)], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nrb, max(max_tiles, 1)),
        in_specs=[
            pl.BlockSpec((1, r, c), vals_map),
            pl.BlockSpec((c, d), x_map),
        ],
        out_specs=pl.BlockSpec((r, d), lambda i, s, ptr, cols: (i, 0)),
    )
    return pl.pallas_call(
        _row_sweep_body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrb * r, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * r * c * d,
            bytes_accessed=(t * r * c + t * c * d + nrb * r * d) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(tile_ptr, tile_cols, vals, x)


# ---------------------------------------------------------------------------
# SpMM col sweep (transpose): grid = (NCB, MAX_TPC), t innermost
# ---------------------------------------------------------------------------

def _col_sweep_body(ptr_ref, perm_ref, rows_ref, vals_ref, y_ref, out_ref):
    j = pl.program_id(0)
    t = pl.program_id(1)
    n_t = ptr_ref[j + 1] - ptr_ref[j]

    @pl.when(t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(t < n_t)
    def _():
        out_ref[...] += jax.lax.dot_general(
            vals_ref[0],
            y_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),   # Sᵀ @ Y
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def spmm_col_sweep_kernel(tile_ptr_c, tile_perm_c, tile_rows, vals, y,
                          max_tiles: int):
    """vals: (T, R, C), y: (NRB·R, d) → x' (NCB·C, d) = Σ Sᵀ·Y."""
    t, r, c = vals.shape
    d = y.shape[1]
    ncb = tile_ptr_c.shape[0] - 1

    def vals_map(j, s, ptr, perm, rows):
        return (perm[_clamped_tile(j, s, ptr, t)], 0, 0)

    def y_map(j, s, ptr, perm, rows):
        return (rows[perm[_clamped_tile(j, s, ptr, t)]], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ncb, max(max_tiles, 1)),
        in_specs=[
            pl.BlockSpec((1, r, c), vals_map),
            pl.BlockSpec((r, d), y_map),
        ],
        out_specs=pl.BlockSpec(
            (c, d), lambda j, s, ptr, perm, rows: (j, 0)
        ),
    )
    return pl.pallas_call(
        _col_sweep_body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ncb * c, d), y.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * t * r * c * d,
            bytes_accessed=(t * r * c + t * r * d + ncb * c * d) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(tile_ptr_c, tile_perm_c, tile_rows, vals, y)
