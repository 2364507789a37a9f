"""Block-sparse tiling: the TPU-native sparse format for the hot path.

The reference makes sparse ops fast on GPU with 32-edge row chunks plus
scatter atomics (part_csr.py, atomic.cuh). The TPU equivalent inverts the
design: partition the *node* axes into fixed tiles of ``(tile_r, tile_c)``
(MXU-aligned, default 128×128) and keep only the adjacency tiles that
contain at least one edge. Every op then becomes dense math over tiles:

- SDDMM            → per tile:  ``A[I] @ B[J]^T``  (MXU), masked;
- edge-softmax     → online softmax over each row-block's tile sequence;
- vector-SpMM      → per tile:  ``S_tile @ X[J]`` accumulated into ``Y[I]``
                     — conflict-free because one grid program owns row
                     block ``I`` outright (no atomics by construction).

Gathers disappear entirely: a tile's operands are *contiguous slices* of
the node-feature arrays. This is exactly how the reference's benchmark
workload wants to be computed — the 512×30-clique graph (wrapper.py:79-101)
is a block-diagonal attention mask, and tiles recover the dense-bmm
formulation the reference benchmarks against (wrapper.py:185).

Density caveat: tiling only wins when edges exhibit locality (attention
masks, community-ordered graphs). ``TiledGraph.density`` reports the edge /
slot ratio; the op layer falls back to segment kernels when it is too low.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from custom_op_benchmark_tpu.graph.graph import Graph


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TiledGraph:
    """Block-sparse (BSR-like) view of a :class:`Graph`.

    Leaves:
      tile_rows: (T,) int32 — row-block index of each nonzero tile,
                 nondecreasing (tiles sorted by (row-block, col-block)).
      tile_cols: (T,) int32 — col-block index of each tile.
      tile_ptr:  (num_row_blocks + 1,) int32 — CSR over tiles by row block.
      mask:      (T, tile_r, tile_c) bool — adjacency within each tile.
      edge_tile / edge_r / edge_c: (E,) int32 — canonical edge id →
                 (tile, in-tile row, in-tile col); padded edges point at
                 slot (0,0,0) of a scratch tile T (see ``scatter_edges``).

    Static: n_nodes, n_edges, tile_r, tile_c, num_row_blocks,
    num_col_blocks, num_tiles, max_tiles_per_row.
    """

    tile_rows: jax.Array
    tile_cols: jax.Array
    tile_ptr: jax.Array
    # Column-sorted view (the transpose-graph trick at tile granularity —
    # backward passes sweep tiles grouped by col block, reference analog:
    # graphop_kernel.cu:398, 586-597):
    #   tile_perm_c: (T,) int32 — tile index of the k-th tile in
    #                (col-block, row-block) order;
    #   tile_ptr_c:  (num_col_blocks + 1,) int32 — CSR over that order.
    tile_perm_c: jax.Array
    tile_ptr_c: jax.Array
    mask: jax.Array
    edge_tile: jax.Array
    edge_r: jax.Array
    edge_c: jax.Array
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))
    tile_r: int = dataclasses.field(metadata=dict(static=True))
    tile_c: int = dataclasses.field(metadata=dict(static=True))
    num_row_blocks: int = dataclasses.field(metadata=dict(static=True))
    num_col_blocks: int = dataclasses.field(metadata=dict(static=True))
    num_tiles: int = dataclasses.field(metadata=dict(static=True))
    max_tiles_per_row: int = dataclasses.field(metadata=dict(static=True))
    max_tiles_per_col: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_rows_padded(self) -> int:
        return self.num_row_blocks * self.tile_r

    @property
    def n_cols_padded(self) -> int:
        return self.num_col_blocks * self.tile_c

    @property
    def density(self) -> float:
        """Fraction of occupied slots across nonzero tiles."""
        slots = max(self.num_tiles, 1) * self.tile_r * self.tile_c
        return self.n_edges / slots

    # ---- edge-list ↔ tile-dense conversion ------------------------------

    def scatter_edges(self, vals: jax.Array) -> jax.Array:
        """Scatter canonical edge values (E, ...) → (T+1, tile_r, tile_c, ...).

        Slot ``T`` (one scratch tile) absorbs padded edges; callers slice
        ``[:T]``. Deterministic: each (tile, r, c) has at most one edge.
        """
        trail = vals.shape[1:]
        out = jnp.zeros(
            (self.num_tiles + 1, self.tile_r, self.tile_c) + trail,
            vals.dtype,
        )
        return out.at[self.edge_tile, self.edge_r, self.edge_c].set(
            vals, mode="drop"
        )

    def gather_edges(self, tiles: jax.Array) -> jax.Array:
        """Gather (T, tile_r, tile_c, ...) tile-dense values → (E, ...)."""
        return tiles[
            jnp.minimum(self.edge_tile, self.num_tiles - 1),
            self.edge_r,
            self.edge_c,
        ]

    def transpose(self) -> "TiledGraph":
        """The transpose graph's tiling, sharing this one's edge ids.

        Tiles reorder to (col-block, row-block)-sorted and each mask tile
        transposes. Cold-path cost O(T·R·C); build once per graph next to
        :func:`tile_graph`.
        """
        perm = self.tile_perm_c
        inv = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(self.num_tiles, dtype=perm.dtype)
        )
        return TiledGraph(
            tile_rows=self.tile_cols[perm],
            tile_cols=self.tile_rows[perm],
            tile_ptr=self.tile_ptr_c,
            tile_perm_c=inv,
            tile_ptr_c=self.tile_ptr,
            mask=jnp.transpose(self.mask, (0, 2, 1))[perm],
            edge_tile=jnp.where(
                self.edge_tile >= self.num_tiles,
                self.num_tiles,  # padded edges keep the scratch slot
                inv[jnp.minimum(self.edge_tile, self.num_tiles - 1)],
            ),
            edge_r=self.edge_c,
            edge_c=self.edge_r,
            n_nodes=self.n_nodes,
            n_edges=self.n_edges,
            tile_r=self.tile_c,
            tile_c=self.tile_r,
            num_row_blocks=self.num_col_blocks,
            num_col_blocks=self.num_row_blocks,
            num_tiles=self.num_tiles,
            max_tiles_per_row=self.max_tiles_per_col,
            max_tiles_per_col=self.max_tiles_per_row,
        )


def tile_graph(g: Graph, tile_r: int = 128, tile_c: int = 128) -> TiledGraph:
    """Build the block-sparse view of ``g`` (host-side, cold path)."""
    src = np.asarray(jax.device_get(g.src))[: g.n_edges].astype(np.int64)
    dst = np.asarray(jax.device_get(g.dst))[: g.n_edges].astype(np.int64)
    nrb = max(1, -(-g.n_nodes // tile_r))
    ncb = max(1, -(-g.n_nodes // tile_c))
    rb = src // tile_r
    cb = dst // tile_c
    key = rb * ncb + cb
    tile_keys, edge_tile = np.unique(key, return_inverse=True)
    t = len(tile_keys)
    tile_rows = (tile_keys // ncb).astype(np.int32)
    tile_cols = (tile_keys % ncb).astype(np.int32)
    tile_ptr = np.zeros(nrb + 1, dtype=np.int32)
    np.cumsum(np.bincount(tile_rows, minlength=nrb), out=tile_ptr[1:])
    er = (src % tile_r).astype(np.int32)
    ec = (dst % tile_c).astype(np.int32)
    mask = np.zeros((t, tile_r, tile_c), dtype=bool)
    mask[edge_tile, er, ec] = True

    # Column-sorted tile view for backward sweeps.
    perm_c = np.lexsort((tile_rows, tile_cols)).astype(np.int32)
    tile_ptr_c = np.zeros(ncb + 1, dtype=np.int32)
    np.cumsum(np.bincount(tile_cols, minlength=ncb), out=tile_ptr_c[1:])
    max_tpc = int(np.max(np.diff(tile_ptr_c))) if ncb else 0

    e_pad = g.num_edges_padded
    et = np.full(e_pad, t, dtype=np.int32)
    err = np.zeros(e_pad, dtype=np.int32)
    ecc = np.zeros(e_pad, dtype=np.int32)
    et[: g.n_edges] = edge_tile
    err[: g.n_edges] = er
    ecc[: g.n_edges] = ec

    max_tpr = int(np.max(np.diff(tile_ptr))) if nrb else 0

    return TiledGraph(
        tile_rows=jnp.asarray(tile_rows),
        tile_cols=jnp.asarray(tile_cols),
        tile_ptr=jnp.asarray(tile_ptr),
        tile_perm_c=jnp.asarray(perm_c),
        tile_ptr_c=jnp.asarray(tile_ptr_c),
        mask=jnp.asarray(mask),
        edge_tile=jnp.asarray(et),
        edge_r=jnp.asarray(err),
        edge_c=jnp.asarray(ecc),
        n_nodes=g.n_nodes,
        n_edges=g.n_edges,
        tile_r=tile_r,
        tile_c=tile_c,
        num_row_blocks=nrb,
        num_col_blocks=ncb,
        num_tiles=t,
        max_tiles_per_row=max_tpr,
        max_tiles_per_col=max_tpc,
    )


# Alias matching the builder-style API.
TiledGraph.from_graph = staticmethod(tile_graph)
