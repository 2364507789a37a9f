"""Strategy advisor diagnostics."""

import numpy as np

from custom_op_benchmark_tpu.graph import clique_batch, random_graph
from custom_op_benchmark_tpu.utils.summary import describe


def test_describe_clique():
    s = describe(clique_batch(8, 10))
    assert s.n_nodes == 80 and s.n_edges == 800
    assert s.num_components == 8 and s.max_component == 10
    assert s.recommended == "dense_block"
    assert "dense_block" in str(s)


def test_describe_powerlaw():
    s = describe(random_graph(5000, 20000, seed=0, power_law=True))
    assert s.max_out_degree >= 50        # heavy tail present
    assert s.recommended == "ell"


def test_describe_grid_recommends_tiled():
    """The advisor's middle rung, pinned to the measured winner
    (round-3 verdict #5): on the locality-rich 2-D grid the BSR tiled
    strategy won every recorded row (SUITE_grid_r4.json — SpMM 17.0 ms
    vs 69.6 ELL, fused attention 37.5 vs 83.7 on the 1024² grid), so
    describe must route grids to tiled, not ELL."""
    from custom_op_benchmark_tpu.graph import grid_graph

    s = describe(grid_graph(64, 64))
    assert s.recommended.startswith("tiled"), s.recommended
