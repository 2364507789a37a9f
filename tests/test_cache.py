"""Preprocessing cache round trip (reference i.pt parity, wrapper.py:114)."""

import numpy as np

from custom_op_benchmark_tpu.graph import cached, clique_batch, graph_key
from custom_op_benchmark_tpu.ops import ell_dual


def test_cached_view_roundtrip(tmp_path):
    g = clique_batch(3, 6)
    calls = []

    def build():
        calls.append(1)
        return ell_dual(g)

    v1 = cached(g, "ell_dual", build, cache_dir=str(tmp_path))
    v2 = cached(g, "ell_dual", build, cache_dir=str(tmp_path))
    assert len(calls) == 1                      # second call hit the cache
    for a, b in zip(*(map(lambda v: __import__("jax").tree_util.tree_leaves(v),
                          (v1, v2)))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Static metadata survived.
    assert v2[0].direction == "src" and v2[1].direction == "dst"
    assert v2[0].n_edges == g.n_edges

    # Different graph -> different key.
    g2 = clique_batch(3, 7)
    assert graph_key(g, "x") != graph_key(g2, "x")
