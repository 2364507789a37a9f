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


def test_default_dir_is_user_owned(monkeypatch, tmp_path):
    """ADVICE r1: the default cache dir must be user-owned (no /tmp
    world-writable pickle source)."""
    import os

    from custom_op_benchmark_tpu.graph import cache as cache_mod

    monkeypatch.delenv("COB_CACHE_DIR", raising=False)
    d = cache_mod._default_dir()
    assert d.startswith(os.path.expanduser("~"))


def test_untrusted_dir_not_unpickled(tmp_path):
    """Entries in a group/world-writable directory are rebuilt, not
    loaded (the .tree file is pickle — a tampered dir must not execute)."""
    import os

    import numpy as np

    from custom_op_benchmark_tpu.graph import from_coo
    from custom_op_benchmark_tpu.graph.cache import cached

    g = from_coo([0, 1], [1, 0], 2)
    d = str(tmp_path / "c")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return {"a": np.arange(3)}

    cached(g, "v", build, cache_dir=d)
    assert calls["n"] == 1
    # Trusted dir: second call loads from disk.
    cached(g, "v", build, cache_dir=d)
    assert calls["n"] == 1
    # World-writable dir: refuse to load, rebuild instead.
    os.chmod(d, 0o777)
    cached(g, "v", build, cache_dir=d)
    assert calls["n"] == 2
