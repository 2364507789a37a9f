"""Bitwise parity of the native halo builders vs the numpy fallback.

`graphcore_halo_plan` / `graphcore_halo_pack` (csrc/graphcore.cpp) must
produce EXACTLY the arrays the numpy builders in parallel/halo.py
produce — the numpy path stays as the spec and the fallback. Randomized
graphs (uniform + zipf), every HaloEll field compared elementwise.
"""

import jax
import numpy as np
import pytest

from custom_op_benchmark_tpu.graph import native
from custom_op_benchmark_tpu.graph.graph import from_coo
from custom_op_benchmark_tpu.parallel import halo_ell, halo_graph, make_mesh


def _ell_arrays(he):
    out = {}
    for name in ("rows_b", "cols_b", "epos_b", "rows_t_b", "cols_t_b",
                 "epos_t_b"):
        out[name] = [np.asarray(jax.device_get(a))
                     for a in getattr(he, name)]
    for name in ("row_pos", "row_pos_t", "slot_pos", "halo_pos_t",
                 "recv_pos"):
        out[name] = np.asarray(jax.device_get(getattr(he, name)))
    out["n_bnd"] = he.n_bnd
    out["widths"] = he.widths
    out["halo_rows_t"] = he.halo_rows_t
    out["n_halo_t"] = he.n_halo_t
    return out


@pytest.mark.skipif(native._load() is None
                    or not hasattr(native._load(), "graphcore_halo_plan"),
                    reason="native library unavailable")
@pytest.mark.parametrize("trial", range(6))
def test_halo_native_bitwise_parity(trial, monkeypatch):
    rng = np.random.default_rng(100 + trial)
    n = int(rng.integers(40, 2500))
    e = int(rng.integers(1, 5 * n))
    p = int(rng.choice([2, 4, 8]))
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    if trial % 3 == 2:  # power-law-ish dst (hub rows, wide buckets)
        dst = (rng.zipf(1.5, size=e) - 1) % n
    g = from_coo(src, dst, n_nodes=n)
    mesh = make_mesh((p,), ("edge",))

    hg_nat = halo_graph(g, mesh)
    he_nat = _ell_arrays(halo_ell(hg_nat, mesh))

    monkeypatch.setattr(native, "halo_plan_native",
                        lambda *a, **k: None)
    monkeypatch.setattr(native, "halo_pack_native",
                        lambda *a, **k: None)
    hg_np = halo_graph(g, mesh)
    for f in ("send_idx", "src_ext", "dst_loc", "eid"):
        x = np.asarray(jax.device_get(getattr(hg_nat, f)))
        y = np.asarray(jax.device_get(getattr(hg_np, f)))
        assert x.shape == y.shape and (x == y).all(), ("plan", f)
    he_np = _ell_arrays(halo_ell(hg_np, mesh))

    assert set(he_nat) == set(he_np)
    for key in he_nat:
        a, b = he_nat[key], he_np[key]
        if isinstance(a, list):
            assert len(a) == len(b), key
            for i, (x, y) in enumerate(zip(a, b)):
                assert x.shape == y.shape and (x == y).all(), (key, i)
        elif isinstance(a, np.ndarray):
            assert a.shape == b.shape and (a == b).all(), key
        else:
            assert a == b, key
