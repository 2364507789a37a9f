"""ctypes bindings to the native graphcore library, with numpy fallback.

The reference's host-side preprocessing is pure-Python loops
(wrapper.py:84-116; part_csr.py with a device round-trip); at
papers100M scale that is hours. ``libgraphcore.so`` (csrc/graphcore.cpp)
does the same work in C++ at memory speed. Every entry point has an exact
numpy fallback so the framework works without the compiled library.

Build: ``make -C custom_op_benchmark_tpu/csrc`` (plain g++, no deps).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "csrc",
                         "libgraphcore.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    src = os.path.join(os.path.dirname(path), "graphcore.cpp")
    stale = (
        not os.path.exists(path)
        or (os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(path))
    )
    if stale:
        # (Re)build — the .so is not committed; a stale binary would
        # silently shadow source changes (native toolchain is a soft
        # dependency; numpy fallbacks cover its absence).
        import subprocess

        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(path)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            if not os.path.exists(path):
                _lib = False
                return _lib
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        _lib = False
        return _lib

    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.graphcore_build_dual_csr.restype = ctypes.c_int32
    lib.graphcore_build_dual_csr.argtypes = [
        i64p, i64p, ctypes.c_int64, ctypes.c_int64,
        i32p, i32p, i32p, i32p, i32p, i32p,
    ]
    lib.graphcore_partition_csr.restype = ctypes.c_int64
    lib.graphcore_partition_csr.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int32, i32p, i32p,
    ]
    lib.graphcore_sample_in_edges.restype = ctypes.c_int64
    lib.graphcore_sample_in_edges.argtypes = [
        i32p, i32p, ctypes.c_int64, i32p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_uint64, i32p, i32p,
    ]
    lib.graphcore_tile_edges.restype = ctypes.c_int64
    lib.graphcore_tile_edges.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, i32p, i32p, i32p, i32p, i32p,
    ]
    try:
        lib.graphcore_connected_components.restype = ctypes.c_int64
        lib.graphcore_connected_components.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int64, i32p,
        ]
    except AttributeError:
        pass  # stale .so from before this symbol existed
    try:
        lib.graphcore_sample_subgraph.restype = ctypes.c_int64
        lib.graphcore_sample_subgraph.argtypes = [
            i32p, i32p, ctypes.c_int64,            # csc, n_nodes
            i32p, ctypes.c_int64,                  # seeds
            i32p, ctypes.c_int64,                  # fanouts
            ctypes.c_uint64, ctypes.c_int32,       # seed, self_loops
            ctypes.c_int64, ctypes.c_int64,        # max_nodes, max_edges
            ctypes.c_int32, ctypes.c_int32,        # w, n_threads
            i32p, i32p, i32p, i32p, i64p,          # outputs
        ]
    except AttributeError:
        pass
    try:
        lib.graphcore_halo_plan.restype = ctypes.c_int64
        lib.graphcore_halo_plan.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int64,   # src, dst, e, n
            ctypes.c_int64, ctypes.c_int64,               # p, n_per
            ctypes.c_int64, ctypes.c_int64,               # pad, eid pad
            i64p, i32p, i32p, i32p, i32p,                 # sizes, outputs
        ]
        lib.graphcore_halo_pack.restype = ctypes.c_int64
        lib.graphcore_halo_pack.argtypes = [
            i32p, i32p, i32p, ctypes.c_int64,    # row/col/valid mats, valid_lt
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # p, e_p, n_rows
            i64p, i64p, ctypes.c_int64,                   # widths, nw, cap
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int32,  # spec mode/thr/side
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # pads, row_pad
            i64p, i64p,                                   # r_pad_b, n_spec_b
            i32p, i32p, i32p, i32p, i32p, i32p,           # flat outputs
        ]
    except AttributeError:
        pass
    try:
        lib.graphcore_ell_pack.restype = ctypes.c_int64
        lib.graphcore_ell_pack.argtypes = [
            i32p, ctypes.c_int64, i32p, i64p, ctypes.c_int64,
            i64p, ctypes.c_int64, ctypes.c_int64, i64p,
            i32p, i32p, i32p, i32p, i64p,
        ]
    except AttributeError:
        pass
    _lib = lib
    return _lib


def available() -> bool:
    return bool(_load())


def _p32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _p64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def build_dual_csr(src, dst, n_nodes: int):
    """Canonical sort + dual CSR. Returns (src_c, dst_c, indptr_r,
    csc_perm, csc_perm_inv, indptr_c) as int32, or None if unavailable."""
    lib = _load()
    if not lib:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    e = len(src)
    src_c = np.empty(e, np.int32)
    dst_c = np.empty(e, np.int32)
    indptr_r = np.empty(n_nodes + 2, np.int32)
    csc_perm = np.empty(e, np.int32)
    csc_perm_inv = np.empty(e, np.int32)
    indptr_c = np.empty(n_nodes + 2, np.int32)
    rc = lib.graphcore_build_dual_csr(
        _p64(src), _p64(dst), e, n_nodes,
        _p32(src_c), _p32(dst_c), _p32(indptr_r),
        _p32(csc_perm), _p32(csc_perm_inv), _p32(indptr_c),
    )
    if rc != 0:
        raise ValueError(f"graphcore_build_dual_csr failed: rc={rc}")
    return src_c, dst_c, indptr_r, csc_perm, csc_perm_inv, indptr_c


def partition_csr_native(indptr, chunk_size: int):
    lib = _load()
    if not lib:
        return None
    indptr = np.ascontiguousarray(indptr, np.int32)
    n_rows = len(indptr) - 1
    total = lib.graphcore_partition_csr(
        _p32(indptr), n_rows, chunk_size, None, None
    )
    row = np.empty(total, np.int32)
    cptr = np.empty(total + 1, np.int32)
    lib.graphcore_partition_csr(
        _p32(indptr), n_rows, chunk_size, _p32(row), _p32(cptr)
    )
    return row, cptr


def connected_components_native(src, dst, n_nodes: int):
    """Union-find component labels (root node id per node), or None."""
    lib = _load()
    if not lib or not hasattr(lib, "graphcore_connected_components"):
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    labels = np.empty(n_nodes, np.int32)
    lib.graphcore_connected_components(
        _p32(src), _p32(dst), len(src), n_nodes, _p32(labels)
    )
    return labels


def sample_in_edges_native(indptr_c, indices_c, n_nodes, seeds,
                           fanout: int, seed: int):
    lib = _load()
    if not lib:
        return None
    indptr_c = np.ascontiguousarray(indptr_c, np.int32)
    indices_c = np.ascontiguousarray(indices_c, np.int32)
    seeds = np.ascontiguousarray(seeds, np.int32)
    cap = len(seeds) * fanout
    src = np.empty(cap, np.int32)
    dst = np.empty(cap, np.int32)
    w = lib.graphcore_sample_in_edges(
        _p32(indptr_c), _p32(indices_c), n_nodes, _p32(seeds),
        len(seeds), fanout, seed, _p32(src), _p32(dst),
    )
    return src[:w], dst[:w]


def sample_subgraph_native(indptr_c, indices_c, n_nodes, seeds, fanouts,
                           seed: int, *, add_self_loops: bool,
                           max_nodes: int, max_edges: int, w: int,
                           n_threads: int = 1):
    """Whole-minibatch layered sampling (graphcore_sample_subgraph).

    Returns ``(node_ids, n_local, lsrc, ldst, n_edges, in_cols)`` with
    ``lsrc/ldst`` already sized ``max_edges`` (tail beyond ``n_edges``
    is garbage — callers slice), or None when the library is missing.
    Raises AssertionError when the sampled in-degree exceeds ``w`` (the
    invariant data/sampling.py documents).
    """
    lib = _load()
    if not lib or not hasattr(lib, "graphcore_sample_subgraph"):
        return None
    indptr_c = np.ascontiguousarray(indptr_c, np.int32)
    indices_c = np.ascontiguousarray(indices_c, np.int32)
    seeds = np.ascontiguousarray(seeds, np.int32)
    fanouts = np.ascontiguousarray(fanouts, np.int32)
    node_ids = np.empty(max_nodes, np.int32)
    lsrc = np.empty(max_edges, np.int32)
    ldst = np.empty(max_edges, np.int32)
    in_cols = np.empty((max_nodes, int(w)), np.int32)
    n_out = np.zeros(2, np.int64)
    rc = lib.graphcore_sample_subgraph(
        _p32(indptr_c), _p32(indices_c), n_nodes,
        _p32(seeds), len(seeds), _p32(fanouts), len(fanouts),
        seed, int(add_self_loops), max_nodes, max_edges, int(w),
        int(n_threads),
        _p32(node_ids), _p32(lsrc), _p32(ldst), _p32(in_cols),
        _p64(n_out),
    )
    if rc == -4:
        raise AssertionError(
            f"sampled in-degree exceeds the dense-ELL width {w}; "
            "sampler invariant broken"
        )
    if rc != 0:
        return None
    return node_ids, int(n_out[0]), lsrc, ldst, int(n_out[1]), in_cols


def ell_pack_native(indptr, cols_all, eids_all, n_nodes: int,
                    e_pad: int, widths, row_pad: int):
    """Native degree-bucketed ELL packing (graph/ell.py contract).

    Returns (bucket_rows, rows_flat, cols_flat, eid_flat, row_pos,
    edge_pos) with per-bucket arrays concatenated in width order, or
    None when the library is unavailable. ``widths`` must already be
    extended to cover the max degree (the caller computes that from the
    degree array it owns).
    """
    lib = _load()
    if not lib or not hasattr(lib, "graphcore_ell_pack"):
        return None
    indptr = np.ascontiguousarray(indptr, np.int32)
    cols_all = np.ascontiguousarray(cols_all, np.int32)
    eids_all = np.ascontiguousarray(eids_all, np.int64)
    widths = np.ascontiguousarray(widths, np.int64)
    nw = len(widths)
    bucket_rows = np.zeros(nw, np.int64)
    null32 = ctypes.POINTER(ctypes.c_int32)()
    null64 = ctypes.POINTER(ctypes.c_int64)()
    rc = lib.graphcore_ell_pack(
        _p32(indptr), n_nodes, _p32(cols_all), _p64(eids_all), e_pad,
        _p64(widths), nw, row_pad, _p64(bucket_rows),
        null32, null32, null32, null32, null64,
    )
    if rc < 0:
        return None
    total_rows = int(bucket_rows.sum())
    total_slots = int((bucket_rows * widths).sum())
    rows_flat = np.empty(total_rows, np.int32)
    cols_flat = np.empty(total_slots, np.int32)
    eid_flat = np.empty(total_slots, np.int32)
    row_pos = np.empty(n_nodes, np.int32)
    edge_pos = np.empty(e_pad, np.int64)
    rc = lib.graphcore_ell_pack(
        _p32(indptr), n_nodes, _p32(cols_all), _p64(eids_all), e_pad,
        _p64(widths), nw, row_pad, _p64(bucket_rows),
        _p32(rows_flat), _p32(cols_flat), _p32(eid_flat),
        _p32(row_pos), _p64(edge_pos),
    )
    if rc < 0:
        return None
    return bucket_rows, rows_flat, cols_flat, eid_flat, row_pos, edge_pos


def halo_plan_native(src, dst, n: int, p: int, n_per: int,
                     pad_multiple: int, eid_pad: int):
    """Native halo plan (parallel/halo.py halo_graph contract).

    Returns ``(send_idx (p,p,m), src_ext (p,e_p), dst_loc (p,e_p),
    eid (p,e_p), e_p, m_max)`` bitwise-identical to the numpy builder,
    or None when the library is unavailable / the shape needs the
    fallback.
    """
    lib = _load()
    if not lib or not hasattr(lib, "graphcore_halo_plan"):
        return None
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    e = len(src)
    sizes = np.zeros(2, np.int64)
    null32 = ctypes.POINTER(ctypes.c_int32)()
    rc = lib.graphcore_halo_plan(
        _p32(src), _p32(dst), e, n, p, n_per, pad_multiple, eid_pad,
        _p64(sizes), null32, null32, null32, null32,
    )
    if rc != 0:
        return None
    e_p, m_max = int(sizes[0]), int(sizes[1])
    send_idx = np.empty((p, p, m_max), np.int32)
    src_ext = np.empty((p, e_p), np.int32)
    dst_loc = np.empty((p, e_p), np.int32)
    eid = np.empty((p, e_p), np.int32)
    rc = lib.graphcore_halo_plan(
        _p32(src), _p32(dst), e, n, p, n_per, pad_multiple, eid_pad,
        _p64(sizes), _p32(send_idx), _p32(src_ext), _p32(dst_loc),
        _p32(eid),
    )
    if rc != 0:
        return None
    return send_idx, src_ext, dst_loc, eid, e_p, m_max


def halo_pack_native(row_mat, col_mat, valid_mat, valid_lt: int,
                     p: int, n_rows: int,
                     widths, spec_mode: int, spec_thresh: int,
                     special_side: str, pad_row: int, pad_col: int,
                     row_pad: int = 8, want_slot_pos=False,
                     want_section_pos=False, nw_cap: int = 48):
    """Native shared-shape degree-bucket packer (_pack_shared contract).

    Edges come as the ``(P, e_p)`` shard-local plan matrices that
    ``halo_graph`` already produced — edge ``(s, j)`` has row
    ``row_mat[s, j]``, col ``col_mat[s, j]``, slot position ``j``, and
    is real iff ``0 <= valid_mat[s, j] < valid_lt`` (pass ``dst_loc``
    both times; its pad is ``n_per``) — so no e-scale flat lists are
    ever built on the Python side.

    Returns ``(rows_b, cols_b, epos_b, row_pos, splits, bucket_widths,
    total_rows, section_pos, total_spec, slot_pos)`` — the _pack_shared
    tuple plus ``slot_pos`` (None unless requested) — or None when the
    library is unavailable or the size guards trip (numpy fallback).
    """
    lib = _load()
    if not lib or not hasattr(lib, "graphcore_halo_pack"):
        return None
    row_mat = np.ascontiguousarray(row_mat, np.int32)
    col_mat = np.ascontiguousarray(col_mat, np.int32)
    valid_mat = np.ascontiguousarray(valid_mat, np.int32)
    e_p = row_mat.shape[1]
    w0 = sorted(set(int(w) for w in widths))
    wbuf = np.zeros(nw_cap, np.int64)
    wbuf[: len(w0)] = w0
    nw_io = np.array([len(w0)], np.int64)
    r_pad_b = np.zeros(nw_cap, np.int64)
    n_spec_b = np.zeros(nw_cap, np.int64)
    side = 0 if special_side == "tail" else 1
    null32 = ctypes.POINTER(ctypes.c_int32)()
    total_rows = lib.graphcore_halo_pack(
        _p32(row_mat), _p32(col_mat), _p32(valid_mat), valid_lt,
        p, e_p, n_rows, _p64(wbuf), _p64(nw_io), nw_cap,
        spec_mode, spec_thresh, side, pad_row, pad_col, row_pad,
        _p64(r_pad_b), _p64(n_spec_b),
        null32, null32, null32, null32, null32, null32,
    )
    if total_rows < 0:
        return None
    nw = int(nw_io[0])
    wa = wbuf[:nw]
    rows_flat = np.empty(int(p * r_pad_b[:nw].sum()), np.int32)
    n_slots = int(p * (r_pad_b[:nw] * wa).sum())
    cols_flat = np.empty(n_slots, np.int32)
    epos_flat = np.empty(n_slots, np.int32)
    row_pos = np.empty((p, n_rows), np.int32)
    section_pos = (np.empty((p, n_rows), np.int32) if want_section_pos
                   else None)
    slot_pos = np.empty((p, e_p), np.int32) if want_slot_pos else None
    rc = lib.graphcore_halo_pack(
        _p32(row_mat), _p32(col_mat), _p32(valid_mat), valid_lt,
        p, e_p, n_rows, _p64(wbuf), _p64(nw_io), nw_cap,
        spec_mode, spec_thresh, side, pad_row, pad_col, row_pad,
        _p64(r_pad_b), _p64(n_spec_b),
        _p32(rows_flat), _p32(cols_flat), _p32(epos_flat),
        _p32(row_pos),
        _p32(section_pos) if want_section_pos else null32,
        _p32(slot_pos) if want_slot_pos else null32,
    )
    if rc < 0:
        return None
    # Split the flat buckets into the kept (non-empty) per-width arrays.
    rows_b, cols_b, epos_b, bw, splits = [], [], [], [], []
    ro = co = 0
    for i in range(nw):
        rp, w = int(r_pad_b[i]), int(wa[i])
        if rp == 0:
            continue
        rows_b.append(rows_flat[ro:ro + p * rp].reshape(p, rp))
        cols_b.append(cols_flat[co:co + p * rp * w].reshape(p, rp, w))
        epos_b.append(epos_flat[co:co + p * rp * w].reshape(p, rp, w))
        bw.append(w)
        splits.append(int(n_spec_b[i]))
        ro += p * rp
        co += p * rp * w
    total_spec = int(n_spec_b[:nw].sum())
    return (rows_b, cols_b, epos_b, row_pos, splits, bw,
            int(total_rows), section_pos, total_spec, slot_pos)
