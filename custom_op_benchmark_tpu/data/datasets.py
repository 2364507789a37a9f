"""Real-dataset ingestion: on-disk format loaders + .npz converter.

The BASELINE configs name Cora / ogbn-arxiv / Reddit / ogbn-products /
papers100M (reference README.md:11-14 runs on real tensors). This
environment has no network egress, so what lives here is the complete
*file-format* path: point it at data once it exists on disk and the
training CLIs consume it — no synthetic stand-in in the loop.

Supported layouts:

- **Canonical .npz** (this framework's native interchange format):
  arrays ``src, dst, features, labels, train_mask, val_mask, test_mask``
  — see :func:`custom_op_benchmark_tpu.data.synthetic.from_numpy_files`.
- **OGB node-property directory** (what ``ogb.nodeproppred`` extracts):
  ``raw/edge.csv.gz``, ``raw/node-feat.csv.gz``, ``raw/node-label.csv.gz``
  and ``split/<split>/{train,valid,test}.csv.gz``. Loaded directly or
  converted to the canonical .npz with :func:`convert_ogb_dir`.
- **Planetoid-style .npz** exports (cora.npz from common mirrors with
  keys like ``adj_data/adj_indices/adj_indptr`` or ``edge_index``).

``load_dataset`` sniffs the layout from the path contents.
"""

from __future__ import annotations

import gzip
import os
from typing import Optional

import numpy as np

from custom_op_benchmark_tpu.data.synthetic import (
    NodeClassificationDataset,
    from_numpy_files,
)
from custom_op_benchmark_tpu.graph.graph import from_coo


def _read_csv_gz(path: str, dtype) -> np.ndarray:
    """Small dependency-free CSV reader (OGB files are plain numeric)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return np.loadtxt(f, delimiter=",", dtype=dtype, ndmin=2)


def _find(path: str, *names: str) -> Optional[str]:
    for name in names:
        for cand in (os.path.join(path, name),
                     os.path.join(path, name + ".gz")):
            if os.path.exists(cand):
                return cand
    return None


def is_ogb_dir(path: str) -> bool:
    return os.path.isdir(path) and _find(
        os.path.join(path, "raw"), "edge.csv") is not None


def load_ogb_dir(path: str, name: str = None,
                 undirected: bool = True) -> NodeClassificationDataset:
    """Load an extracted OGB node-property dataset directory.

    ``undirected=True`` mirrors OGB's convention for arxiv/products
    (edges stored once, models use the symmetrized graph).
    """
    raw = os.path.join(path, "raw")
    edges = _read_csv_gz(_find(raw, "edge.csv"), np.int64)
    feats = _read_csv_gz(_find(raw, "node-feat.csv"), np.float32)
    labels = _read_csv_gz(_find(raw, "node-label.csv"), np.int64)[:, 0]
    n = feats.shape[0]
    src, dst = edges[:, 0], edges[:, 1]
    if undirected:
        # Symmetrize then dedupe (self-loops and reciprocal pairs would
        # otherwise become multi-edges, which the dense-oracle validation
        # and the block view don't model) — standard OGB practice.
        src, dst = (np.concatenate([src, dst]),
                    np.concatenate([dst, src]))
        uniq = np.unique(src * np.int64(n) + dst)
        src, dst = uniq // n, uniq % n

    def _mask(split_file: Optional[str]) -> np.ndarray:
        m = np.zeros(n, bool)
        if split_file is not None:
            idx = _read_csv_gz(split_file, np.int64)[:, 0]
            m[idx] = True
        return m

    split_root = os.path.join(path, "split")
    split_dir = None
    if os.path.isdir(split_root):
        subs = sorted(
            d for d in os.listdir(split_root)
            if os.path.isdir(os.path.join(split_root, d))
        )
        if subs:
            split_dir = os.path.join(split_root, subs[0])
    if split_dir is None:
        # No split published: 60/20/20 deterministic fallback.
        rng = np.random.default_rng(0)
        perm = rng.permutation(n)
        tr, va = int(0.6 * n), int(0.8 * n)
        train_mask = np.zeros(n, bool)
        val_mask = np.zeros(n, bool)
        test_mask = np.zeros(n, bool)
        train_mask[perm[:tr]] = True
        val_mask[perm[tr:va]] = True
        test_mask[perm[va:]] = True
    else:
        train_mask = _mask(_find(split_dir, "train.csv"))
        val_mask = _mask(_find(split_dir, "valid.csv"))
        test_mask = _mask(_find(split_dir, "test.csv"))

    return NodeClassificationDataset(
        graph=from_coo(src, dst, n),
        features=feats,
        labels=labels.astype(np.int32),
        train_mask=train_mask,
        val_mask=val_mask,
        test_mask=test_mask,
        num_classes=int(labels.max()) + 1,
        name=name or os.path.basename(os.path.normpath(path)),
    )


def convert_ogb_dir(path: str, out_npz: str) -> str:
    """OGB directory → canonical .npz (one-time; the .npz loads ~10×
    faster than re-parsing CSVs and is the multi-host distribution
    format). Returns ``out_npz``."""
    ds = load_ogb_dir(path)
    import jax

    np.savez_compressed(
        out_npz,
        src=np.asarray(jax.device_get(ds.graph.src))[: ds.graph.n_edges],
        dst=np.asarray(jax.device_get(ds.graph.dst))[: ds.graph.n_edges],
        features=ds.features,
        labels=ds.labels,
        train_mask=ds.train_mask,
        val_mask=ds.val_mask,
        test_mask=ds.test_mask,
    )
    return out_npz


def _planetoid_npz(path: str, name: str) -> NodeClassificationDataset:
    """Planetoid-style .npz (cora/citeseer mirrors): CSR adjacency under
    ``adj_*`` keys or a COO ``edge_index``, features under ``features``/
    ``attr_*``."""
    z = np.load(path, allow_pickle=False)
    keys = set(z.files)
    if {"adj_data", "adj_indices", "adj_indptr"} <= keys:
        indptr = z["adj_indptr"]
        indices = z["adj_indices"]
        n = len(indptr) - 1
        src = np.repeat(np.arange(n), np.diff(indptr))
        dst = indices
    elif "edge_index" in keys:
        ei = z["edge_index"]
        src, dst = ei[0], ei[1]
        n = int(max(src.max(), dst.max())) + 1
    else:
        raise ValueError(
            f"unrecognized npz keys {sorted(keys)} in {path}"
        )
    if {"attr_data", "attr_indices", "attr_indptr"} <= keys:
        fi, fd, fp = z["attr_indices"], z["attr_data"], z["attr_indptr"]
        fdim = int(z["attr_shape"][1]) if "attr_shape" in keys \
            else int(fi.max()) + 1
        feats = np.zeros((n, fdim), np.float32)
        rows = np.repeat(np.arange(len(fp) - 1), np.diff(fp))
        feats[rows, fi] = fd
    else:
        feats = z["features"].astype(np.float32)
    labels = z["labels"].astype(np.int32)
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)
    tr, va = int(0.6 * n), int(0.8 * n)
    masks = [np.zeros(n, bool) for _ in range(3)]
    masks[0][perm[:tr]] = True
    masks[1][perm[tr:va]] = True
    masks[2][perm[va:]] = True
    return NodeClassificationDataset(
        graph=from_coo(src, dst, n),
        features=feats,
        labels=labels,
        train_mask=masks[0],
        val_mask=masks[1],
        test_mask=masks[2],
        num_classes=int(labels.max()) + 1,
        name=name,
    )


def load_dataset(path: str, name: str = None) -> NodeClassificationDataset:
    """Sniff + load any supported on-disk dataset layout."""
    name = name or os.path.splitext(os.path.basename(
        os.path.normpath(path)))[0]
    if os.path.isdir(path):
        if is_ogb_dir(path):
            return load_ogb_dir(path, name=name)
        npz = _find(path, "graph.npz")
        if npz:
            return from_numpy_files(npz, name=name)
        raise ValueError(f"no recognizable dataset layout under {path}")
    if path.endswith(".npz"):
        z = np.load(path, allow_pickle=False)
        if {"src", "dst", "features"} <= set(z.files):
            return from_numpy_files(path, name=name)
        return _planetoid_npz(path, name)
    raise ValueError(f"unsupported dataset path {path!r}")
