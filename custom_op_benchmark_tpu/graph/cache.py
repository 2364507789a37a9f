"""On-disk cache for cold-path graph preprocessing.

Reference parity: the reference caches its generated index tensors to
``i.pt``/``ixy.pt`` so repeated runs skip the Python construction loops
(wrapper.py:84, 114-116, 122, 134 — with a filename bug that silently
defeats the second cache; this one is keyed by content hash, so it cannot
go stale the same way). Here the expensive cold paths are ELL packing,
block-sparse tiling, reordering and component labeling at ogbn scales.

Usage::

    g = from_coo(src, dst, n)
    se, de = cached(g, "ell_dual", lambda: ell_dual(g))

Cache entries are ``.npz`` files of the view's array leaves plus its
static metadata, keyed by a hash of the graph's edge arrays + the view
kind. Set ``COB_CACHE_DIR`` or pass ``cache_dir``; default
``~/.cache/custom_op_benchmark_tpu``.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Callable, TypeVar

import jax
import numpy as np

T = TypeVar("T")


def _default_dir() -> str:
    return os.environ.get(
        "COB_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "custom_op_benchmark_tpu"),
    )


def _dir_is_trusted(d: str) -> bool:
    """Refuse to unpickle from a directory another user could have
    pre-created: it must be owned by us and not group/world-writable.
    (The ``.tree`` file holds a pickled treedef — static metadata only,
    but pickle loading executes arbitrary reduce callables, so the
    source directory must be tamper-proof.)"""
    try:
        st = os.stat(d)
    except OSError:
        return False
    if hasattr(os, "getuid") and st.st_uid != os.getuid():
        return False
    return not (st.st_mode & 0o022)


def graph_key(g, extra: str = "") -> str:
    """Content hash of a Graph's edge structure (+ a view tag)."""
    hsh = hashlib.sha256()
    hsh.update(np.asarray(jax.device_get(g.src)).tobytes())
    hsh.update(np.asarray(jax.device_get(g.dst)).tobytes())
    hsh.update(f"{g.n_nodes}:{g.n_edges}:{extra}".encode())
    return hsh.hexdigest()[:24]


def cached(g, kind: str, builder: Callable[[], T],
           cache_dir: str = None, enable: bool = True,
           params: str = "") -> T:
    """Build-or-load the preprocessing view ``kind`` for graph ``g``.

    The view may be any pytree whose leaves are arrays (EllGraph pairs,
    TiledGraph, BlockGraph, Reordering, ...). Static dataclass fields ride
    along via pickle of the treedef; array leaves go into one ``.npz``.

    ``params`` MUST encode any builder arguments that change the view
    (tile sizes, bucket widths, row_pad, ...) — it is folded into the
    cache key; otherwise a different parameterization would silently
    return the first-cached layout.
    """
    if not enable:
        return builder()
    base = cache_dir or _default_dir()
    os.makedirs(base, mode=0o700, exist_ok=True)
    path = os.path.join(base,
                        f"{kind}-{graph_key(g, kind + ':' + params)}")
    leaves_f, tree_f = path + ".npz", path + ".tree"
    if (os.path.exists(leaves_f) and os.path.exists(tree_f)
            and _dir_is_trusted(base)):
        try:
            with open(tree_f, "rb") as f:
                treedef = pickle.load(f)
            with np.load(leaves_f) as data:
                leaves = [data[f"a{i}"] for i in range(len(data.files))]
            import jax.numpy as jnp

            return jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(a) for a in leaves]
            )
        except Exception:
            pass  # corrupt/stale cache — rebuild
    view = builder()
    leaves, treedef = jax.tree_util.tree_flatten(view)
    tmp = path + f".tmp{os.getpid()}"
    np.savez(tmp + ".npz",
             **{f"a{i}": np.asarray(jax.device_get(l))
                for i, l in enumerate(leaves)})
    with open(tmp + ".tree", "wb") as f:
        pickle.dump(treedef, f)
    os.replace(tmp + ".npz", leaves_f)
    os.replace(tmp + ".tree", tree_f)
    return view
