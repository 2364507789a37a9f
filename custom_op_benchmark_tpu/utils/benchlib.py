"""Benchmark harness: warmup, repeats, medians, roofline accounting.

The reference times everything single-shot with ``time.time()`` +
``cuda.synchronize()`` and no warmup (wrapper.py:154-160 — so its numbers
include JIT/launch warmup); SURVEY.md §5 prescribes the upgrade implemented
here: warmup iterations, median over repeats, ``block_until_ready``, and
achieved-bytes/s vs the chip's HBM roofline, emitted as structured records.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Any, Callable, Optional

import jax
import numpy as np

# Peak HBM bandwidth per chip, bytes/s.
_HBM_GBPS = {
    "v4": 1228.8e9,
    "v5 lite": 819.2e9,   # v5e
    "v5e": 819.2e9,
    "v5": 819.2e9,
    "v5p": 2765.0e9,
    "v6 lite": 1640.0e9,  # v6e (Trillium)
    "v6e": 1640.0e9,
    "cpu": 50.0e9,        # nominal, for smoke runs only
}


def hbm_bandwidth_bytes(device=None) -> float:
    """Peak HBM bytes/s for the current (or given) device."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu").lower()
    for key in sorted(_HBM_GBPS, key=len, reverse=True):
        if key in kind:
            return _HBM_GBPS[key]
    return _HBM_GBPS["cpu"]


@dataclasses.dataclass
class BenchRecord:
    """One structured benchmark result (SURVEY.md §5 observability)."""

    name: str
    time_s: float                 # median wall time per iteration
    times: list                   # all post-warmup samples
    bytes_moved: Optional[float] = None   # minimal/ideal bytes per iter
    flops: Optional[float] = None
    edges: Optional[int] = None
    extra: dict = dataclasses.field(default_factory=dict)

    @property
    def edges_per_s(self) -> Optional[float]:
        return None if self.edges is None else self.edges / self.time_s

    @property
    def achieved_bw(self) -> Optional[float]:
        return (
            None if self.bytes_moved is None
            else self.bytes_moved / self.time_s
        )

    def roofline_fraction(self, peak_bytes_per_s: Optional[float] = None):
        if self.bytes_moved is None:
            return None
        peak = peak_bytes_per_s or hbm_bandwidth_bytes()
        return self.achieved_bw / peak

    def to_json(self) -> str:
        d = dict(
            name=self.name,
            time_s=self.time_s,
            edges_per_s=self.edges_per_s,
            achieved_gb_s=(
                None if self.achieved_bw is None
                else self.achieved_bw / 1e9
            ),
            roofline_frac=self.roofline_fraction(),
            **self.extra,
        )
        return json.dumps({k: v for k, v in d.items() if v is not None})


def bench_fn(fn: Callable[[], Any], *, warmup: int = 3, iters: int = 10,
             repeats: int = 3, name: str = "bench",
             bytes_moved: Optional[float] = None,
             flops: Optional[float] = None,
             edges: Optional[int] = None, **extra) -> BenchRecord:
    """Time ``fn`` (which must return jax arrays): warmup, then
    ``repeats`` loops of ``iters`` un-synchronized calls with one final
    ``block_until_ready`` per loop; reports the best loop average.

    Per-call synchronization is NOT used on purpose: on remote-attached
    TPUs every sync pays a host↔device round trip (~tens of ms here),
    which would swamp ms-scale kernels. TPUs execute launches in order,
    so fetching a scalar checksum of the loop's last output bounds the
    whole loop's device time. (``block_until_ready`` alone does not wait
    for remote execution on tunneled PJRT backends — measured empirically
    on this one — so the checksum fetch is the only reliable fence.)
    """

    def _force(out):
        leaves = [l for l in jax.tree_util.tree_leaves(out)
                  if hasattr(l, "sum")]
        if not leaves:
            return
        s = leaves[0].sum()
        for l in leaves[1:]:
            s = s + l.sum()
        np.asarray(s)  # device->host fetch == full queue fence

    for _ in range(warmup):
        _force(fn())
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        _force(out)
        times.append((time.perf_counter() - t0) / iters)
    return BenchRecord(
        name=name,
        time_s=float(np.min(times)),
        times=times,
        bytes_moved=bytes_moved,
        flops=flops,
        edges=edges,
        extra=extra,
    )
