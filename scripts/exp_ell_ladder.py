"""Bucket-width ladder experiment (round 3): ELL pad factor vs per-bucket
overhead on the 2M-edge power-law graph.

Power-of-2 ladders waste 1.43×/1.55× slots (dst/src packing); every slot
is a fetched row in the sweeps AND a hopped row in the backward, so pad
trim cuts the whole pipeline. Finer ladders add buckets (more einsum
launches). Measures attn fwd / attn grad / gat grad per ladder.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from custom_op_benchmark_tpu.graph import random_graph
from custom_op_benchmark_tpu.ops import (
    ell_attention,
    ell_dual,
    ell_gat_attention,
)
from custom_op_benchmark_tpu.utils.benchlib import bench_fn

LADDERS = {
    "pow2": (4, 8, 16, 32, 64, 128, 256, 512, 1024),
    "x1.5": (4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256,
             384, 512, 768, 1024),
    "lin8": tuple(range(4, 65, 4)) + (96, 128, 192, 256, 384, 512,
                                      768, 1024),
}


def main():
    n = int(os.environ.get("ACC_N", 131072))
    e = int(os.environ.get("ACC_E", 2_000_000))
    d = 128
    g = random_graph(n, e, seed=0, power_law=True)
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
               for _ in range(3))
    h, dh = 4, 32
    a_l = jnp.asarray(rng.normal(size=(h, dh)).astype(np.float32))
    a_r = jnp.asarray(rng.normal(size=(h, dh)).astype(np.float32))
    zf = jnp.asarray(rng.normal(size=(n, h, dh)).astype(np.float32))

    for name, widths in LADDERS.items():
        se, de = ell_dual(g, widths=widths)
        slots_de = sum(int(np.prod(b.cols.shape)) for b in de.buckets)
        slots_se = sum(int(np.prod(b.cols.shape)) for b in se.buckets)
        print(f"[{name}] buckets de={len(de.buckets)} se={len(se.buckets)}"
              f" pad de={slots_de/e:.3f} se={slots_se/e:.3f}", flush=True)

        def bench(bname, fn, *args):
            rec = bench_fn(fn, args, warmup=1, iters="auto",
                           name=f"{name}_{bname}", edges=e)
            print(f"  {bname:12s} {rec.time_s * 1e3:9.2f} ms", flush=True)

        bench("attn_fwd", lambda q, k, v: ell_attention(de, se, q, k, v),
              q, k, v)
        bench("attn_grad", jax.grad(
            lambda q, k, v: (ell_attention(de, se, q, k, v) ** 2).sum(),
            argnums=(0, 1, 2)), q, k, v)
        bench("gat_grad", jax.grad(
            lambda a, b, z: (ell_gat_attention(de, se, a, b, z)
                             ** 2).sum(),
            argnums=(0, 1, 2)), a_l, a_r, zf)


if __name__ == "__main__":
    main()
