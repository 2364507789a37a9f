"""Dtype-width laws for the two compute classes (ROADMAP fp8 item).

1. Fetch-bound sparse gathers: time a fused gather+reduce over S random
   rows at f32/bf16/fp8 row widths. The established law (RESULTS.md)
   is that narrow random gathers are ROW-bound (~150-200 M rows/s), so
   halving/quartering row bytes should NOT speed them up — fp8 node
   features would lose like bf16 did.
2. MXU-bound dense: 4096^3 matmul at bf16 vs fp8 (e4m3) inputs
   (f32 accumulation) — v5e quotes 2x bf16 MACs for int8/fp8.
"""

import jax
import jax.numpy as jnp
import numpy as np

from custom_op_benchmark_tpu.utils.benchlib import bench_fn


def main():
    n, s = 131072, 3_000_000
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, size=s).astype(np.int32))
    x32 = jnp.asarray(rng.normal(size=(n, 128)).astype(np.float32))

    for name, x in (
        ("f32 (512 B rows)", x32),
        ("bf16 (256 B rows)", x32.astype(jnp.bfloat16)),
        ("fp8_e4m3 (128 B rows)", x32.astype(jnp.float8_e4m3fn)),
    ):
        def g(x, idx):
            return x[idx].astype(jnp.float32).sum(axis=0)

        rec = bench_fn(g, (x, idx), warmup=1, iters="auto",
                       name=f"gather_{name}")
        rows_per_s = s / rec.time_s
        print(f"gather+reduce {name:22s} {rec.time_s*1e3:8.2f} ms "
              f"{rows_per_s/1e6:7.1f} M rows/s", flush=True)

    m = 4096
    a32 = jnp.asarray(rng.normal(size=(m, m)).astype(np.float32))
    for name, dt in (("bf16", jnp.bfloat16), ("fp8_e4m3",
                                              jnp.float8_e4m3fn)):
        a = a32.astype(dt)

        def mm(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)

        try:
            rec = bench_fn(mm, (a, a), warmup=1, iters="auto",
                           name=f"mm_{name}")
            tf = 2 * m ** 3 / rec.time_s / 1e12
            print(f"matmul 4096^3 {name:10s} {rec.time_s*1e3:8.3f} ms "
                  f"{tf:7.1f} TFLOP/s", flush=True)
        except Exception as ex:  # dtype unsupported on this backend
            print(f"matmul 4096^3 {name}: unsupported ({ex})",
                  flush=True)


if __name__ == "__main__":
    main()
