"""Pass-by-pass accounting of the halo plan's P=1 overhead vs the
single-chip fused op (round-3 verdict #2).

Round-3 context: the 1-dev-mesh halo attention measured 28.6 ms fwd /
132.7 ms bwd at h=4·d=32, vs 14.5/60.8 for the single-chip fused op at
h=1·d=128 — an unexplained ~2×. Two structural differences were in the
code, both now fixed:

  1. the halo sweeps looped heads over ``lax.slice_in_dim`` (the
     measured 2.3× pattern; single-chip multihead fwd was 33.8 ms vs
     14.5 single-head at equal e·d) — now heads-in-the-sweep;
  2. the halo backward recomputed α in pass 1 and rebuilt α_t from
     per-node stats in pass 2, making the q/dy slot gathers
     double-consumers (the measured 1.8-2.5× pattern) — now the saved-α
     + fenced twin-hop design of ops/ell._ell_attention_bwd.

This script times, on the real chip with a 1-device mesh, BOTH shape
configs (h=1·d=128 and h=4·d=32) for:
  - single-chip fused  ell_attention     fwd / grad   (the floor)
  - distributed        halo_attention_ell fwd / grad  (the plan)
  - the exchange machinery alone (pad + a2a + concat of k‖v)
  - the row_pos combine gather alone
plus the static padded-slot accounting of both packings (identical
ladders ⇒ identical sweep volume ⇒ any residual gap is plan machinery).

Run under timeout on the TPU:  timeout 1800 python scripts/exp_halo_accounting.py
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from custom_op_benchmark_tpu.graph import random_graph
from custom_op_benchmark_tpu.ops import ell_attention, ell_dual
from custom_op_benchmark_tpu.parallel import (
    halo_attention_ell, halo_ell, halo_graph, make_mesh,
    shard_halo_nodes,
)
from custom_op_benchmark_tpu.parallel.halo import _exchange_parts
from custom_op_benchmark_tpu.utils.benchlib import bench_fn


def main():
    n, e = 131072, 2_000_000
    g = random_graph(n, e, seed=0, power_law=True)
    se, de = ell_dual(g)
    mesh = make_mesh((1,), ("edge",), devices=jax.devices()[:1])
    hg = halo_graph(g, mesh)
    he = halo_ell(hg, mesh)
    rng = np.random.default_rng(0)
    rows = {}

    # Static accounting: padded sweep volume of each packing.
    slots_sc = sum(int(b.cols.shape[0] * b.cols.shape[1])
                   for b in de.buckets)
    slots_halo = sum(
        int(np.prod(np.asarray(jax.device_get(c)).shape[1:]))
        for c in he.cols_b)
    slots_sc_t = sum(int(b.cols.shape[0] * b.cols.shape[1])
                     for b in se.buckets)
    slots_halo_t = sum(
        int(np.prod(np.asarray(jax.device_get(c)).shape[1:]))
        for c in he.cols_t_b)
    rows["padded_slots"] = dict(
        single_chip=slots_sc, halo=slots_halo,
        single_chip_t=slots_sc_t, halo_t=slots_halo_t)
    print(f"padded slots  dst: single-chip {slots_sc} vs halo "
          f"{slots_halo}  | src/t: {slots_sc_t} vs {slots_halo_t}",
          flush=True)

    def bench(name, fn, *args):
        rec = bench_fn(fn, args, warmup=1, iters="auto", name=name,
                       edges=e)
        rows[name] = rec.time_s
        print(f"{name:42s} {rec.time_s * 1e3:9.2f} ms", flush=True)

    for h, d in ((1, 128), (4, 32)):
        tag = f"h{h}d{d}"
        shape = (n, d) if h == 1 else (n, h, d)
        q = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        qs = shard_halo_nodes(hg, mesh, np.asarray(q))

        bench(f"fused_fwd[{tag}]",
              lambda q: ell_attention(de, se, q, q, q), q)
        bench(f"fused_bwd[{tag}]", jax.grad(
            lambda q: (ell_attention(de, se, q, q, q) ** 2).sum()), q)
        bench(f"halo_fwd[{tag}]",
              lambda q: halo_attention_ell(hg, he, mesh, q, q, q), qs)
        bench(f"halo_bwd[{tag}]", jax.grad(
            lambda q: (halo_attention_ell(
                hg, he, mesh, q, q, q) ** 2).sum()), qs)

        # Exchange machinery alone: pad + degenerate a2a + concat, k‖v.
        def exch(send_idx, hub_idx, x):
            x2 = x.reshape(hg.n_per, -1)
            _, k_ext = _exchange_parts(hg, send_idx, x2, hub_idx)
            _, v_ext = _exchange_parts(hg, send_idx, x2, hub_idx)
            return (k_ext.sum() + v_ext.sum()).reshape(1)

        fn = jax.shard_map(
            exch, mesh=mesh,
            in_specs=(P("edge"), P("edge"), P("edge")),
            out_specs=P("edge"),
        )
        bench(f"exchange_only[{tag}]",
              lambda si, hi, x: fn(si, hi, x), hg.send_idx, hg.hub_idx,
              qs)

        # Combine gather alone: flat bucket rows -> owned rows.
        total_rows = he.total_rows
        flat = jnp.asarray(rng.normal(
            size=(total_rows + 1, h * d)).astype(np.float32))

        def combine(row_pos, flat):
            return flat[row_pos[0]]

        cfn = jax.shard_map(
            combine, mesh=mesh, in_specs=(P("edge"), P()),
            out_specs=P("edge"),
        )
        bench(f"combine_only[{tag}]",
              lambda rp, fl: cfn(rp, fl), he.row_pos, flat)

    print(json.dumps({"halo_accounting": {
        k: (v if isinstance(v, dict) else round(v * 1e3, 2))
        for k, v in rows.items()}}))


if __name__ == "__main__":
    main()
