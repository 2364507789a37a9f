"""Host-only experiment: does degree-balanced striping cut the halo
plan's padded-slot waste on the projection configs? (round-4 projection
identified waste = padded-slot growth as the whole P=4/8 scaling tax)

Compares plan_stats pack_slots at P in {1,2,4,8} under
  - cluster_order (what run_projection used through round 4)
  - degree_balanced_order(P)
waste(P) = pack_slots(P) * P / pack_slots(1, same ordering).

CPU-only, no TPU needed. Run: python scripts/exp_balance.py
"""

import json

import numpy as np

from custom_op_benchmark_tpu.graph import (
    cluster_order, degree_balanced_order, random_graph, reorder_graph,
)
from custom_op_benchmark_tpu.parallel.halo import plan_stats
from custom_op_benchmark_tpu.utils.platform import honor_platform_env

honor_platform_env()

CONFIGS = [
    dict(name="powerlaw_1m", n=65536, e=1_000_000),
    dict(name="arxiv_gat", n=169_343, e=2_516_000),
]
DEVICES = (2, 4, 8)


def stats_for(g, p):
    import jax

    src = np.asarray(jax.device_get(g.src))[: g.n_edges]
    dst = np.asarray(jax.device_get(g.dst))[: g.n_edges]
    return plan_stats(src, dst, g.n_nodes, g.n_edges, p,
                      -(-g.n_nodes // p), g.num_edges_padded,
                      hub_threshold="auto")


def main():
    out = {}
    for cfg in CONFIGS:
        g0 = random_graph(cfg["n"], cfg["e"], seed=0, power_law=True)
        rows = {}
        for label, order_fn in [
            ("cluster", lambda g: cluster_order(g, max(DEVICES))),
            ("balanced", lambda g: degree_balanced_order(g, max(DEVICES))),
        ]:
            g, _ = reorder_graph(g0, order_fn(g0))
            base = stats_for(g, 1).pack_slots
            per_p = {}
            for p in DEVICES:
                st = stats_for(g, p)
                per_p[p] = dict(
                    pack_slots=st.pack_slots,
                    waste=round(st.pack_slots * p / base, 3),
                    halo=st.halo, n_hub=st.n_hub,
                    halo_fraction=round(st.halo_fraction, 3),
                )
                print(f"{cfg['name']} {label} P={p}: "
                      f"waste={per_p[p]['waste']} halo={st.halo} "
                      f"hub={st.n_hub} hf={per_p[p]['halo_fraction']}")
            rows[label] = dict(pack_slots_p1=base, per_p=per_p)
        out[cfg["name"]] = rows
    print(json.dumps(out))


if __name__ == "__main__":
    main()
