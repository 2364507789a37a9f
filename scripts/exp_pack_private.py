"""Shared-shape vs private-ladder packing waste at P=2/4/8 (round-4
verdict item 3c: "per-shard PRIVATE bucket ladders instead of
_pack_shared's shared shapes would cut the max-shard padding directly;
measure plan-stats waste at P=8 with both").

Host-only. For each projection config (the same graphs + balanced
ordering run_projection uses) and each P, decomposes per-shard padded
slots under four packings:

  shared_pow2    what the mesh gets today: shared shapes, pow-2 ladder
  shared_train   shared shapes, fine TRAIN_WIDTHS ladder (this is SPMD-
                 legal — widths are static metadata, shapes still shared)
  private_pow2   per-shard independent packing (NOT SPMD-legal: shapes
                 would differ per shard; lower bound on what shard-local
                 shape choice could buy)
  private_train  both relaxations
  ideal          sum of true degrees (no quantization — the floor)

Waste is reported the way run_projection computes it: P · max-shard
slots / single-shard (P=1) slots of the SAME ladder, so the numbers
plug directly into eff_no_overlap = 1/(waste + P·t_comm/t1).

Run (CPU host-only): timeout 1800 python scripts/exp_pack_private.py
"""

import json

import numpy as np

from custom_op_benchmark_tpu.utils.platform import honor_platform_env

honor_platform_env()

import jax  # noqa: E402

from custom_op_benchmark_tpu.graph import (  # noqa: E402
    degree_balanced_order, random_graph, reorder_graph,
)
from custom_op_benchmark_tpu.graph.ell import (  # noqa: E402
    DEFAULT_WIDTHS, TRAIN_WIDTHS,
)
from custom_op_benchmark_tpu.parallel.halo import (  # noqa: E402
    _plan_host, _round_up,
)

PAD = 8


def _slots_for(deg, widths):
    """Padded slots for one shard's rows under ``widths`` (rows rounded
    up to 8 per bucket, slot = rows·width)."""
    widths = sorted(set(int(w) for w in widths))
    while widths[-1] < (deg.max() if len(deg) else 1):
        widths.append(widths[-1] * 2)
    wa = np.asarray(widths, np.int64)
    bi = np.searchsorted(wa, deg, side="left")
    cnt = np.bincount(bi, minlength=len(widths))
    return int(sum(_round_up(int(c), PAD) * w
                   for c, w in zip(cnt, widths) if c))


def _shared_slots(deg_by_shard, widths, p):
    """Shared-shape slots: per bucket, rows = max over shards."""
    widths = sorted(set(int(w) for w in widths))
    mx = max((int(d.max()) for d in deg_by_shard if len(d)), default=1)
    while widths[-1] < mx:
        widths.append(widths[-1] * 2)
    wa = np.asarray(widths, np.int64)
    cnt = np.zeros((len(widths), p), np.int64)
    for s, deg in enumerate(deg_by_shard):
        bi = np.searchsorted(wa, deg, side="left")
        cnt[:, s] = np.bincount(bi, minlength=len(widths))
    per_shard = sum(_round_up(int(c), PAD) * w
                    for c, w in zip(cnt.max(axis=1), widths) if c)
    return int(per_shard)


def degrees(src, dst, n, e, p, n_per, e_pad):
    """Per-shard row-degree arrays for BOTH packings (local dst rows and
    extended src rows), from the same host plan the mesh would build."""
    (send_idx, src_ext, dst_loc, eid, e_p, m_max, hub_idx, hub_pos,
     k_max) = _plan_host(src, dst, e, p, n_per, PAD, e_pad, "auto")
    out = []
    for s in range(p):
        real = dst_loc[s] < n_per
        dl = dst_loc[s][real].astype(np.int64)
        se = src_ext[s][real].astype(np.int64)
        out.append((np.bincount(dl)[np.bincount(dl) > 0],
                    np.bincount(se)[np.bincount(se) > 0]))
    return out


def analyze(name, n, e, device_counts=(2, 4, 8)):
    g = random_graph(n, e, seed=0, power_law=True)
    g, _ = reorder_graph(g, degree_balanced_order(g, max(device_counts)))
    n2 = g.n_nodes
    src = np.asarray(jax.device_get(g.src))[: g.n_edges]
    dst = np.asarray(jax.device_get(g.dst))[: g.n_edges]
    e2, e_pad = g.n_edges, g.num_edges_padded
    rows = {"config": name, "n": n2, "e": int(e2), "per_p": []}
    # P=1 baselines per ladder (the waste denominators).
    base = {}
    degs1 = degrees(src, dst, n2, e2, 1, n2, e_pad)[0]
    for lname, widths in (("pow2", DEFAULT_WIDTHS),
                          ("train", TRAIN_WIDTHS)):
        base[lname] = (_slots_for(degs1[0], widths)
                       + _slots_for(degs1[1], widths))
    ideal1 = int(degs1[0].sum() + degs1[1].sum())
    rows["p1_slots"] = dict(base, ideal=ideal1)
    for p in device_counts:
        n_per = -(-n2 // p)
        degs = degrees(src, dst, n2, e2, p, n_per, e_pad)
        rec = {"devices": p}
        for lname, widths in (("pow2", DEFAULT_WIDTHS),
                              ("train", TRAIN_WIDTHS)):
            shared = (_shared_slots([d[0] for d in degs], widths, p)
                      + _shared_slots([d[1] for d in degs], widths, p))
            private = max(_slots_for(d[0], widths)
                          + _slots_for(d[1], widths) for d in degs)
            rec[f"shared_{lname}"] = shared * p
            rec[f"private_{lname}"] = private * p
            rec[f"waste_shared_{lname}"] = round(
                shared * p / base[lname], 3)
            rec[f"waste_private_{lname}"] = round(
                private * p / base[lname], 3)
        rec["ideal"] = int(max(d[0].sum() + d[1].sum() for d in degs) * p)
        rec["waste_ideal"] = round(rec["ideal"] / ideal1, 3)
        rows["per_p"].append(rec)
        print(f"  {name} P={p}: waste shared pow2 "
              f"{rec['waste_shared_pow2']:.3f} train "
              f"{rec['waste_shared_train']:.3f} | private pow2 "
              f"{rec['waste_private_pow2']:.3f} train "
              f"{rec['waste_private_train']:.3f} | ideal "
              f"{rec['waste_ideal']:.3f}")
    return rows


def main():
    out = [analyze("powerlaw_1m", 65536, 1_000_000),
           analyze("arxiv_gat", 169_343, 2_516_000)]
    with open("docs/records/PACK_PRIVATE_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"pack_private": "ok"}))


if __name__ == "__main__":
    main()
