"""TPU: arxiv-scale full-graph GAT epoch time + halo 1-device-mesh
backward vs single-chip (round-2 targets: epoch ≤1.0 s from 1.46 s;
distributed local backward within 2× of single-chip)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")


def epoch_time():
    from custom_op_benchmark_tpu.data.synthetic import planted_partition
    from custom_op_benchmark_tpu.models import GAT
    from custom_op_benchmark_tpu.train.loop import (
        create_train_state,
        masked_cross_entropy,
    )
    from custom_op_benchmark_tpu.ops import ell_dual
    from custom_op_benchmark_tpu.utils.benchlib import bench_fn

    # Match the round-1 measured workload (RESULTS.md: n=169,360,
    # e=2,537,412, 128 feats, 40 classes).
    ds = planted_partition(num_classes=40, nodes_per_class=4234,
                           feat_dim=128, avg_degree=7, seed=0)
    g = ds.graph
    print(f"arxiv-like: n={g.n_nodes} e={g.n_edges}", flush=True)
    se, de = ell_dual(g, profile="train")
    model = GAT(hidden_dim=128, out_dim=40, num_layers=3, num_heads=4)
    x = jnp.asarray(ds.features)
    y = jnp.asarray(ds.labels)
    mask = jnp.asarray(ds.train_mask)
    state = create_train_state(model, g, x, jax.random.PRNGKey(0),
                               ell=(se, de))

    def train_step(params, opt_state, x):
        def loss_fn(p):
            logits = model.apply({"params": p}, g, x, ell=(se, de))
            return masked_cross_entropy(logits, y, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = state.tx.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, upd), opt_state, loss

    rec = bench_fn(
        lambda params, x: train_step(params, state.opt_state, x)[0],
        (state.params, x), warmup=1, iters=(2, 6), name="epoch",
        edges=g.n_edges,
    )
    print(f"arxiv GAT epoch (fwd+bwd+adamw): {rec.time_s:.3f} s "
          f"(r1: 1.46 s, target <= 1.0 s)", flush=True)


def halo_backward():
    from custom_op_benchmark_tpu.graph import random_graph
    from custom_op_benchmark_tpu.parallel import (
        halo_attention_ell,
        halo_ell,
        halo_graph,
        make_mesh,
    )
    from custom_op_benchmark_tpu.parallel.halo import shard_halo_nodes
    from custom_op_benchmark_tpu.utils.benchlib import bench_fn

    n, e, h, d = 131072, 2_000_000, 4, 32
    g = random_graph(n, e, seed=0, power_law=True)
    mesh = make_mesh((1,), ("edge",))
    hg = halo_graph(g, mesh)
    he = halo_ell(hg, mesh)
    rng = np.random.default_rng(0)
    q = shard_halo_nodes(hg, mesh,
                         rng.normal(size=(n, h, d)).astype(np.float32))

    rec = bench_fn(
        lambda q: halo_attention_ell(hg, he, mesh, q, q, q), (q,),
        warmup=1, iters=(2, 8), name="halo_fwd", edges=e)
    print(f"halo attention fwd (1-dev mesh):  {rec.time_s*1e3:9.2f} ms",
          flush=True)
    rec = bench_fn(
        jax.grad(lambda q: (halo_attention_ell(
            hg, he, mesh, q, q, q) ** 2).sum()), (q,),
        warmup=1, iters=(2, 6), name="halo_bwd", edges=e)
    print(f"halo attention bwd (1-dev mesh):  {rec.time_s*1e3:9.2f} ms "
          f"(single-chip gat_bwd for 2x bound: see bench_attn_bwd)",
          flush=True)


if __name__ == "__main__":
    epoch_time()
    halo_backward()
