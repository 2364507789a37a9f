"""Checkpoint/resume round trip (SURVEY.md §5 — the reference has none)."""

import numpy as np
import jax
import jax.numpy as jnp

from custom_op_benchmark_tpu.data import planted_partition
from custom_op_benchmark_tpu.models import GCN
from custom_op_benchmark_tpu.train import (
    create_train_state,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path):
    ds = planted_partition(num_classes=3, nodes_per_class=20, feat_dim=8,
                           seed=0)
    g = ds.graph
    x = jnp.asarray(ds.features)
    labels = jnp.asarray(ds.labels)
    mask = jnp.asarray(ds.train_mask)
    model = GCN(hidden_dim=8, out_dim=3)
    state = create_train_state(model, g, x, jax.random.PRNGKey(0))
    step = make_train_step()
    for _ in range(3):
        state, loss, _ = step(state, g, x, labels, mask)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)

    fresh = create_train_state(model, g, x, jax.random.PRNGKey(1))
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Resume training continues without error and changes params.
    resumed, loss, _ = step(restored, g, x, labels, mask)
    assert int(resumed.step) == int(state.step) + 1
