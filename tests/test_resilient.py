"""Failure detection + elastic resume (round-1 coverage gap)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_op_benchmark_tpu.data.synthetic import planted_partition
from custom_op_benchmark_tpu.models import GCN
from custom_op_benchmark_tpu.train.loop import (
    create_train_state,
    masked_cross_entropy,
)
from custom_op_benchmark_tpu.train.resilient import (
    CheckpointManager,
    DivergenceError,
    resilient_steps,
)


@pytest.fixture(scope="module")
def task():
    ds = planted_partition(num_classes=3, nodes_per_class=40, feat_dim=8,
                           avg_degree=5, seed=0)
    model = GCN(hidden_dim=16, out_dim=3, num_layers=2)
    x = jnp.asarray(ds.features)
    y = jnp.asarray(ds.labels)
    mask = jnp.asarray(ds.train_mask)
    state = create_train_state(model, ds.graph, x, jax.random.PRNGKey(0))

    @jax.jit
    def step(state, _i):
        def loss_fn(p):
            logits = state.apply_fn({"params": p}, ds.graph, x)
            return masked_cross_entropy(logits, y, mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    return state, step


def test_checkpoint_every_and_resume(task, tmp_path):
    state0, step = task
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    events = []
    state1, losses1 = resilient_steps(
        step, state0, 10, manager=mgr, checkpoint_every=4,
        on_event=lambda kind, s: events.append((kind, s)),
    )
    assert mgr.latest_step == 9
    assert ("checkpoint", 3) in events and ("checkpoint", 9) in events
    # keep=2 rolls old checkpoints away
    assert len(mgr._steps()) <= 2

    # Simulated crash: a fresh run over the same directory resumes after
    # the last checkpointed step and runs only the remainder.
    events2 = []
    state2, losses2 = resilient_steps(
        step, state0, 14, manager=mgr, checkpoint_every=100,
        on_event=lambda kind, s: events2.append((kind, s)),
    )
    assert ("resume", 9) in events2
    assert len(losses2) == 4                     # steps 10..13 only
    assert int(state2.step) == int(state1.step) + 4


def test_divergence_restores_then_raises(task, tmp_path):
    state0, step = task
    mgr = CheckpointManager(str(tmp_path / "ckpt2"), keep=2)

    calls = {"n": 0}

    def bad_step(state, i):
        calls["n"] += 1
        new_state, loss = step(state, i)
        if i >= 5:                                # diverges at step 5+
            return new_state, jnp.float32(np.nan)
        return new_state, loss

    events = []
    with pytest.raises(DivergenceError):
        resilient_steps(
            bad_step, state0, 10, manager=mgr, checkpoint_every=2,
            max_restores=2,
            on_event=lambda kind, s: events.append((kind, s)),
        )
    assert sum(1 for k, _ in events if k == "restore") == 2


def test_losses_decrease_under_resilient_driver(task, tmp_path):
    state0, step = task
    state, losses = resilient_steps(step, state0, 30)
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
