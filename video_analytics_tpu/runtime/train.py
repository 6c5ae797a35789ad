"""Training: fine-tune a stream network on UCF101 windows.

Standard flax/optax loop, data-parallel over the mesh 'data' axis
(SURVEY.md §3.5): the batch is sharded over devices, parameters are
replicated, and XLA inserts the gradient psum over ICI — no explicit
collective code needed under jit + NamedSharding.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from video_analytics_tpu.models.resnet import ResNet
from video_analytics_tpu.parallel.mesh import (
    data_sharding, make_mesh, replicated)


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Any = 0  # jnp.int32 scalar in live states (pytree leaf)


def create_train_state(model: ResNet, variables: Dict[str, Any],
                       tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=variables["params"],
                      batch_stats=variables["batch_stats"],
                      opt_state=tx.init(variables["params"]),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(model: ResNet, tx: optax.GradientTransformation,
                    weight_decay_mask: Optional[Callable] = None):
    """Returns a jitted train_step(state, batch_x, batch_y) →
    (state, metrics).  batch_x: (B, H, W, C) preprocessed; batch_y:
    (B,) int labels."""

    def loss_fn(params, batch_stats, x, y):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            train=True, mutable=["batch_stats"])
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()
        acc = (logits.argmax(-1) == y).mean()
        return loss, (mutated["batch_stats"], acc)

    @jax.jit
    def train_step(state: TrainState, x: jax.Array, y: jax.Array):
        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, x, y)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_stats,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, {"loss": loss, "accuracy": acc}

    return train_step


def shard_train_inputs(mesh, state: TrainState, x, y):
    """Lay out state replicated, batch sharded over 'data'."""
    rep = replicated(mesh)
    state = TrainState(
        params=jax.device_put(state.params, rep),
        batch_stats=jax.device_put(state.batch_stats, rep),
        opt_state=jax.device_put(state.opt_state, rep),
        step=jax.device_put(jnp.asarray(state.step, jnp.int32), rep))
    x = jax.device_put(x, data_sharding(mesh, x.ndim))
    y = jax.device_put(y, data_sharding(mesh, y.ndim))
    return state, x, y


# `step` is a pytree LEAF (a jnp scalar), not aux_data: aux_data is part
# of the treedef, so a Python-int step would change the treedef every
# step and force a full XLA recompile per call (ADVICE.md round 1).
jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.batch_stats, s.opt_state, s.step), None),
    lambda _, kids: TrainState(*kids),
)
