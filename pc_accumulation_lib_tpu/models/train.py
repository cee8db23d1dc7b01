"""Sharded semseg training/fine-tuning step.

The reference consumes a frozen ONNX checkpoint; a complete framework also
needs to (re)train its perception model. This module provides a pjit train
step over a ('data','model') mesh: batch sharded over 'data' (DP), wide conv
kernels sharded over 'model' (TP) via NamedSharding on the parameter pytree
— XLA inserts the all-reduces/all-gathers (scaling-book recipe: pick a mesh,
annotate shardings, let XLA place collectives).
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pc_accumulation_lib_tpu.models.resnet_semseg import (
    ResNet50DilatedFCN, init_params)

IGNORE_LABEL = 255


class TrainState(NamedTuple):
    variables: Any     # {'params', 'batch_stats'}
    opt_state: Any
    step: jax.Array


def param_spec(path_keys, leaf) -> P:
    """TP rule: shard the output-channel dim of wide kernels/scales over
    'model'; replicate the rest."""
    if leaf.ndim == 4 and leaf.shape[-1] >= 256:
        return P(None, None, None, 'model')
    if leaf.ndim == 1 and leaf.shape[0] >= 256:
        return P('model')
    return P()


def shard_variables(variables, mesh: Mesh):
    def place(path_keys, leaf):
        return jax.device_put(leaf,
                              NamedSharding(mesh, param_spec(path_keys,
                                                             leaf)))
    return jax.tree_util.tree_map_with_path(place, variables)


def cross_entropy_loss(logits, labels):
    """Per-pixel CE with ignore label (Cityscapes 255)."""
    valid = labels != IGNORE_LABEL
    safe = jnp.where(valid, labels, 0)
    ll = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(ll, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def make_train_setup(mesh: Mesh, lr: float = 1e-3, img_hw=(64, 128),
                     seed: int = 0, stage_sizes=None, dtype=None):
    """Build (state, train_step) with DP/TP shardings over ``mesh``.

    train_step(state, images (B,H,W,3), labels (B,H,W)) -> (state, loss).
    """
    import jax.numpy as _jnp
    if dtype is None:
        dtype = (_jnp.bfloat16 if jax.default_backend() == 'tpu'
                 else _jnp.float32)
    kwargs = {} if stage_sizes is None else {'stage_sizes': stage_sizes}
    model = ResNet50DilatedFCN(dtype=dtype, **kwargs)
    variables = init_params(model, jax.random.PRNGKey(seed), img_hw=img_hw)
    variables = shard_variables(variables, mesh)
    tx = optax.adam(lr)
    opt_state = tx.init(variables['params'])
    state = TrainState(variables=variables, opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32))

    data_sharding = NamedSharding(mesh, P('data'))

    def loss_fn(params, batch_stats, images, labels):
        logits, mutated = model.apply(
            {'params': params, 'batch_stats': batch_stats}, images,
            train=True, mutable=['batch_stats'])
        return cross_entropy_loss(logits, labels), mutated['batch_stats']

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, images, labels):
        images = jax.lax.with_sharding_constraint(images, data_sharding)
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.variables['params'], state.variables['batch_stats'],
            images, labels)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.variables['params'])
        params = optax.apply_updates(state.variables['params'], updates)
        return TrainState(variables={'params': params,
                                     'batch_stats': new_bs},
                          opt_state=opt_state,
                          step=state.step + 1), loss

    return state, train_step


def make_pipelined_train_setup(mesh, microbatch: int = 2, hw=(8, 16),
                               channels: int = 16, lr: float = 1e-2,
                               seed: int = 0):
    """Pipeline-parallel (GPipe) trainer over the mesh's 'pp' axis.

    Stages a stack of S identical residual conv blocks — the homogeneous
    slice of the dilated backbone (each pp rank holds ONE stage's params,
    parallel/pipeline.py schedules microbatches through the ppermute
    ring; jax.grad pipelines the backward pass for free because ppermute
    transposes to the reverse ring).

    Returns (state, train_step) with
    train_step(state, xs (M,mb,H,W,C), ys like xs) -> (state, loss); the
    microbatch count M is taken from xs.shape[0].
    """
    import flax.linen as nn

    from pc_accumulation_lib_tpu.parallel import pipeline as pp

    S = mesh.shape['pp']

    class Block(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(channels, (3, 3), padding='SAME', name='conv')(x)
            return x + nn.relu(y)

    block = Block()
    x0 = jnp.zeros((microbatch, hw[0], hw[1], channels), jnp.float32)
    per_stage = [
        block.init(jax.random.PRNGKey(seed + s), x0)['params']
        for s in range(S)
    ]
    stacked = pp.place_stage_params(pp.stack_stage_params(per_stage), mesh)

    def stage_fn(params, x):
        return block.apply({'params': params}, x)

    run = pp.gpipe_apply(stage_fn, mesh)
    tx = optax.adam(lr)
    state = TrainState(variables={'params': stacked},
                       opt_state=tx.init(stacked),
                       step=jnp.zeros((), jnp.int32))

    def loss_fn(params, xs, ys):
        return jnp.mean((run(params, xs) - ys) ** 2)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, xs, ys):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.variables['params'], xs, ys)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.variables['params'])
        params = optax.apply_updates(state.variables['params'], updates)
        return TrainState(variables={'params': params},
                          opt_state=opt_state,
                          step=state.step + 1), loss

    return state, train_step
