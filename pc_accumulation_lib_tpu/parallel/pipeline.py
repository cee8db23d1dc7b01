"""Pipeline parallelism: GPipe-style microbatch schedule over a 'pp' mesh
axis.

The reference has no distributed machinery at all (SURVEY.md section 2.3);
pipeline parallelism is the TPU-native way to stage a model whose layers
exceed one chip (or to overlap per-stage compute with ICI transfers). This
module implements the standard JAX idiom (scaling-book "pipelining"
recipe): stage parameters stacked on a leading axis and sharded over 'pp',
a `lax.scan` over clock ticks inside `shard_map`, and a `ppermute` ring
that hands each microbatch's activation to the next stage every tick.

Works under `jax.grad` (ppermute transposes to the reverse permutation, so
backward pipelining falls out for free) — see tests/test_pipeline.py for a
value+grad equivalence proof against the unpipelined model on an 8-device
CPU mesh, and models/train.make_pipelined_train_setup for the semseg
trainer wiring.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

try:
    from jax.lax import pcast as _pcast  # jax >= 0.8

    def _pvary(x, axes):
        return _pcast(x, axes, to='varying')
except ImportError:  # pragma: no cover
    from jax.lax import pvary as _pvary


def stack_stage_params(per_stage_params):
    """Stack a list of S structurally-identical stage pytrees into one
    pytree with a leading stage axis (shard it over 'pp' with
    place_stage_params)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                  *per_stage_params)


def place_stage_params(stacked, mesh: Mesh, axis: str = 'pp'):
    """Device-put stage-stacked params so stage s lives on pp-rank s."""
    def place(leaf):
        spec = P(axis, *([None] * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(place, stacked)


def gpipe_apply(stage_fn: Callable, mesh: Mesh, axis: str = 'pp'):
    """Build a pipelined forward: ``fn(stacked_params, xs) -> ys``.

    Args:
      stage_fn: (stage_params, x) -> y with x and y the SAME shape/dtype
        (homogeneous stages — the GPipe requirement; heterogeneous nets
        wrap ragged stages into equal-shape activations).
      mesh: mesh containing ``axis`` of size S (the stage count).
      axis: pipeline mesh-axis name.

    The returned fn takes stage-stacked params (leading axis S, sharded
    over ``axis`` — see place_stage_params) and microbatched inputs
    ``xs`` of shape (M, ...) (replicated over ``axis``), and returns the
    (M, ...) outputs of stage_{S-1}(...stage_0(x)...). Schedule: M + S - 1
    ticks; tick t feeds microbatch t into stage 0 and drains microbatch
    t - (S-1) from stage S-1; activations hop the ppermute ring between
    ticks (bubble fraction (S-1)/(M+S-1), the GPipe bound).
    """
    S = mesh.shape[axis]
    perm = [(i, (i + 1) % S) for i in range(S)]

    def run(stacked_params, xs):
        M = xs.shape[0]
        n_ticks = M + S - 1

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P()), out_specs=P())
        def pipelined(params_local, xs_rep):
            # params_local: leading axis 1 (this rank's stage).
            my_params = jax.tree_util.tree_map(lambda l: l[0], params_local)
            rank = jax.lax.axis_index(axis)
            # pvary: the scan carry crosses a ppermute, so it must enter
            # the loop already marked device-varying over the pp axis.
            act0 = _pvary(jnp.zeros_like(xs_rep[0]), (axis,))

            def tick(act, t):
                # Stage 0 picks up microbatch t (clamped; masked later).
                inp = jax.lax.dynamic_index_in_dim(
                    xs_rep, jnp.clip(t, 0, M - 1), axis=0, keepdims=False)
                cur = jnp.where(rank == 0, _pvary(inp, (axis,)), act)
                y = stage_fn(my_params, cur)
                # Drain BEFORE the ring hop: stage S-1's tick-t output is
                # microbatch t-(S-1).
                out = jnp.where(rank == S - 1, y, jnp.zeros_like(y))
                act_next = jax.lax.ppermute(y, axis, perm)
                return act_next, out

            _, outs = jax.lax.scan(tick, act0, jnp.arange(n_ticks))
            # Replicate stage S-1's drained outputs to every rank and keep
            # the valid tick range [S-1, M+S-1).
            outs = jax.lax.psum(outs, axis)
            return outs[S - 1:]

        return pipelined(stacked_params, xs)

    return run


def make_pipeline_mesh(n_stages: int, devices=None) -> Mesh:
    """1-D ('pp',) mesh over the first n_stages devices."""
    import numpy as np
    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices[:n_stages]), ('pp',))
