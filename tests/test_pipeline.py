"""GPipe pipeline-parallel executor (parallel/pipeline.py).

Proves on the 8-device CPU mesh that the pipelined schedule is EXACTLY the
sequential stage composition — forward values and parameter gradients —
for (a) a toy dense stage and (b) a stack of the semseg backbone's
Bottleneck blocks (models/resnet_semseg.py), and that the microbatch
schedule handles M != S.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pc_accumulation_lib_tpu.parallel import pipeline as pp

S = 4  # pipeline stages


@pytest.fixture(scope='module')
def mesh():
    if len(jax.devices()) < S:
        pytest.skip(f'needs {S} devices')
    return pp.make_pipeline_mesh(S)


def _dense_stage(params, x):
    return jnp.tanh(x @ params['w'] + params['b'])


def _toy_params(rng, d):
    keys = jax.random.split(rng, S)
    return [
        {'w': jax.random.normal(k, (d, d)) * 0.5,
         'b': jnp.zeros((d,))} for k in keys
    ]


@pytest.mark.parametrize('M', [S, 2 * S, S + 3])
def test_forward_matches_sequential(mesh, M):
    d, mb = 16, 8
    per_stage = _toy_params(jax.random.PRNGKey(0), d)
    xs = jax.random.normal(jax.random.PRNGKey(1), (M, mb, d))

    stacked = pp.place_stage_params(pp.stack_stage_params(per_stage), mesh)
    run = pp.gpipe_apply(_dense_stage, mesh)
    got = jax.jit(run)(stacked, xs)

    want = xs
    for p in per_stage:
        want = _dense_stage(p, want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_grads_match_sequential(mesh):
    d, mb, M = 8, 4, 8
    per_stage = _toy_params(jax.random.PRNGKey(2), d)
    xs = jax.random.normal(jax.random.PRNGKey(3), (M, mb, d))
    tgt = jax.random.normal(jax.random.PRNGKey(4), (M, mb, d))
    stacked_host = pp.stack_stage_params(per_stage)
    stacked = pp.place_stage_params(stacked_host, mesh)
    run = pp.gpipe_apply(_dense_stage, mesh)

    def loss_pp(params):
        return jnp.mean((run(params, xs) - tgt) ** 2)

    def loss_seq(stacked_params):
        y = xs
        for s in range(S):
            p = jax.tree_util.tree_map(lambda l, s=s: l[s], stacked_params)
            y = _dense_stage(p, y)
        return jnp.mean((y - tgt) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(stacked)
    g_seq = jax.grad(loss_seq)(stacked_host)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-5),
        g_pp, g_seq)


def test_bottleneck_stack_pipeline(mesh):
    """Pipeline a stack of the dilated backbone's identical layer3-style
    Bottleneck blocks (resnet_semseg.py:41-73) — the homogeneous-stage
    slice of the real semseg model."""
    from pc_accumulation_lib_tpu.models.resnet_semseg import Bottleneck
    block = Bottleneck(features=8, dilation=2, dtype=jnp.float32)
    x0 = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 32))
    per_stage = [
        block.init(jax.random.PRNGKey(10 + s), x0, train=False)
        for s in range(S)
    ]

    def stage_fn(variables, x):
        return block.apply(variables, x, train=False)

    M = 6
    xs = jax.random.normal(jax.random.PRNGKey(6), (M,) + x0.shape)
    stacked = pp.place_stage_params(pp.stack_stage_params(per_stage), mesh)
    got = jax.jit(pp.gpipe_apply(stage_fn, mesh))(stacked, xs)

    want = xs.reshape((-1,) + x0.shape[1:])
    for p in per_stage:
        want = stage_fn(p, want)
    np.testing.assert_allclose(np.asarray(got).reshape(want.shape),
                               np.asarray(want), atol=1e-4)


def test_pipelined_train_step_runs(mesh):
    """models/train.make_pipelined_train_setup: loss decreases over a few
    steps on random data (the PP analogue of the DP/TP trainer)."""
    from pc_accumulation_lib_tpu.models import train as train_mod
    state, step = train_mod.make_pipelined_train_setup(
        mesh, microbatch=2, hw=(8, 16), channels=16,
        lr=1e-2, seed=0)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(4, 2, 8, 16, 16)).astype(np.float32))
    ys = jnp.asarray(rng.normal(size=(4, 2, 8, 16, 16)).astype(np.float32))
    losses = []
    for _ in range(5):
        state, loss = step(state, xs, ys)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
