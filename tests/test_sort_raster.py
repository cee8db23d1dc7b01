"""Sort-backend raster must match the scatter backend: exact for counts/
probmaps/medians/elevation; intensity sums differ only by f32 accumulation
order (cumsum vs scatter-add), within ~1e-4."""
import jax.numpy as jnp
import numpy as np
import pytest

from pc_accumulation_lib_tpu.bev import core

SEM_IDXS = {'road': 0, 'car': 13, 'truck': 14, 'bus': 15, 'motorcycle': 17}
P = 32
M = 8192


@pytest.fixture
def data(rng):
    pts = np.zeros((M, 10), np.float32)
    pts[:, 0:2] = rng.uniform(-25, 25, size=(M, 2))
    pts[:, 2] = rng.uniform(-2, 5, size=M)
    pts[:, 3] = rng.uniform(0, 1, size=M)
    pts[:, 4:7] = rng.integers(0, 256, size=(M, 3))
    pts[:, 7] = rng.choice([0, 1, 2, 13, 14, 15, 17], size=M)
    pts[:, 8] = rng.integers(0, 4, size=M)
    pts[:, 9] = rng.choice([0.0, 1.0], size=M, p=[0.85, 0.15])
    valid = rng.uniform(size=M) > 0.1
    fids = rng.integers(0, 12, size=M).astype(np.int32)
    inst_dyn = np.array([0., 1., 0., 0.], np.float32)
    return (jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(fids),
            jnp.asarray(inst_dyn))


def _compare(data, gen_future, **param_kw):
    params = core.identity_params(window=(1, 10), present_frame=6,
                                  **param_kw)
    fns = {
        b: core.make_raster_fn(40.0, P, SEM_IDXS, 20., 20., 0.5, backend=b)
        for b in ('scatter', 'sort')
    }
    outs = {b: core.unpack_maps(np.asarray(f(*data, params.pack(),
                                           gen_future)), gen_future)
            for b, f in fns.items()}
    assert set(outs['scatter']) == set(outs['sort'])
    for k in outs['scatter']:
        # f16 output quantum + f32 summation-order differences on intensity.
        atol = 2e-3 if k.startswith('intensity') else 1e-3
        np.testing.assert_allclose(
            np.asarray(outs['sort'][k], np.float32),
            np.asarray(outs['scatter'][k], np.float32), atol=atol,
            err_msg=k)


def test_sort_matches_scatter_future(data):
    _compare(data, gen_future=True)


def test_sort_matches_scatter_present_only(data):
    _compare(data, gen_future=False)


def test_sort_matches_scatter_with_height_filter(data):
    _compare(data, gen_future=True, height_thresh=2.0)


def test_sort_all_points_masked(data):
    pts, valid, fids, inst_dyn = data
    params = core.identity_params(window=(100, 100), present_frame=100)
    f = core.make_raster_fn(40.0, P, SEM_IDXS, 20., 20., 0.5,
                            backend='sort')
    out = core.unpack_maps(np.asarray(f(pts, valid, fids, inst_dyn,
                                        params.pack(), True)), True)
    # Empty input: Dirichlet prior 0.5 everywhere, elevation/rgb fill 0.
    np.testing.assert_allclose(np.asarray(out['road_full'], np.float32),
                               0.5)
    np.testing.assert_allclose(np.asarray(out['elevation_full'],
                                          np.float32), 0.0)
    np.testing.assert_allclose(np.asarray(out['rgb_full'], np.float32), 0.0)
