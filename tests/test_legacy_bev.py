"""Legacy functional BEV pipeline tests vs numpy oracles re-implemented
from utils/bev_generation.py:155-462."""
import numpy as np
import pytest

from pc_accumulation_lib_tpu.bev import legacy

P = 32
V = 40.0


@pytest.fixture
def clouds(rng):
    def make(n):
        pc = np.zeros((n, 8))
        pc[:, 0:2] = rng.uniform(-18, 18, size=(n, 2))
        pc[:, 2] = rng.uniform(-1.7, 2, size=n)
        pc[:, 3] = rng.uniform(0, 1, size=n)
        pc[:, 4:7] = rng.integers(0, 256, size=(n, 3))
        pc[:, 7] = rng.choice([0, 1, 2, 13], size=n)
        return pc
    poses = np.stack([np.linspace(-10, 10, 15), np.zeros(15),
                      np.zeros(15)], 1)
    return make(3000), make(2000), poses.copy(), poses.copy()


def test_gen_view_schema_and_ranges(clouds):
    pc_p, pc_f, poses_p, poses_f = clouds
    rng = np.random.default_rng(0)
    bev = legacy.gen_view(pc_p, pc_f, poses_p, poses_f, 0.3, 1.0, -1.0,
                          1.0, V, P, rng=rng)
    for k in legacy._KEYS:
        assert bev[k].shape == (P, P)
        assert bev[k].dtype == np.float16
    assert 0 <= float(bev['gridmap_past_road'].astype(np.float32).min())
    assert float(bev['gridmap_past_road'].astype(np.float32).max()) <= 1
    d = bev['gridmap_dynamic'].astype(np.float32)
    assert 0 <= d.min() and d.max() <= 1
    # Empty-cell elevation fill.
    e = bev['elevmap_past_mean'].astype(np.float32)
    assert np.isclose(e.min(), -legacy.LIDAR_HEIGHT_FROM_GROUND, atol=0.1) \
        or (e == np.float16(-1.7)).any()
    assert bev['poses_past'].shape[1] == 3


def test_mean_elevation_oracle(rng):
    """Mean-z with lidar-height fill (reference :248-276), no warp
    (identity params via direct map call)."""
    import jax.numpy as jnp
    from pc_accumulation_lib_tpu.ops import geometry as geo
    n = 500
    px = rng.integers(0, P, size=n)
    py = rng.integers(0, P, size=n)
    z = rng.uniform(-1, 1, size=n)
    cells = geo.grid_cell_index(jnp.asarray(px), jnp.asarray(py), P)
    got = np.asarray(legacy._mean_map(cells, jnp.ones(n, bool),
                                      jnp.asarray(z, jnp.float32), P,
                                      -1.7))
    expected = np.full((P, P), -1.7)
    cnt = np.zeros((P, P))
    acc = np.zeros((P, P))
    for i in range(n):
        r, c = P - 1 - py[i], px[i]
        cnt[r, c] += 1
        acc[r, c] += z[i]
    m = cnt > 0
    expected[m] = acc[m] / cnt[m]
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_gen_aug_view(clouds, tmp_path):
    pc_p, pc_f, poses_p, poses_f = clouds
    inputs = dict(pc_present=pc_p, pc_future=pc_f, poses_present=poses_p,
                  poses_future=poses_f, view_size=V, pixel_size=P,
                  max_translation_radius=2.0, zoom_threshold=0.1)
    bev = legacy.gen_aug_view(inputs, rng=np.random.default_rng(1))
    assert set(legacy._KEYS) <= set(bev.keys())
    legacy.viz_bev(bev, str(tmp_path / 'legacy.png'))
    assert (tmp_path / 'legacy.png').exists()
