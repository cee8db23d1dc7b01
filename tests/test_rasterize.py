"""Rasterizer equivalence tests vs numpy oracles re-implemented from the
reference semantics (bev_generator.py:373-480, sem_bev.py:535-669).

Per-cell median and min are order-independent statistics, so the scatter
equivalents are exactly checkable (SURVEY.md section 4)."""
import jax.numpy as jnp
import numpy as np
import pytest

from pc_accumulation_lib_tpu.ops import geometry as geo
from pc_accumulation_lib_tpu.ops import rasterize as ras

P = 16


@pytest.fixture
def cloud(rng):
    n = 2000
    px = rng.integers(0, P, size=n).astype(np.float64)
    py = rng.integers(0, P, size=n).astype(np.float64)
    z = rng.normal(size=n)
    inten = rng.uniform(size=n)
    rgb = rng.integers(0, 256, size=(n, 3)).astype(np.float64)
    sem = rng.choice([0, 1, 2, 13, 14, 15, 17], size=n).astype(np.float64)
    mask = rng.uniform(size=n) > 0.2
    cells = geo.grid_cell_index(jnp.asarray(px), jnp.asarray(py), P)
    return dict(px=px, py=py, z=z, inten=inten, rgb=rgb, sem=sem, mask=mask,
                cells=cells)


def oracle_count(px, py, mask, weights=None):
    w = None if weights is None else weights[mask]
    H, _, _ = np.histogram2d(py[mask], px[mask], range=[[0, P], [0, P]],
                             bins=[P, P], weights=w)
    return np.flip(H, axis=0)


def test_count_map(cloud):
    got = ras.count_map(cloud['cells'], jnp.asarray(cloud['mask']), P)
    np.testing.assert_array_equal(np.asarray(got),
                                  oracle_count(cloud['px'], cloud['py'],
                                               cloud['mask']))


def test_weighted_count_map(cloud):
    got = ras.count_map(cloud['cells'], jnp.asarray(cloud['mask']), P,
                        weights=jnp.asarray(cloud['inten'], jnp.float32))
    np.testing.assert_allclose(
        np.asarray(got),
        oracle_count(cloud['px'], cloud['py'], cloud['mask'],
                     cloud['inten']), rtol=1e-5)


def test_sem_probmap(cloud):
    """Dirichlet probmap (bev_generator.py:373-394, :457-480)."""
    road = cloud['sem'] == 0
    c_sem = oracle_count(cloud['px'], cloud['py'], cloud['mask'] & road)
    c_not = oracle_count(cloud['px'], cloud['py'], cloud['mask'] & ~road)
    expected = (c_sem + 1.0) / (c_sem + c_not + 2.0)
    got = ras.sem_probmap(cloud['cells'], jnp.asarray(cloud['mask']),
                          jnp.asarray(road), P)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)


def test_intensity_map(cloud):
    """sum/(count+1) over road points (bev_generator.py:396-415)."""
    road = cloud['mask'] & (cloud['sem'] == 0)
    s = oracle_count(cloud['px'], cloud['py'], road, cloud['inten'])
    c = oracle_count(cloud['px'], cloud['py'], road)
    expected = s / (c + 1.0)
    got = ras.intensity_map(cloud['cells'],
                            jnp.asarray(road),
                            jnp.asarray(cloud['inten'], jnp.float32), P)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)


def oracle_elevation(px, py, z, mask):
    """Min-z elevation oracle (sem_bev.py:535-554)."""
    elev = np.zeros((P, P))
    seen = np.zeros((P, P), dtype=bool)
    for i in range(px.shape[0]):
        if not mask[i]:
            continue
        col = int(px[i])
        row = P - 1 - int(py[i])
        if seen[row, col]:
            elev[row, col] = min(elev[row, col], z[i])
        else:
            elev[row, col] = z[i]
            seen[row, col] = True
    return elev


def test_elevation_map(cloud):
    expected = oracle_elevation(cloud['px'], cloud['py'], cloud['z'],
                                cloud['mask'])
    got = ras.elevation_map(cloud['cells'], jnp.asarray(cloud['mask']),
                            jnp.asarray(cloud['z'], jnp.float32), P)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)


def oracle_rgb_median(px, py, rgb, mask, fill=0):
    """Per-cell median oracle (sem_bev.py:619-669)."""
    maps = np.zeros((3, P, P))
    for c in range(3):
        lists = [[[] for _ in range(P)] for _ in range(P)]
        for i in range(px.shape[0]):
            if not mask[i]:
                continue
            col = int(px[i])
            row = P - 1 - int(py[i])
            lists[row][col].append(rgb[i, c])
        for r in range(P):
            for col in range(P):
                vals = lists[r][col] if lists[r][col] else [fill]
                maps[c, r, col] = np.median(vals)
    return maps


def test_rgb_median_maps_exact(cloud):
    expected = oracle_rgb_median(cloud['px'], cloud['py'], cloud['rgb'],
                                 cloud['mask'])
    got = ras.rgb_median_maps(cloud['cells'], jnp.asarray(cloud['mask']),
                              jnp.asarray(cloud['rgb'], jnp.float32), P)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)


def test_median_empty_cells_filled():
    cells = jnp.asarray([0, 0], jnp.int32)
    mask = jnp.asarray([True, True])
    vals = jnp.asarray([10.0, 20.0])
    got = ras.median_value_map(cells, mask, vals, P, fill_value=7)
    assert float(got[0, 0]) == 15.0
    assert float(got[1, 1]) == 7.0


def test_road_marking_transform():
    """int_scaler*sigmoid(sep*(v-mid)) clipped at 1 (sem_bev.py:593-613)."""
    v = np.linspace(0, 1, 11)
    expected = np.minimum(20.0 / (1.0 + np.exp(-20.0 * (v - 0.5))), 1.0)
    got = ras.road_marking_transform(jnp.asarray(v, jnp.float32), 20.0, 20.0,
                                     0.5)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)


def test_bev_split_channels_complete(cloud):
    sem_idxs = {'road': 0, 'car': 13, 'truck': 14, 'bus': 15,
                'motorcycle': 17}
    out = ras.bev_split_channels(cloud['cells'], jnp.asarray(cloud['mask']),
                                 jnp.asarray(cloud['z'], jnp.float32),
                                 jnp.asarray(cloud['inten'], jnp.float32),
                                 jnp.asarray(cloud['rgb'], jnp.float32),
                                 jnp.asarray(cloud['sem'], jnp.float32),
                                 sem_idxs, P)
    assert set(out) == {'road', 'intensity', 'rgb', 'dynamic', 'elevation'}
    assert out['rgb'].shape == (3, P, P)
    assert out['road'].shape == (P, P)
    # Dynamic channel counts the 4 vehicle classes (sem_bev.py:55).
    dyn_sel = np.isin(cloud['sem'], [13, 14, 15, 17])
    c_dyn = oracle_count(cloud['px'], cloud['py'], cloud['mask'] & dyn_sel)
    c_not = oracle_count(cloud['px'], cloud['py'], cloud['mask'] & ~dyn_sel)
    np.testing.assert_allclose(np.asarray(out['dynamic']),
                               (c_dyn + 1) / (c_dyn + c_not + 2), rtol=1e-6)
