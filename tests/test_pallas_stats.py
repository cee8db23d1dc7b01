"""Pallas windowed segmented-stats kernel vs numpy oracle (interpret mode
on the CPU test backend; the same kernel compiles natively on TPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from pc_accumulation_lib_tpu.ops import pallas_stats as ps

G = 2048  # multiple of WIN


@pytest.mark.parametrize('n', [1000, 4096])
def test_segmented_stats_matches_numpy(rng, n):
    keys = np.sort(rng.integers(0, G, size=n)).astype(np.int32)
    w1 = rng.uniform(size=n).astype(np.float32)
    w2 = (rng.uniform(size=n) > 0.5).astype(np.float32)
    z = rng.normal(size=n).astype(np.float32)
    sums, zmin = ps.segmented_stats(
        jnp.asarray(keys), [jnp.ones(n, jnp.float32), jnp.asarray(w1),
                            jnp.asarray(w2)], jnp.asarray(z), G,
        interpret=True)
    sums, zmin = np.asarray(sums), np.asarray(zmin)
    np.testing.assert_allclose(sums[:, 0], np.bincount(keys, minlength=G))
    np.testing.assert_allclose(sums[:, 1],
                               np.bincount(keys, weights=w1, minlength=G),
                               atol=1e-3)
    np.testing.assert_allclose(sums[:, 2],
                               np.bincount(keys, weights=w2, minlength=G),
                               atol=1e-5)
    zm = np.full(G, np.inf)
    np.minimum.at(zm, keys, z)
    np.testing.assert_allclose(np.nan_to_num(zmin, posinf=1e9),
                               np.nan_to_num(zm, posinf=1e9), atol=1e-6)


def test_empty_groups_and_sentinels(rng):
    # All keys in one group; sentinels (== G) excluded.
    n = 700
    keys = np.full(n, 3, np.int32)
    z = rng.normal(size=n).astype(np.float32)
    sums, zmin = ps.segmented_stats(jnp.asarray(keys),
                                    [jnp.ones(n, jnp.float32)],
                                    jnp.asarray(z), G, interpret=True)
    assert float(sums[3, 0]) == n
    assert float(np.asarray(sums)[:, 0].sum()) == n
    np.testing.assert_allclose(float(zmin[3]), z.min(), atol=1e-6)
    assert np.isinf(np.asarray(zmin)[4])


def test_sort_raster_pallas_matches_xla(rng):
    """sorted_split_stats(use_pallas=True, interpret) must equal the pure
    XLA path."""
    from pc_accumulation_lib_tpu.ops import sort_raster
    P = 32
    n = 3000
    cells = jnp.asarray(rng.integers(0, P * P, size=n), jnp.int32)
    static_m = jnp.asarray(rng.uniform(size=n) > 0.2)
    is_fut = jnp.asarray(rng.uniform(size=n) > 0.5)
    z = jnp.asarray(rng.normal(size=n), jnp.float32)
    inten = jnp.asarray(rng.uniform(size=n), jnp.float32)
    rgb = jnp.asarray(rng.integers(0, 256, size=(n, 3)), jnp.float32)
    sem = jnp.asarray(rng.choice([0, 1, 13], size=n), jnp.float32)
    sem_idxs = {'road': 0, 'car': 13, 'truck': 14, 'bus': 15,
                'motorcycle': 17}
    kw = dict(sem_idxs=sem_idxs, pixel_size=P, gen_future=True)
    a = sort_raster.sorted_split_stats(cells, static_m, is_fut, z, inten,
                                       rgb, sem, use_pallas=False, **kw)
    b = sort_raster.sorted_split_stats(cells, static_m, is_fut, z, inten,
                                       rgb, sem, use_pallas=True,
                                       pallas_interpret=True, **kw)
    for k in a:
        if k.startswith('elevation'):
            # The Pallas path ships z as float16 sort-payload bits; f16
            # rounding commutes with min, so the f16 OUTPUT contract
            # (bev/core casts the stack to f16) is exact.
            np.testing.assert_array_equal(
                np.asarray(b[k]).astype(np.float16),
                np.asarray(a[k]).astype(np.float16), err_msg=k)
        else:
            np.testing.assert_allclose(np.asarray(b[k]), np.asarray(a[k]),
                                       atol=2e-4, err_msg=k)


def _packed_words_case(rng, n, n_cells, nsplit, occupied_frac=1.0,
                       z_vals=None):
    """Random (c2, word1, word2) triple in pack_payload_words layout."""
    from pc_accumulation_lib_tpu.ops import sort_raster
    sent = n_cells * nsplit
    if occupied_frac < 1.0:
        # Cluster occupancy so whole kernel windows stay empty (the words
        # kernel gates its median finalize on that).
        lo = int(sent * 0.4)
        cells = rng.integers(lo, lo + max(2, int(sent * occupied_frac)),
                             size=n)
    else:
        cells = rng.integers(0, sent, size=n)
    c2 = np.where(rng.uniform(size=n) < 0.9, cells, sent).astype(np.int32)
    road = (rng.uniform(size=n) < 0.5).astype(np.float32)
    dyn = (rng.uniform(size=n) < 0.2).astype(np.float32)
    rgb = rng.integers(0, 256, size=(n, 3)).astype(np.float32)
    inten = rng.uniform(size=n).astype(np.float32) * road
    if z_vals is None:
        z = rng.normal(size=n).astype(np.float32) * 3.0
    else:
        z = np.resize(np.asarray(z_vals, np.float32), n)
    w1, w2 = sort_raster.pack_payload_words(
        jnp.asarray(road), jnp.asarray(dyn), jnp.asarray(rgb),
        jnp.asarray(inten), jnp.asarray(z))
    return jnp.asarray(c2), w1, w2


@pytest.mark.parametrize('gen_future', [True, False])
@pytest.mark.parametrize('occupied_frac', [1.0, 0.02])
def test_words_kernel_matches_unpacked_kernel(rng, gen_future,
                                              occupied_frac):
    """The words form (in-kernel unpack + empty-window median gating)
    must be BIT-identical to the XLA-unpacked kernel path on every
    channel — same matmuls over the same values."""
    from pc_accumulation_lib_tpu.ops import sort_raster
    n_cells = 1024
    nsplit = 2 if gen_future else 1
    c2, w1, w2 = _packed_words_case(rng, 5000, n_cells, nsplit,
                                    occupied_frac=occupied_frac)
    kw = dict(n_cells=n_cells, gen_future=gen_future, rgb_fill=3,
              use_pallas=True, pallas_interpret=True, hist_medians=True)
    a = sort_raster.split_stats_from_words_flat(c2, w1, w2,
                                                words_kernel=False, **kw)
    b = sort_raster.split_stats_from_words_flat(c2, w1, w2,
                                                words_kernel=True, **kw)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(b[k]), np.asarray(a[k]),
                                      err_msg=k)


def test_words_kernel_f16_z_decode_exact(rng):
    """The kernel's arithmetic f16-bit decode must be exact for normals,
    subnormals, zeros and negatives (elevation is the one f16-contract
    channel)."""
    from pc_accumulation_lib_tpu.ops import sort_raster
    tricky = [0.0, -0.0, 1.0, -1.0, 5.9604645e-08, -5.9604645e-08,
              6.0975552e-05, -6.0975552e-05, 3.0517578e-05, 65504.0,
              -65504.0, 0.333251953125, -2.5, 1e-4, -1e-4, 1234.5]
    n_cells = 512
    c2, w1, w2 = _packed_words_case(rng, 4096, n_cells, 1,
                                    z_vals=tricky)
    kw = dict(n_cells=n_cells, gen_future=False, use_pallas=True,
              pallas_interpret=True, hist_medians=True)
    a = sort_raster.split_stats_from_words_flat(c2, w1, w2,
                                                words_kernel=False, **kw)
    b = sort_raster.split_stats_from_words_flat(c2, w1, w2,
                                                words_kernel=True, **kw)
    np.testing.assert_array_equal(np.asarray(b['elevation_present']),
                                  np.asarray(a['elevation_present']))


def test_hist_medians_match_sort_medians(rng):
    """hist_medians=True (in-kernel MXU value histograms) must reproduce
    the median sorts' rgb maps EXACTLY — integer order statistics both
    ways — and every other channel unchanged."""
    from pc_accumulation_lib_tpu.ops import sort_raster
    P = 32
    n = 4000
    cells = jnp.asarray(rng.integers(0, P * P, size=n), jnp.int32)
    static_m = jnp.asarray(rng.uniform(size=n) > 0.2)
    is_fut = jnp.asarray(rng.uniform(size=n) > 0.7)
    z = jnp.asarray(rng.normal(size=n), jnp.float32)
    inten = jnp.asarray(rng.uniform(size=n), jnp.float32)
    rgb = jnp.asarray(rng.integers(0, 256, size=(n, 3)), jnp.float32)
    sem = jnp.asarray(rng.choice([0, 1, 13], size=n), jnp.float32)
    sem_idxs = {'road': 0, 'car': 13, 'truck': 14, 'bus': 15,
                'motorcycle': 17}
    for gen_future in (True, False):
        kw = dict(sem_idxs=sem_idxs, pixel_size=P, gen_future=gen_future,
                  rgb_fill=7)
        a = sort_raster.sorted_split_stats(
            cells, static_m, is_fut, z, inten, rgb, sem, use_pallas=True,
            pallas_interpret=True, **kw)
        b = sort_raster.sorted_split_stats(
            cells, static_m, is_fut, z, inten, rgb, sem, use_pallas=True,
            pallas_interpret=True, hist_medians=True, **kw)
        for k in a:
            if k.startswith('rgb'):
                np.testing.assert_array_equal(np.asarray(b[k]),
                                              np.asarray(a[k]), err_msg=k)
            else:
                np.testing.assert_allclose(np.asarray(b[k]),
                                           np.asarray(a[k]), atol=2e-4,
                                           err_msg=k)
