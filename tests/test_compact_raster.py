"""Compacted-group raster (ops/sort_raster compact_groups) parity.

The stats kernel's group space is renumbered by occupied-cell rank
(g = rank*nsplit + is_future) so the kernel's empty-window gate skips the
dead group space (~1 ms/raster at bench occupancy, PERF_NOTES round 5).
Rank order is ascending-cell order, so the SPARSE wire bytes must be
IDENTICAL to the dense-group form, and the dense overflow fallback (rank
space + cell_of_rank prefix) must decode to the identical stack. Pinned
here in interpret mode against the dense-group control; the on-chip gate
is `bench.py --selftest` (the bench path defaults to compact).

Reference semantics anchor: same per-cell stats as
/root/reference/bev_generator/sem_bev.py:535-554 (via the scatter spec
ops/rasterize.py the sort backend is pinned to).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from pc_accumulation_lib_tpu.bev import core
from pc_accumulation_lib_tpu.ops import sort_raster

from test_pallas_stats import _packed_words_case  # noqa: F401  (fixture dep)

P = 64
N_CELLS = P * P


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize('gen_future', [True, False])
@pytest.mark.parametrize('occupied_frac', [1.0, 0.02])
def test_compact_flat_stats_match_dense(rng, gen_future, occupied_frac):
    """Flat stats in rank space, scattered back to cell space, must be
    BIT-identical to the dense-group kernel output at every occupied cell
    (and hold the empty-cell constants at dead ranks)."""
    n_cells = 1024
    nsplit = 2 if gen_future else 1
    c2, w1, w2 = _packed_words_case(rng, 5000, n_cells, nsplit,
                                    occupied_frac=occupied_frac)
    kw = dict(n_cells=n_cells, gen_future=gen_future, rgb_fill=3,
              use_pallas=True, pallas_interpret=True, hist_medians=True)
    dense = sort_raster.split_stats_from_words_flat(c2, w1, w2, **kw)
    comp = sort_raster.split_stats_from_words_flat(c2, w1, w2,
                                                   compact_groups=True, **kw)
    cor = np.asarray(comp.pop('cell_of_rank'))
    assert cor.shape == (n_cells,)
    # Ranks enumerate occupied cells in ascending order, sentinel-tailed.
    occ_cells = np.unique(np.asarray(c2)[np.asarray(c2) < n_cells * nsplit]
                          // nsplit)
    n_live = occ_cells.size
    np.testing.assert_array_equal(cor[:n_live], occ_cells)
    assert (cor[n_live:] == n_cells).all()
    dead_cells = np.setdiff1d(np.arange(n_cells), occ_cells)
    for k in dense:
        d = np.asarray(dense[k])
        c = np.asarray(comp[k])
        # Rank i is occupied cell occ_cells[i], bit-identically.
        np.testing.assert_array_equal(c[..., :n_live], d[..., occ_cells],
                                      err_msg=k)
        # Dead ranks hold the same empty-cell constants dense mode puts
        # at unoccupied cells.
        np.testing.assert_array_equal(c[..., n_live:], d[..., dead_cells],
                                      err_msg=k)


def _prepped_pair(sparse_cap):
    kw = dict(view_size=40.0, pixel_size=P, int_scaler=20.,
              int_sep_scaler=20., int_mid_threshold=0.5, rgb_fill=0,
              pack='sparse', sparse_cap=sparse_cap, hist_medians=True,
              pallas_interpret=True)
    return (core.make_prepped_raster_fn(**kw),
            core.make_prepped_raster_fn(compact_groups=True, **kw))


def _case(rng, n, clustered):
    if clustered:
        xy = rng.normal(size=(n, 2)).astype(np.float32) * 3.0
    else:
        xy = rng.uniform(-19, 19, size=(n, 2)).astype(np.float32)
    z = rng.uniform(-1, 2, size=(n, 1)).astype(np.float32)
    ref = jnp.asarray(np.concatenate([xy, z], 1))
    valid = jnp.asarray(rng.uniform(size=n) < 0.95)
    fids = jnp.asarray(rng.integers(0, 10, size=n).astype(np.int32))
    road = (rng.uniform(size=n) < 0.5).astype(np.float32)
    dyn = (rng.uniform(size=n) < 0.1).astype(np.float32)
    rgb = rng.integers(0, 256, size=(n, 3)).astype(np.float32)
    inten = rng.uniform(size=n).astype(np.float32) * road
    w1, w2 = sort_raster.pack_payload_words(
        jnp.asarray(road), jnp.asarray(dyn), jnp.asarray(rgb),
        jnp.asarray(inten), ref[:, 2])
    # Tracked-dynamic partition bit (bev/core.make_prep_fn bit 26).
    w1 = w1 | (jnp.asarray(rng.uniform(size=n) < 0.05).astype(jnp.int32)
               << 26)
    pk = core.identity_params(window=(0, 10), present_frame=5).pack()
    return ref, valid, fids, w1, w2, (jnp.asarray(pk[:22]),
                                      jnp.asarray(pk[22:]))


@pytest.mark.parametrize('gen_future', [True, False])
def test_compact_sparse_wire_byte_identical(rng, gen_future):
    """No-overflow case: the compact raster's sparse buffer must be
    BYTE-identical to the dense-group control's (host decode, incl. the
    native bevdec, is untouched by the compaction)."""
    caps = (2560, 2560, 2560)
    ctrl, comp = _prepped_pair(caps)
    args = _case(rng, 6000, clustered=True)
    sp_a, dn_a = ctrl(*args, gen_future=gen_future)
    sp_b, dn_b = comp(*args, gen_future=gen_future)
    a, bb = np.asarray(sp_a), np.asarray(sp_b)
    # The WIRE bytes (header + used value rows — all an adaptive fetch
    # ships, all decode reads) must be byte-identical. The dead cap
    # padding past the used rows may differ: a section's padding gathers
    # other-split ranks in compact mode vs other cells in dense mode.
    used = core.sparse_used_bytes(a, P, gen_future)
    assert used == core.sparse_used_bytes(bb, P, gen_future)
    np.testing.assert_array_equal(a[:used], bb[:used])
    # Dense fallback: different layout (rank space + cell_of_rank
    # prefix), identical decode.
    a = np.asarray(dn_a)
    b = np.asarray(dn_b)
    assert b.shape[0] == a.shape[0] + 4 * N_CELLS
    np.testing.assert_array_equal(
        core.decode_dense_words(a, gen_future, P),
        core.decode_dense_words(b, gen_future, P))
    # And the sparse decode round-trips.
    ev = core.sparse_empty_values(20., 20., 0.5)
    np.testing.assert_array_equal(
        core.decode_sparse_stack(np.asarray(sp_a), gen_future, P, caps, ev),
        core.decode_sparse_stack(np.asarray(sp_b), gen_future, P, caps, ev))


def test_compact_overflow_falls_back_identically(rng):
    """Uniform occupancy above the sparse caps: decode raises
    SparseOverflow on both forms and the dense fallbacks decode to the
    identical stack (the real consumer path, sem_bev._fetch_stack)."""
    caps = (512, 512, 512)
    ctrl, comp = _prepped_pair(caps)
    args = _case(rng, 20000, clustered=False)
    sp_a, dn_a = ctrl(*args, gen_future=True)
    sp_b, dn_b = comp(*args, gen_future=True)
    ev = core.sparse_empty_values(20., 20., 0.5)
    for sp in (sp_a, sp_b):
        with pytest.raises(core.SparseOverflow):
            core.decode_sparse_stack(np.asarray(sp), True, P, caps, ev)
    np.testing.assert_array_equal(
        core.decode_dense_words(np.asarray(dn_a), True, P),
        core.decode_dense_words(np.asarray(dn_b), True, P))


def test_compact_empty_input(rng):
    """All-masked input: zero occupancy, equal wire bytes, equal fallback
    decode (every cell holds the empty constants)."""
    ctrl, comp = _prepped_pair((2560, 2560, 2560))
    ref, _, fids, w1, w2, pv = _case(rng, 2000, clustered=True)
    valid = jnp.zeros(2000, bool)
    sp_a, dn_a = ctrl(ref, valid, fids, w1, w2, pv, gen_future=True)
    sp_b, dn_b = comp(ref, valid, fids, w1, w2, pv, gen_future=True)
    np.testing.assert_array_equal(np.asarray(sp_a), np.asarray(sp_b))
    assert core.read_sparse_noccs(np.asarray(sp_b), P, True).sum() == 0
    np.testing.assert_array_equal(
        core.decode_dense_words(np.asarray(dn_a), True, P),
        core.decode_dense_words(np.asarray(dn_b), True, P))


def test_compact_requires_sparse_pack():
    with pytest.raises(ValueError, match='sparse'):
        core.make_prepped_raster_fn(
            40.0, P, 20., 20., 0.5, pack=None, compact_groups=True,
            pallas_interpret=True)
