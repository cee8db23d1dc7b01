"""Bisect per-raster cost: full vs no-medians vs no-pack vs sort-only.

Builds raster variants at the bench shape (23x49152 rows, P=256,
pack='sparse') with pieces disabled, to attribute the ~13 ms
size-independent overhead. Run: python tools/profile_raster_variants.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..', '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.bev import core
from pc_accumulation_lib_tpu.ops import rasterize as ras
from pc_accumulation_lib_tpu.ops import sort_raster


def timeit(label, fn, n=10):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(f'{label:46s} {dt*1e3:8.2f} ms', flush=True)
    return dt


def main():
    N = 23 * 49152
    P = 256
    rng = np.random.default_rng(0)
    pts = np.zeros((N, 10), np.float32)
    pts[:, 0:2] = rng.uniform(-40, 40, size=(N, 2))
    pts[:, 2] = rng.uniform(-2, 6, size=N)
    pts[:, 3] = rng.uniform(0, 1, size=N)
    pts[:, 4:7] = rng.integers(0, 256, size=(N, 3))
    pts[:, 7] = rng.choice([0, 2, 13, 14, 15, 17], size=N)
    fids = rng.integers(0, 8, size=N).astype(np.int32)
    valid = rng.random(N) < 0.85
    params = core.identity_params(window=(0, 7), present_frame=4)
    pk = jnp.asarray(params.pack())
    p_d = jnp.asarray(pts)
    v_d = jnp.asarray(valid)
    f_d = jnp.asarray(fids)
    idn = jnp.zeros(4, jnp.float32)

    @jax.jit
    def rtt(x):
        return x + 1
    x0 = jnp.zeros(())
    t_rtt = timeit('RTT floor', lambda: np.asarray(rtt(x0)))

    def run(fn, *args):
        out = fn(*args)
        s = out[0] if isinstance(out, tuple) else out
        return np.asarray(jnp.sum(s.astype(jnp.float32)))

    # Full current raster (sparse pack, host-side warp).
    full = core.make_raster_fn(80.0, P, cfg.DEFAULT_SEM_IDXS, 20., 20., 0.5,
                               pack='sparse', sparse_cap=16384)

    @jax.jit
    def full_sum(p, v, f, i, k):
        out = full(p, v, f, i, k, True)
        return out[0].astype(jnp.float32).sum() + out[1].astype(
            jnp.float32).sum()

    # Dense output, no sparse pack.
    dense = core.make_raster_fn(80.0, P, cfg.DEFAULT_SEM_IDXS, 20., 20., 0.5)

    @jax.jit
    def dense_sum(p, v, f, i, k):
        return dense(p, v, f, i, k, True).astype(jnp.float32).sum()

    # Stats only: sorted_split_stats without channel assembly/pack.
    @jax.jit
    def stats_sum(p, v, f, i, k):
        prm = core.unpack_params(k)
        from pc_accumulation_lib_tpu.ops import geometry as geo
        ref = geo.homo_transform(prm.T_ref_world, p[:, :3]) - prm.bev_coords
        t = geo.geometric_transform(ref, prm.rot_ang, prm.trans_dx,
                                    prm.trans_dy)
        m = v & geo.crop_view_mask(t, 80.0)
        grid = geo.pos2grid(t[:, :2], 80.0, P)
        cells = jnp.clip(geo.grid_cell_index(grid[:, 0], grid[:, 1], P),
                         0, P * P - 1)
        chs = sort_raster.sorted_split_stats(
            cells, m, f >= prm.present_frame, t[:, 2], p[:, 3],
            p[:, 4:7], p[:, 7], dict(cfg.DEFAULT_SEM_IDXS), P, True,
            use_pallas=jax.default_backend() == 'tpu')
        return sum(jnp.sum(x) for x in chs.values())

    # Stats without medians: same but rgb constant (XLA DCEs the 6 sorts).
    @jax.jit
    def stats_nomed_sum(p, v, f, i, k):
        prm = core.unpack_params(k)
        from pc_accumulation_lib_tpu.ops import geometry as geo
        ref = geo.homo_transform(prm.T_ref_world, p[:, :3]) - prm.bev_coords
        t = geo.geometric_transform(ref, prm.rot_ang, prm.trans_dx,
                                    prm.trans_dy)
        m = v & geo.crop_view_mask(t, 80.0)
        grid = geo.pos2grid(t[:, :2], 80.0, P)
        cells = jnp.clip(geo.grid_cell_index(grid[:, 0], grid[:, 1], P),
                         0, P * P - 1)
        chs = sort_raster.sorted_split_stats(
            cells, m, f >= prm.present_frame, t[:, 2], p[:, 3],
            p[:, 4:7], p[:, 7], dict(cfg.DEFAULT_SEM_IDXS), P, True,
            use_pallas=jax.default_backend() == 'tpu')
        return sum(jnp.sum(x) for kk, x in chs.items()
                   if kk.startswith(('road_', 'count_', 'intensity_',
                                     'dynamic_', 'elevation_')))

    for label, fn in (('raster FULL (sparse+fallback)', full_sum),
                      ('raster dense (no sparse pack)', dense_sum),
                      ('stats all channels', stats_sum),
                      ('stats w/o rgb medians (DCEd)', stats_nomed_sum)):
        t = timeit(label, lambda fn=fn: np.asarray(
            fn(p_d, v_d, f_d, idn, pk)))
        print(f'  -> compute ~{(t - t_rtt)*1e3:7.2f} ms', flush=True)


if __name__ == '__main__':
    main()
