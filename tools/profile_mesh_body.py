"""Measure the mesh raster bodies' PER-SHARD device cost on one chip.

The psum mesh raster (parallel/sharded.make_sharded_raster_fn) is the
readable spec: per-shard scatter accumulators (ras.split_accumulators)
whose rgb-histogram output is (3, P^2, 256) int32 — ~200 MB per split —
combined with psum. The tile engine instead routes rows to cell owners
and runs the single-chip sort pipeline per stripe. This profiler times
the three per-shard compute bodies on the REAL chip at bench scale
(collectives excluded — they need a pod; the wire math is in the
make_tile_sharded_raster_fn docstring):

  A. scatter accumulators + finalize (the psum body's local work);
  B. the single-chip sort+Pallas raster (what the tile engine runs on
     its stripe, here at full map size = an upper bound);
  C. the tile body's routing overhead alone (dest sort + capacity
     gather) at shard scale.

Timing is value-fetch based (block_until_ready is a no-op through the
tunnel); numbers carry ~±7 ms tunnel noise — trust ratios, not digits.
Run: python tools/profile_mesh_body.py [M_rows]
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
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.bev import core
from pc_accumulation_lib_tpu.ops import rasterize as ras
from pc_accumulation_lib_tpu.ops import sort_raster

P = 256
SEM_IDXS = cfg.DEFAULT_SEM_IDXS


def _rtt_floor(reps=8):
    """Median cost of fetching a tiny READY array — the tunnel round
    every timed() measurement pays once; subtracted so numbers are
    device-compute estimates like the other tools/profile_*.py."""
    base = jnp.zeros((2,), jnp.float32)
    bump = jax.jit(lambda x, i: x + i)
    _ = np.asarray(bump(base, 0.0))
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        # A FRESH output buffer each rep: jax caches the host copy of an
        # already-fetched array, so refetching the same buffer is free.
        _ = np.asarray(bump(base, float(i + 1)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timed(fn, args, rtt, reps=8, warm=2):
    for _ in range(warm):
        out = fn(*args)
    outs = jax.tree_util.tree_leaves(out)
    probe = outs[0]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        probe = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(probe.reshape(-1)[:2])   # forces completion
        ts.append(time.perf_counter() - t0)
    return max(0.0, float(np.median(ts)) - rtt) * 1e3


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 993280
    n = 8                                   # modeled pod size
    M_l = M // n
    rng = np.random.default_rng(0)

    def cloud(m):
        pts = np.zeros((m, 10), np.float32)
        pts[:, 0:2] = rng.uniform(-40, 40, size=(m, 2))
        pts[:, 2] = rng.uniform(-2, 6, size=m)
        pts[:, 3] = rng.uniform(0, 1, size=m)
        pts[:, 4:7] = rng.integers(0, 256, size=(m, 3))
        pts[:, 7] = rng.choice([0, 2, 13, 14, 15, 17], size=m)
        fids = rng.integers(0, 8, size=m).astype(np.int32)
        valid = rng.random(m) < 0.9
        return jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(fids)

    params = core.identity_params(window=(0, 7), present_frame=4)
    packed = jnp.asarray(params.pack())
    rtt = _rtt_floor()
    print(f'rtt floor subtracted: {rtt*1e3:.1f} ms', file=sys.stderr)

    # --- A: psum body local work at one shard's row count -------------
    @jax.jit
    def psum_local(points, valid, fids):
        cells = jnp.clip(
            (points[:, 0] * 3.2 + 128).astype(jnp.int32) * P
            + jnp.clip((points[:, 1] * 3.2 + 128).astype(jnp.int32),
                       0, P - 1), 0, P * P - 1)
        m = valid
        out = []
        for sm in (m & (fids < 4), m & (fids >= 4), m):
            acc = ras.split_accumulators(
                cells, sm, points[:, 2], points[:, 3], points[:, 4:7],
                points[:, 7], SEM_IDXS, P)
            out.append(ras.finalize_split(acc, P))
        return jnp.stack([out[i]['road'] for i in range(3)])

    pts_l, val_l, fid_l = cloud(M_l)
    a = timed(psum_local, (pts_l, val_l, fid_l), rtt)
    print(f'A psum-body local (scatter+hist, {M_l} rows): {a:.1f} ms',
          file=sys.stderr)

    # --- B: single-chip sort+Pallas raster at FULL row count ----------
    raster = core.make_raster_fn(80.0, P, SEM_IDXS, 20., 20., 0.5)
    pts, val, fid = cloud(M)
    b = timed(lambda *args: raster(*args, True),
              (pts, val, fid, jnp.zeros(4, jnp.float32), packed), rtt)
    print(f'B single-chip sort+kernel raster ({M} rows): {b:.1f} ms',
          file=sys.stderr)

    # --- C: tile routing overhead at shard scale -----------------------
    cap = max(1, int(4.0 * M_l / n))

    @jax.jit
    def route(points, valid, fids):
        c2 = jnp.where(valid, jnp.clip(
            (points[:, 0] * 3.2 + 128).astype(jnp.int32), 0,
            P * P * 2 - 1), P * P * 2)
        w1 = points[:, 4].astype(jnp.int32)
        w2 = points[:, 5].astype(jnp.int32)
        dest = jnp.where(c2 < P * P * 2, (c2 // 2) % n, n)
        sd, sc2, sw1, sw2 = jax.lax.sort((dest, c2, w1, w2), num_keys=1)
        bounds = jnp.searchsorted(
            sd, jnp.arange(n + 1, dtype=sd.dtype), side='left',
            method='sort').astype(jnp.int32)
        starts, ends = bounds[:n], bounds[1:]
        idx = starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
        ok = idx < ends[:, None]
        idxc = jnp.minimum(idx, M_l - 1)
        return (jnp.where(ok, sc2[idxc], 0), jnp.where(ok, sw1[idxc], 0),
                jnp.where(ok, sw2[idxc], 0))

    c = timed(route, (pts_l, val_l, fid_l), rtt)
    print(f'C tile routing (dest sort + cap gather, {M_l} rows -> '
          f'{n}x{cap}): {c:.1f} ms', file=sys.stderr)
    print(f'=> psum-body/sort ratio at equal rows ~ '
          f'{a / max(b * M_l / M, 1e-9):.1f}x; tile per-shard ~ '
          f'{(b * M_l / M) + c:.1f} ms vs psum local {a:.1f} ms '
          f'(+ its {3 * P * P * 256 * 4 * 3 / 1e6:.0f} MB hist psum)',
          file=sys.stderr)


if __name__ == '__main__':
    main()
