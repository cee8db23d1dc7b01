"""One-off on-chip microbench for the compact-raster integration decisions:

1. COMPACT at cap_groups = sent (131072): the no-overflow variant — rank
   space big enough that union can never exceed it (union <= P*P). If it
   times like the 49152/65536 caps, the integration needs no redo path.
2. The occupancy-mask scatter: a sorted-unique 65536-index u8 scatter
   (cell_of_rank -> cell-space mask bits). If it costs ~0.2 ms it rides
   inside the 1.4 ms/raster compact win; if it costs ~0.7 ms the win
   thins and the list wire format would be back on the table.

Both repeated 8x inside one jit (the RTT-corrected single-shot numbers
carry +-7 ms tunnel noise).
"""
import functools
import sys
import time

import numpy as np

sys.path.insert(0, '.')
import jax                                          # noqa: E402
import jax.numpy as jnp                             # noqa: E402

jax.config.update('jax_compilation_cache_dir', '.jax_cache')

from pc_accumulation_lib_tpu.ops import pallas_stats    # noqa: E402
from tools.profile_raster_wall import make_case, timeit  # noqa: E402


def main():
    n = 860160
    P = 256
    sent = P * P * 2
    rng = np.random.default_rng(0)
    c2, w1, w2 = make_case(rng, n, P, spread=0.07)

    @jax.jit
    def rtt(x):
        return x + 1
    x0 = jnp.zeros((), jnp.int32)
    np.asarray(rtt(x0))
    floor = timeit('RTT floor', lambda: np.asarray(rtt(x0)))

    def corr(label, fn, n_rep=10):
        dt = timeit(label, fn, n_rep)
        print(f'  -> compute ~{(dt - floor) * 1e3:7.2f} ms', flush=True)
        return dt - floor

    s_c2, s_w1, s_w2 = jax.jit(
        lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1))(c2, w1, w2)
    jax.block_until_ready(s_w2)

    def rank_groups(sc, cap_groups):
        cell = sc >> 1
        head = jnp.concatenate([
            jnp.ones((1,), jnp.int32),
            (cell[1:] != cell[:-1]).astype(jnp.int32)])
        rank = jnp.cumsum(head) - 1
        return jnp.where(sc < sent, rank * 2 + (sc & 1), cap_groups)

    REPS = 8

    @functools.partial(jax.jit, static_argnames=('cap_groups', 'compact'))
    def rep(sc, sa, sb, cap_groups, compact):
        def body(i, acc):
            g = rank_groups(sc, cap_groups) if compact else sc
            st = pallas_stats.segmented_stats_words(
                g, sa, sb ^ (acc & 1), cap_groups,
                hist_medians=True, med_nsplit=2)
            return (st[0].sum() + st[1][0] + st[2][0, 0, 0]).astype(
                jnp.int32)
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    for label, cap_g, compact in (
            ('dense 131072', sent, False),
            ('COMPACT 65536', 65536, True),
            ('COMPACT 131072 (no-overflow cap)', sent, True)):
        t = corr(f'{label} x{REPS} (in-jit)',
                 lambda cg=cap_g, co=compact: np.asarray(
                     rep(s_c2, s_w1, s_w2, cg, co)))
        print(f'  -> per-rep ~{t / REPS * 1e3:7.2f} ms', flush=True)

    # Mask scatter: cell_of_rank (sorted, unique, sentinel-tailed) ->
    # (P*P+1,) u8 occupancy-bit scatter, as _pack_sparse would issue it.
    union = 7994
    cell_of_rank = np.full(P * P, P * P, np.int32)
    cell_of_rank[:union] = np.sort(
        rng.choice(P * P, union, replace=False)).astype(np.int32)
    occ2 = np.zeros(P * P, np.uint8)
    occ2[:union] = rng.integers(1, 4, union).astype(np.uint8)
    cor_d = jnp.asarray(cell_of_rank)
    occ_d = jnp.asarray(occ2)

    @jax.jit
    def mask_scatter_rep(cor, occ):
        def body(i, acc):
            m = jnp.zeros((P * P + 1,), jnp.uint8)
            m = m.at[cor + (acc & 1)].set(occ, unique_indices=True,
                                          indices_are_sorted=True)
            return acc + m[0].astype(jnp.int32)
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    t = corr(f'mask scatter 65536-idx u8 x{REPS} (sorted unique, in-jit)',
             lambda: np.asarray(mask_scatter_rep(cor_d, occ_d)))
    print(f'  -> per-rep ~{t / REPS * 1e3:7.2f} ms', flush=True)

    # And the same scatter WITHOUT the sortedness hints, for reference.
    @jax.jit
    def mask_scatter_rep_nohint(cor, occ):
        def body(i, acc):
            m = jnp.zeros((P * P + 1,), jnp.uint8)
            m = m.at[cor + (acc & 1)].set(occ)
            return acc + m[0].astype(jnp.int32)
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    t = corr(f'mask scatter no-hints x{REPS} (in-jit)',
             lambda: np.asarray(mask_scatter_rep_nohint(cor_d, occ_d)))
    print(f'  -> per-rep ~{t / REPS * 1e3:7.2f} ms', flush=True)


if __name__ == '__main__':
    main()
