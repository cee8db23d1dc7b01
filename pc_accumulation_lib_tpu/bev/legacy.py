"""Legacy functional BEV pipeline.

Counterpart of utils/bev_generation.py (reference :155-560) + its warp
math (utils/bev_data_aug.py) — the class-based generator's predecessor,
kept for feature parity (SURVEY.md L4'): it produces channels the class
pipeline does not — SIDEWALK probmap, MEAN elevation with lidar-height
fill, per-point sigmoid-transformed mean intensity, and a rescaled
p(dynamic) channel — under a past/future (not present/future/full) split
with fill=255 RGB medians and always-on warping.

Same functional API (gen_view / gen_aug_view / viz_bev), jnp compute.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from pc_accumulation_lib_tpu.ops import geometry as geo
from pc_accumulation_lib_tpu.ops import rasterize as ras
from pc_accumulation_lib_tpu.ops import warp as warp_ops

ROAD_SEM, SIDEWALK_SEM = 0, 1
DYNAMIC_SEMS = (13, 14, 15, 17)  # car, truck, bus, motorcycle
LIDAR_HEIGHT_FROM_GROUND = 1.7   # (reference :248)


def _mean_map(cells, mask, values, P, fill):
    """Per-cell mean with empty-cell fill (reference :250-276)."""
    s = ras.count_map(cells, mask, P, weights=values)
    c = ras.count_map(cells, mask, P)
    mean = s / (c + 1e-14)
    return jnp.where(c == 0, fill, mean)


def _prep(pc, rot_ang, dx, dy, aug_view, P):
    xyz = geo.geometric_transform(jnp.asarray(pc[:, :3], jnp.float32),
                                  rot_ang, dx, dy)
    m = geo.crop_view_mask(xyz, aug_view)
    grid = geo.pos2grid(xyz[:, :2], aug_view, P)
    cells = jnp.clip(geo.grid_cell_index(grid[:, 0], grid[:, 1], P), 0,
                     P * P - 1)
    return xyz, m, cells


def _gen_view_maps(pc_past, pc_future, rot_ang, dx, dy, aug_view, P,
                   a_1, a_2, b_1, b_2):
    """Device part: all 14 legacy channels, warped (reference :165-403)."""
    xyz_p, m_p, cells_p = _prep(pc_past, rot_ang, dx, dy, aug_view, P)
    xyz_f, m_f, cells_f = _prep(pc_future, rot_ang, dx, dy, aug_view, P)
    sem_p = jnp.asarray(pc_past[:, 7], jnp.float32)
    sem_f = jnp.asarray(pc_future[:, 7], jnp.float32)
    dyn_p = ras.sem_class_mask(sem_p, DYNAMIC_SEMS)
    dyn_f = ras.sem_class_mask(sem_f, DYNAMIC_SEMS)
    stat_p, stat_f = m_p & ~dyn_p, m_f & ~dyn_f
    road_p = ras.sem_class_mask(sem_p, [ROAD_SEM])
    road_f = ras.sem_class_mask(sem_f, [ROAD_SEM])
    sidew_p = ras.sem_class_mask(sem_p, [SIDEWALK_SEM])

    rgb_p = ras.rgb_median_maps(cells_p, stat_p,
                                jnp.asarray(pc_past[:, 4:7], jnp.float32),
                                P, fill_value=255) / 255.0
    rgb_f = ras.rgb_median_maps(cells_f, stat_f,
                                jnp.asarray(pc_future[:, 4:7], jnp.float32),
                                P, fill_value=255) / 255.0

    elev_p = _mean_map(cells_p, stat_p, xyz_p[:, 2], P,
                       -LIDAR_HEIGHT_FROM_GROUND)
    elev_dyn = _mean_map(cells_p, m_p & dyn_p, xyz_p[:, 2], P,
                         -LIDAR_HEIGHT_FROM_GROUND)

    # Per-point sigmoid intensity, mean over road cells, clipped
    # (reference :281-309).
    def int_map(cells, mask, inten):
        tr = 4.0 * jax.nn.sigmoid(20.0 * (inten - 0.5))
        m = _mean_map(cells, mask, tr, P, 0.0)
        return jnp.minimum(m, 1.0)

    int_p = int_map(cells_p, stat_p & road_p,
                    jnp.asarray(pc_past[:, 3], jnp.float32))
    int_f = int_map(cells_f, stat_f & road_f,
                    jnp.asarray(pc_future[:, 3], jnp.float32))

    pm_road_p = ras.sem_probmap(cells_p, stat_p, road_p, P)
    pm_side_p = ras.sem_probmap(cells_p, stat_p, sidew_p, P)
    pm_road_f = ras.sem_probmap(cells_f, stat_f, road_f, P)
    # Dynamic-vs-static probmap, rescaled to [0,1] (reference :341-359).
    c_dyn = ras.count_map(cells_p, m_p & dyn_p, P)
    c_stat = ras.count_map(cells_p, stat_p, P)
    pm_dyn = ras.dirichlet_probmap(c_dyn, c_stat)
    pm_dyn = (jnp.maximum(pm_dyn, 0.5) - 0.5) * 2.0
    # Suppress dynamic elevation where p(dyn) < 0.1 (reference :357-359).
    elev_dyn = jnp.where(pm_dyn < 0.1, -LIDAR_HEIGHT_FROM_GROUND, elev_dyn)

    maps = jnp.stack([
        pm_road_p, pm_side_p, pm_road_f, pm_dyn, elev_p, elev_dyn, int_p,
        int_f, rgb_p[0], rgb_p[1], rgb_p[2], rgb_f[0], rgb_f[1], rgb_f[2]
    ])
    return warp_ops.warp_dense_maps(maps, a_1, a_2, b_1, b_2).astype(
        jnp.float16)


_KEYS = ('gridmap_past_road', 'gridmap_past_sidewalk', 'gridmap_future_road',
         'gridmap_dynamic', 'elevmap_past_mean', 'elevmap_dynamic_mean',
         'intensitymap_past_mean', 'intensitymap_future_mean',
         'red_map_past', 'green_map_past', 'blue_map_past', 'red_map_future',
         'green_map_future', 'blue_map_future')

_jitted_gen_view_maps = jax.jit(_gen_view_maps,
                                static_argnames=('P',))


def gen_view(pc_past, pc_future, poses_past, poses_future, rot_ang,
             trans_dx, trans_dy, zoom_scalar, view_size, pixel_size,
             rng=None) -> Dict:
    """Legacy gen_view (reference :155-462): returns the 14-channel float16
    dict + warped pixel-space poses. Warping is always applied, with
    random parameters (reference :363-369)."""
    P = pixel_size
    aug_view = zoom_scalar * view_size
    rng = np.random.default_rng() if rng is None else rng
    i_mid = j_mid = int(P / 2)
    i_warp, j_warp = warp_ops.get_random_warp_params(0.15, 0.30, P, P,
                                                     rng=rng)
    a_1, a_2 = warp_ops.cal_warp_params(i_warp, i_mid, P - 1)
    b_1, b_2 = warp_ops.cal_warp_params(j_warp, j_mid, P - 1)

    maps = np.asarray(_jitted_gen_view_maps(
        jnp.asarray(pc_past, jnp.float32),
        jnp.asarray(pc_future, jnp.float32),
        jnp.float32(rot_ang), jnp.float32(trans_dx), jnp.float32(trans_dy),
        jnp.float32(aug_view), P, jnp.float32(a_1), jnp.float32(a_2),
        jnp.float32(b_1), jnp.float32(b_2)))
    bev = {k: maps[i] for i, k in enumerate(_KEYS)}

    # Poses: transform + crop + pixelize + sparse warp (host).
    from pc_accumulation_lib_tpu.ops import trajectory as traj_ops
    out_poses = []
    for poses in (poses_past, poses_future):
        t = np.asarray(poses, np.float64).reshape(-1, 3).copy()
        c, s = np.cos(rot_ang), np.sin(rot_ang)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        t[:, :3] = t[:, :3] @ rot.T
        t[:, 0] += trans_dx
        t[:, 1] += trans_dy
        # Legacy path crops poses like points — no edge interpolation
        # (reference :195-196 uses crop_view on poses).
        half = 0.5 * aug_view
        m = ((t[:, 0] > -half) & (t[:, 0] < half) & (t[:, 1] > -half)
             & (t[:, 1] < half))
        t = t[m]
        t = traj_ops.pos2grid_traj(t, aug_view, P)
        t = warp_ops.warp_sparse_points(t, a_1, a_2, j_mid, j_warp, P) \
            if t.shape[0] else t
        out_poses.append(t)
    bev['poses_past'], bev['poses_future'] = out_poses
    return bev


def gen_aug_view(inputs: Dict, rng=None) -> Dict:
    """Random-augmentation wrapper (reference :465-493)."""
    rng = np.random.default_rng() if rng is None else rng
    rot_ang = 2 * np.pi * rng.random()
    trans_r = inputs['max_translation_radius'] * rng.random()
    trans_ang = 2 * np.pi * rng.random()
    zoom = float(np.clip(rng.normal(0, 0.1), -inputs['zoom_threshold'],
                         inputs['zoom_threshold'])) + 1.0
    return gen_view(inputs['pc_present'], inputs['pc_future'],
                    inputs['poses_present'], inputs['poses_future'], rot_ang,
                    trans_r * np.cos(trans_ang), trans_r * np.sin(trans_ang),
                    zoom, inputs['view_size'], inputs['pixel_size'], rng=rng)


def viz_bev(bev: Dict, file_path: str):
    """Legacy 2x5 panel (reference :496-560)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    H = np.asarray(bev['gridmap_past_road']).shape[0]
    plt.figure(figsize=(32, 18))
    panels = [('gridmap_past_road', dict(vmin=0, vmax=1), 1),
              ('gridmap_past_sidewalk', dict(vmin=0, vmax=1), 2),
              ('intensitymap_past_mean', dict(vmin=0, vmax=1), 3),
              ('gridmap_dynamic', dict(vmin=0, vmax=1), 4),
              ('elevmap_past_mean', dict(vmin=-2, vmax=2), 5),
              ('gridmap_future_road', dict(vmin=0, vmax=1), 6),
              ('intensitymap_future_mean', dict(vmin=0, vmax=1), 8)]
    for key, kw, slot in panels:
        plt.subplot(2, 5, slot)
        plt.imshow(np.asarray(bev[key], np.float32), **kw)
        if slot == 1 and bev['poses_past'].shape[0]:
            plt.plot(bev['poses_past'][:, 0], H - bev['poses_past'][:, 1],
                     'k-')
        if slot == 6 and bev['poses_future'].shape[0]:
            plt.plot(bev['poses_future'][:, 0],
                     H - bev['poses_future'][:, 1], 'r-')
    for slot, pre in ((9, 'past'), (10, 'future')):
        plt.subplot(2, 5, slot)
        rgb = np.stack([np.asarray(bev[f'{c}_map_{pre}'], np.float32)
                        for c in ('red', 'green', 'blue')], axis=-1)
        plt.imshow((rgb * 255).astype(int))
    plt.tight_layout()
    plt.savefig(file_path)
    plt.clf()
    plt.close()
