"""BEV visualization PNG export.

Reproduces the SemBEVGenerator.viz_bev panel layout (sem_bev.py:264-533):
rows = [road, dynamic | intensity, elevation | rgb, gt_lanes | camera rgbs],
columns = present/future/full, red ego/other trajectories with arrow heads.
"""
from __future__ import annotations

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def _plot_trajs(trajs, H, color='r'):
    for traj in trajs:
        traj = np.asarray(traj)
        if traj.shape[0] == 0:
            continue
        plt.plot(traj[:, 0], H - traj[:, 1], f'{color}-')
        if traj.shape[0] < 2:
            continue
        x = traj[-2, 0]
        y = H - traj[-2, 1]
        dx = traj[-1, 0] - x
        dy = H - traj[-1, 1] - y
        plt.arrow(x, y, dx, dy, head_width=4, color=color)


def viz_bev(bev, file_path, pixel_size, height_filter=None, rgbs=(),
            semsegs=()):
    H = pixel_size
    num_imgs = len(rgbs)
    num_cols = num_imgs if num_imgs > 3 else 3
    num_rows = 4 if num_imgs > 0 else 3

    def rgb_img(key):
        arr = np.transpose(np.asarray(bev[key], np.float32), (1, 2, 0))
        return (arr * 255).astype(int)

    if 'road_future' in bev:
        splits = ('present', 'future', 'full')
        fig_size = 6
        plt.figure(figsize=(fig_size * num_cols, fig_size * num_rows))
        elev_hi = height_filter if height_filter is not None else 3.0
        for idx, s in enumerate(splits):
            plt.subplot(num_rows, num_cols, 1 + idx)
            plt.imshow(np.asarray(bev[f'road_{s}'], np.float32), vmin=0,
                       vmax=1)
            _plot_trajs(bev[f'trajs_{s}'], H)
        for idx, s in enumerate(splits):
            plt.subplot(num_rows, num_cols, 4 + idx)
            plt.imshow(np.asarray(bev[f'dynamic_{s}'], np.float32), vmin=0,
                       vmax=1)
            _plot_trajs(bev[f'trajs_{s}'], H)
        for idx, s in enumerate(splits):
            plt.subplot(num_rows, num_cols, num_cols + 1 + idx)
            plt.imshow(np.asarray(bev[f'intensity_{s}'], np.float32),
                       vmin=0, vmax=1)
            _plot_trajs(bev[f'trajs_{s}'], H)
        for idx, s in enumerate(splits):
            plt.subplot(num_rows, num_cols, num_cols + 4 + idx)
            plt.imshow(np.asarray(bev[f'elevation_{s}'], np.float32),
                       vmin=-0.5, vmax=elev_hi)
            _plot_trajs(bev[f'trajs_{s}'], H)
        for idx, s in enumerate(splits):
            plt.subplot(num_rows, num_cols, 2 * num_cols + 1 + idx)
            plt.imshow(rgb_img(f'rgb_{s}'))
            _plot_trajs(bev[f'trajs_{s}'], H)
        if 'gt_lanes' in bev:
            plt.subplot(num_rows, num_cols, 2 * num_cols + 4 if num_cols > 3
                        else 2 * num_cols + 3)
            plt.imshow(np.asarray(bev['road_full'], np.float32), vmin=0,
                       vmax=1)
            for lane in bev['gt_lanes']:
                _plot_trajs([lane], H, color='k')
        for idx in range(num_imgs):
            plt.subplot(num_rows, num_cols, 3 * num_cols + idx + 1)
            plt.imshow(rgbs[idx])
            if idx < len(semsegs) and semsegs[idx] is not None:
                plt.imshow(np.asarray(semsegs[idx]) == 0, alpha=0.5, vmin=0,
                           vmax=1)
    else:
        plt.figure(figsize=(6, 6))
        plt.imshow(np.asarray(bev['road_present'], np.float32), vmin=0,
                   vmax=1)
        _plot_trajs(bev['trajs_present'], H)

    plt.tight_layout()
    plt.savefig(file_path)
    plt.clf()
    plt.close()
