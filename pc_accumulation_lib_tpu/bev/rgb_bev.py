"""RGB-only BEV generator.

Working counterpart of the reference RGBBEVGenerator (bev_generator/
rgb_bev.py:7-183), which is declared needs-refactoring and not instantiable
there (sem_pc_accum.py:121). Produces per-cell median RGB maps for
present/future splits plus pixel-space ego poses, with the same optional
polynomial warp.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from pc_accumulation_lib_tpu.bev.sem_bev import SemBEVGenerator

_RGB_KEYS = ('rgb_present', 'rgb_future', 'poses_present', 'poses_future')


class RGBBEVGenerator(SemBEVGenerator):
    """Reuses the fused semantic raster core and keeps only the RGB channel
    family in the output dict (rgb_bev.py:27-95 key set)."""

    def __init__(self, view_size: float, pixel_size: int,
                 max_trans_radius: float = 0., zoom_thresh: float = 0.,
                 do_warp: bool = False, int_scaler: float = 1.,
                 int_sep_scaler: float = 1., int_mid_threshold: float = 0.5,
                 rgb_fill: int = 0, seed: Optional[int] = None):
        # The raster core needs a sem_idxs map; RGB output ignores the
        # semantic channels.
        sem_idxs = {'road': 0, 'car': 13, 'truck': 14, 'bus': 15,
                    'motorcycle': 17}
        super().__init__(sem_idxs, view_size, pixel_size, max_trans_radius,
                         zoom_thresh, do_warp, int_scaler, int_sep_scaler,
                         int_mid_threshold, None, rgb_fill, seed)

    def _assemble(self, maps, trajs, rot_ang, dx, dy, aug_view, w,
                  gen_future) -> Dict:
        full = super()._assemble(maps, trajs, rot_ang, dx, dy, aug_view, w,
                                 gen_future)
        bev = {'rgb_present': full['rgb_present']}
        tp = full.get('trajs_present') or [np.zeros((0, 3))]
        bev['poses_present'] = tp[0]
        if gen_future:
            bev['rgb_future'] = full['rgb_future']
            tf = full.get('trajs_future') or [np.zeros((0, 3))]
            bev['poses_future'] = tf[0]
        return bev

    def viz_bev(self, bev, file_path, rgbs=None, semsegs=None):
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        H = self.pixel_size
        plt.figure(figsize=(12, 6))
        for i, (mkey, pkey, style) in enumerate(
            (('rgb_present', 'poses_present', 'b-'),
             ('rgb_future', 'poses_future', 'r-'))):
            if mkey not in bev:
                continue
            plt.subplot(1, 2, i + 1)
            img = np.transpose(np.asarray(bev[mkey], np.float32), (1, 2, 0))
            plt.imshow((img * 255).astype(int))
            poses = np.asarray(bev[pkey])
            if poses.shape[0]:
                plt.plot(poses[:, 0], H - poses[:, 1], style)
        plt.tight_layout()
        plt.savefig(file_path)
        plt.clf()
        plt.close()
