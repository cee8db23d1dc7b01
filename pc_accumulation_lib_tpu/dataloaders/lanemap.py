"""NuScenes GT lane centerlines (datasets/nuscenes_lanemap.py:9-43
counterpart). Devkit map-expansion gated."""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def crop_centerline_poses(pose_list: List[np.ndarray],
                          bbox: Tuple[float, float, float, float]):
    """Crop lane polylines to a global-coordinate bbox (reference :9-24).

    NOTE: the reference's crop assigns to a loop variable and therefore
    returns the INPUT list unchanged — a latent bug. Here the crop is
    applied for real.
    """
    out = []
    for poses in pose_list:
        mask = (poses[:, 0] > bbox[0]) & (poses[:, 0] < bbox[2])
        poses = poses[mask]
        mask = (poses[:, 1] > bbox[1]) & (poses[:, 1] < bbox[3])
        out.append(poses[mask])
    return out


def get_centerlines(dataroot: str, map_name: str,
                    bbox: Optional[tuple] = None,
                    resolution_meters: float = 1.) -> List[np.ndarray]:
    """Discretized lane centerlines in map coordinates (reference
    :27-43)."""
    from nuscenes.map_expansion.map_api import NuScenesMap
    nusc_map = NuScenesMap(dataroot=dataroot, map_name=map_name)
    poses = nusc_map.discretize_centerlines(resolution_meters)
    poses = [np.asarray(p) for p in poses]
    if bbox is not None:
        poses = crop_centerline_poses(poses, bbox)
    return poses
