"""Minimal PLY point-cloud export.

Offscreen replacement for the reference's interactive Open3D viewer
(sem_pc_accum.py:424-465): accumulated clouds are dumped as binary PLY for
external viewers.
"""
from __future__ import annotations

import numpy as np


def write_ply(path: str, xyz: np.ndarray, rgb=None):
    """Write (N,3) points (+ optional (N,3) uint8-range colours) as binary
    little-endian PLY."""
    n = xyz.shape[0]
    has_rgb = rgb is not None
    with open(path, 'wb') as f:
        header = ['ply', 'format binary_little_endian 1.0',
                  f'element vertex {n}',
                  'property float x', 'property float y',
                  'property float z']
        if has_rgb:
            header += ['property uchar red', 'property uchar green',
                       'property uchar blue']
        header.append('end_header')
        f.write(('\n'.join(header) + '\n').encode('ascii'))
        xyz = np.asarray(xyz, '<f4')
        if has_rgb:
            rgb = np.clip(np.asarray(rgb), 0, 255).astype(np.uint8)
            rec = np.zeros(n, dtype=[('x', '<f4'), ('y', '<f4'),
                                     ('z', '<f4'), ('r', 'u1'),
                                     ('g', 'u1'), ('b', 'u1')])
            rec['x'], rec['y'], rec['z'] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
            rec['r'], rec['g'], rec['b'] = rgb[:, 0], rgb[:, 1], rgb[:, 2]
            f.write(rec.tobytes())
        else:
            f.write(np.ascontiguousarray(xyz).tobytes())


def read_ply_header(path: str) -> dict:
    """Parse a PLY header (for tests)."""
    info = {'n': 0, 'props': []}
    with open(path, 'rb') as f:
        while True:
            line = f.readline().decode('ascii').strip()
            if line.startswith('element vertex'):
                info['n'] = int(line.split()[-1])
            elif line.startswith('property'):
                info['props'].append(line.split()[-1])
            elif line == 'end_header':
                break
    return info
