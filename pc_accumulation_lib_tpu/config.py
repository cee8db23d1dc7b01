"""Configuration dataclasses for the TPU-native point-cloud accumulation
framework.

One typed config layer feeds both the CLI entry points and the library API,
replacing the per-script argparse blocks of the reference
(run_kitti360_bev_gen.py:25-72, run_nuscenes_bev_gen.py:35-99).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

# Cityscapes-style 19-class trainId vocabulary used by the semseg model
# (reference: run_kitti360_bev_gen.py:78-97).
SEMANTIC_NAMES: Tuple[str, ...] = (
    'road', 'sidewalk', 'building', 'wall', 'fence', 'pole', 'traffic_light',
    'traffic_sign', 'vegetation', 'terrain', 'sky', 'person', 'rider', 'car',
    'truck', 'bus', 'train', 'motorcycle', 'bicycle')

# Default semantic exclusion filters: sky, person, rider, train, bicycle
# (+255 ignore label on the GT path). Reference: run_kitti360_bev_gen.py:98.
DEFAULT_SEMSEG_FILTERS: Tuple[int, ...] = (10, 11, 12, 16, 18, 255)

# Semantic-name -> class-idx map used by the BEV channel definitions
# (reference: run_kitti360_bev_gen.py:99).
DEFAULT_SEM_IDXS: Dict[str, int] = {
    'road': 0, 'car': 13, 'truck': 14, 'bus': 15, 'motorcycle': 17,
}

# Classes whose static remnants feed the "dynamic" BEV probability channel
# (reference: bev_generator/sem_bev.py:55).
DYN_OBJ_CLASSES: Tuple[str, ...] = ('car', 'truck', 'bus', 'motorcycle')

# Point-row feature layout: every painted point is a fixed 10-vector
# [x, y, z, intensity, r, g, b, sem, inst, dyn]
# (reference row layout: nuscenes_oracle_sem_pc_accum.py:435-501 and
# kitti360_sem_pc_accum.py:151-156).
PT_X, PT_Y, PT_Z, PT_I = 0, 1, 2, 3
PT_R, PT_G, PT_B = 4, 5, 6
PT_SEM, PT_INST, PT_DYN = 7, 8, 9
PT_DIM = 10


@dataclasses.dataclass(frozen=True)
class BEVConfig:
    """BEV generation parameters.

    Mirrors the reference ``bev_params`` dict (run_kitti360_bev_gen.py:128-139)
    plus the fixed-capacity knobs required by static-shape TPU compilation.
    """
    bev_type: str = 'sem'            # 'sem' | 'rgb'
    view_size: float = 80.0          # metric view frame edge [m]
    pixel_size: int = 256            # output raster edge [px]
    max_trans_radius: float = 0.0    # random-translation augmentation radius
    zoom_thresh: float = 0.0         # random zoom clip threshold
    do_warp: bool = False            # polynomial dense/sparse warping
    int_scaler: float = 20.0         # road-marking transform (KITTI defaults,
    int_sep_scaler: float = 20.0     #  NuScenes: 1 / 30 / 0.12 per
    int_mid_threshold: float = 0.5   #  sem_bev.py:596-604)
    height_filter: Optional[float] = None  # drop points above ego height
    rgb_fill: int = 0                # fill value for empty RGB cells

    @property
    def do_aug(self) -> bool:
        return self.max_trans_radius > 0.0 or self.zoom_thresh > 0.0


@dataclasses.dataclass(frozen=True)
class AccumConfig:
    """Accumulator state-machine parameters.

    ``horizon_dist`` bounds the travelled-path memory horizon
    (sem_pc_accum.py:96, :185-209). The ``max_*`` capacities size the
    fixed-shape device buffers (SURVEY.md section 7 decision 1): dynamic point
    counts become validity masks, never shape changes.
    """
    horizon_dist: float = 200.0
    icp_threshold: float = 1e3
    use_gt_sem: bool = False
    semseg_filters: Tuple[int, ...] = DEFAULT_SEMSEG_FILTERS
    sem_idxs: Dict[str, int] = dataclasses.field(
        default_factory=lambda: dict(DEFAULT_SEM_IDXS))
    # Fixed capacities for static shapes on device.
    max_points_per_frame: int = 131072   # >= KITTI velodyne ~120k pts/frame
    max_frames: int = 256                # > horizon_dist / min frame spacing
    max_instances: int = 4096            # tracked-object dyn lookup table
    # Painted points kept per frame after semantic filtering + camera-FOV
    # compaction (camera painting keeps only ~20-25% of a 360-degree
    # sweep); sizes the accumulation buffer the raster sweeps. None =
    # max_points_per_frame (safe for the GT-semantics path).
    max_painted_points_per_frame: Optional[int] = None
    # Live-window row capacity for the once-per-step buffer compaction on
    # the accum.step() fast path (accum/buffer.compact_window): every
    # per-sample raster then sweeps this many rows instead of
    # max_frames * painted_cap. Size it above the observed peak live-row
    # count (the overflow guard raises, points are never dropped
    # silently); None disables compaction.
    compact_cap: Optional[int] = None
    # Optional FIXED ladder of smaller compaction sizes below compact_cap
    # (ascending; compact_cap is appended implicitly). step() then sweeps
    # the smallest rung provably sufficient for the current live-row
    # count — raster cost is ~linear in swept rows (~13 ms per M on v5e),
    # and during the accumulation ramp most of a full-cap sweep is dead
    # padding. The choice is an upper BOUND, not a heuristic: live rows
    # grow by at most painted_cap per integrated frame, so
    # last-synced-live + frames-since-sync * painted_cap bounds the live
    # count without any host sync at dispatch (the bound is tightened one
    # step behind by the lazy n_live fetch). Outputs are bit-identical
    # across rungs (rows past n_live are masked to the sort sentinel).
    # Each rung is one extra compile (persistent-cached); call
    # accum.prewarm_rungs() during warmup so mid-run rung crossings don't
    # pay the ~0.4 s/shape executable load through a remote-TPU tunnel.
    compact_rungs: Optional[Tuple[int, ...]] = None

    @property
    def painted_cap(self) -> int:
        return self.max_painted_points_per_frame or self.max_points_per_frame


@dataclasses.dataclass(frozen=True)
class ICPConfig:
    """JAX point-to-plane ICP parameters (replaces Open3D registration_icp,
    kitti360_sem_pc_accum.py:123-126)."""
    max_corr_dist: float = 1e3       # correspondence rejection radius
    num_iters: int = 16              # fixed Gauss-Newton iterations
                                     # (first half untrimmed, then annealed
                                     # trim; see ops/icp.py)
    downsample_voxel: float = 0.25   # voxel size for grid downsample [m]
    max_downsampled: int = 8192      # fixed downsampled cloud capacity
    normal_neighbors: int = 10       # k-NN for covariance normals
    # Initialize each solve from the previous frame's transform
    # (constant-velocity prior) instead of the reference's identity init
    # (sem_pc_accum.py:88). Defaults ON together with coarse_to_fine:
    # measured on the 24-frame synthetic drift chain, identity init +
    # coarse voxels drifts 1.3-4.3% of path (voxel-centroid drag against
    # the motion), while warm start + coarse-to-fine + 0.25 m voxels holds
    # 0.1-0.25% (tests/test_icp.py::test_long_horizon_drift_bounded).
    # Set both False + downsample_voxel=0.5 for strict reference parity.
    warm_start: bool = True
    # Coarse-to-fine: seed the full solve from a strided-subcloud solve
    # (widens the convergence basin for large motion; ops/icp.py).
    coarse_to_fine: bool = True
    coarse_factor: int = 8


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """BEV sampling policy (the three distance conditions of
    run_kitti360_bev_gen.py:218-240)."""
    bev_horizon_dist: float = 80.0
    bev_dist_between_samples: float = 1.0
    bevs_per_sample: int = 1


@dataclasses.dataclass(frozen=True)
class OutputConfig:
    """Output sharding policy (run_kitti360_bev_gen.py:141-143, :253-273)."""
    output_dir: str = 'bevs'
    subdir_size: int = 1000
    viz_to_disk: bool = True
    async_io: bool = True   # native C++ gzip writer pool (utils/async_writer)


# KITTI-360 sequence table (run_kitti360_bev_gen.py:161-173).
KITTI360_SEQUENCES: Tuple[str, ...] = (
    '2013_05_28_drive_0000_sync',
    '2013_05_28_drive_0002_sync',
    '2013_05_28_drive_0003_sync',
    '2013_05_28_drive_0004_sync',
    '2013_05_28_drive_0005_sync',
    '2013_05_28_drive_0006_sync',
    '2013_05_28_drive_0007_sync',
    '2013_05_28_drive_0009_sync',
    '2013_05_28_drive_0010_sync',
)
KITTI360_START_IDXS: Tuple[int, ...] = (130, 4613, 40, 90, 50, 120, 0, 90, 0)
KITTI360_END_IDXS: Tuple[int, ...] = (
    11400, 18997, 770, 11530, 6660, 9698, 2960, 13945, 3540)
