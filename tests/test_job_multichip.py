"""Job-level multi-chip proof (SURVEY.md section 2.3 DP plan): the FULL
scene-sharded BEV dataset job runs through the runner on the 8-CPU mesh —
integrate -> mesh point-sharded sparse raster -> sparse fetch/decode ->
pkl.gz write -> manifest mark — then a simulated crash mid-job and a
resume that completes exactly the pending units, byte-identical to an
uninterrupted run. Replaces the reference's manual per-process scene
sharding (run_nuscenes_bev_gen.py:44-45,165) with a proven job story.
"""
import glob
import os

import numpy as np
import pytest

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.dataloaders.synthetic import write_kitti360_layout
from pc_accumulation_lib_tpu.parallel import mesh as mesh_mod
from pc_accumulation_lib_tpu.parallel.manifest import CompletionManifest
from pc_accumulation_lib_tpu.runners import kitti360_bev_gen
from pc_accumulation_lib_tpu.utils.io import read_compressed_pickle

SEQS = ('2013_05_28_drive_0000_sync', '2013_05_28_drive_0002_sync',
        '2013_05_28_drive_0003_sync')
N_FRAMES = 12
ACCUM_CFG = cfg.AccumConfig(max_points_per_frame=8192, max_frames=32)
ICP_CFG = cfg.ICPConfig(max_downsampled=1024, num_iters=12)
SAMPLING = cfg.SamplingConfig(bev_horizon_dist=6.0,
                              bev_dist_between_samples=2.0,
                              bevs_per_sample=2)


@pytest.fixture(scope='module')
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('kitti360_job'))
    for i, seq in enumerate(SEQS):
        write_kitti360_layout(root, seq=seq, n_frames=N_FRAMES, step=2.0,
                              lidar_range=20.0, seed=3 + i)
    return root


def _bev_params(mesh=None):
    p = {'type': 'sem', 'view_size': 30, 'pixel_size': 64,
         'max_trans_radius': 2.0, 'zoom_thresh': 0.05, 'do_warp': True,
         'int_scaler': 20., 'int_sep_scaler': 20., 'int_mid_threshold': 0.5,
         'height_filter': None}
    if mesh is not None:
        # The multi-chip configuration under proof: point-sharded raster
        # with the packed sparse transfer encoding.
        p.update(mesh=mesh, fetch_dtype='sparse', sparse_cap=64 * 64)
    return p


def _job(root, out_dir, mesh=None, manifest_path=None, on_bev=None,
         shard_idx=0, num_shards=1):
    # subdir_size=4 forces subdirNNN rollover, so the resumed numbering
    # is proven across subdir boundaries, not just within one.
    return kitti360_bev_gen.run_sharded(
        root, semseg_model=None, use_gt_sem=True, sequences=list(SEQS),
        start_idxs=[0] * 3, end_idxs=[N_FRAMES] * 3,
        accum_horizon_dist=16.0, bev_params=_bev_params(mesh),
        sampling=SAMPLING,
        output=cfg.OutputConfig(output_dir=out_dir, subdir_size=4,
                                viz_to_disk=False, async_io=False),
        accum_cfg=ACCUM_CFG, icp_cfg=ICP_CFG, seed=0,
        manifest_path=manifest_path, shard_idx=shard_idx,
        num_shards=num_shards, on_bev=on_bev)


def _files(out_dir):
    return sorted(
        os.path.relpath(p, out_dir)
        for p in glob.glob(os.path.join(out_dir, '**', 'bev_*.pkl.gz'),
                           recursive=True))


class _CrashAfter(Exception):
    pass


@pytest.fixture(scope='module')
def runs(dataset, tmp_path_factory):
    """One single-device run and one uninterrupted mesh run (both with a
    manifest), shared by the tests below."""
    tmp = tmp_path_factory.mktemp('job_runs')
    single_dir = str(tmp / 'single')
    stats_single = _job(dataset, single_dir,
                        manifest_path=str(tmp / 'single_manifest.jsonl'))
    mesh = mesh_mod.make_mesh((1, 8))
    mesh_dir = str(tmp / 'mesh')
    mesh_manifest = str(tmp / 'mesh_manifest.jsonl')
    stats_mesh = _job(dataset, mesh_dir, mesh=mesh,
                      manifest_path=mesh_manifest)
    return dict(dataset=dataset, single_dir=single_dir,
                stats_single=stats_single, mesh=mesh, mesh_dir=mesh_dir,
                mesh_manifest=mesh_manifest, stats_mesh=stats_mesh)


def test_job_mesh_matches_single_device(runs):
    """The whole mesh job's outputs pin to the single-device job's within
    the sparse-encoding quantization tolerances (exact occupancy and
    elevation; u8 channels one quantization step on f32 summation-order
    boundaries — same bounds as tests/test_sharding.py:189)."""
    a_files = _files(runs['single_dir'])
    b_files = _files(runs['mesh_dir'])
    assert runs['stats_single']['bevs'] >= 6
    assert runs['stats_single']['bevs'] == runs['stats_mesh']['bevs']
    assert a_files == b_files and len(a_files) == runs['stats_mesh']['bevs']
    # Multiple units processed and recorded.
    man = CompletionManifest(runs['mesh_manifest'])
    assert all(man.is_done(s) for s in SEQS)
    per_unit = [int(man.get(s)['bevs']) for s in SEQS]
    assert sum(per_unit) == runs['stats_mesh']['bevs']
    assert sorted(runs['stats_mesh']['units']) == sorted(SEQS)
    # Subdir rollover actually exercised (subdir_size=4 < total bevs).
    assert len({f.split(os.sep)[0] for f in a_files}) >= 2

    for rel in a_files:
        a = read_compressed_pickle(os.path.join(runs['single_dir'], rel))
        b = read_compressed_pickle(os.path.join(runs['mesh_dir'], rel))
        assert set(a) == set(b)
        for k in a:
            if k.startswith('trajs'):
                for ta, tb in zip(a[k], b[k]):
                    np.testing.assert_array_equal(ta, tb, err_msg=(rel, k))
                continue
            av = np.asarray(a[k], np.float32)
            bv = np.asarray(b[k], np.float32)
            if k.startswith('elevation'):
                np.testing.assert_array_equal(av, bv, err_msg=(rel, k))
            else:
                tol = 2e-2 if k.startswith('intensity') else 1.5 / 255
                np.testing.assert_allclose(bv, av, atol=tol,
                                           err_msg=(rel, k))


def test_job_crash_and_resume_byte_identical(runs, tmp_path):
    """Crash the mesh job mid-unit (after the first sample of the second
    sequence is on disk), then resume from the manifest: the resumed run
    must process exactly the pending units and the final output tree must
    be BYTE-identical to the uninterrupted mesh run (gzip mtime=0 makes
    files pure functions of their payload)."""
    man_b = CompletionManifest(runs['mesh_manifest'])
    unit0_bevs = int(man_b.get(SEQS[0])['bevs'])
    crash_at = unit0_bevs + 1

    crash_dir = str(tmp_path / 'crash')
    manifest_path = str(tmp_path / 'crash_manifest.jsonl')
    seen = [0]

    def on_bev(bev, path):
        seen[0] += 1
        if seen[0] == crash_at:
            raise _CrashAfter(path)

    with pytest.raises(_CrashAfter):
        _job(runs['dataset'], crash_dir, mesh=runs['mesh'],
             manifest_path=manifest_path, on_bev=on_bev)

    # Mid-job state: first unit recorded done, second unit partially on
    # disk but NOT recorded.
    man = CompletionManifest(manifest_path)
    assert man.is_done(SEQS[0])
    assert not man.is_done(SEQS[1]) and not man.is_done(SEQS[2])
    assert len(_files(crash_dir)) == crash_at

    stats = _job(runs['dataset'], crash_dir, mesh=runs['mesh'],
                 manifest_path=manifest_path)
    # Exactly the pending units ran, numbering resumed where unit 0 ended.
    assert stats['units'] == [SEQS[1], SEQS[2]]
    assert stats['resumed_at'] == unit0_bevs
    assert stats['bevs'] == runs['stats_mesh']['bevs'] - unit0_bevs

    assert _files(crash_dir) == _files(runs['mesh_dir'])
    for rel in _files(crash_dir):
        with open(os.path.join(crash_dir, rel), 'rb') as f:
            got = f.read()
        with open(os.path.join(runs['mesh_dir'], rel), 'rb') as f:
            want = f.read()
        assert got == want, f'{rel}: resumed bytes differ'


def test_nuscenes_runner_job_with_mesh_and_manifest(tmp_path):
    """The NuScenes runner's full job path — devkit scene walk (injected
    test double), oracle-pose accumulation, mesh sparse rasters, pkl.gz
    with per-sample metadata (reference run_nuscenes_bev_gen.py:288-292),
    manifest completion — runs end-to-end; a rerun against the same
    manifest is an exact no-op."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from fake_nusc import FakeNuScenes
    from pc_accumulation_lib_tpu.models.semseg import SemSegTPU
    from pc_accumulation_lib_tpu.runners import nuscenes_bev_gen

    root = str(tmp_path / 'nusc')
    nusc = FakeNuScenes(root, n_keyframes=6, sweeps_between=1, step=4.0,
                        seed=1)
    out_dir = str(tmp_path / 'bevs')
    manifest_path = str(tmp_path / 'manifest.jsonl')
    kw = dict(
        semseg_model=SemSegTPU(seed=0, stage_sizes=(1, 1, 1, 1)),
        use_oracle_pose=True, end_scene_idx=1,
        bev_params={'type': 'sem', 'view_size': 40, 'pixel_size': 64,
                    'max_trans_radius': 0., 'zoom_thresh': 0.,
                    'do_warp': False, 'int_scaler': 1.,
                    'int_sep_scaler': 30., 'int_mid_threshold': 0.12,
                    'height_filter': None,
                    'mesh': mesh_mod.make_mesh((1, 8)),
                    'fetch_dtype': 'sparse', 'sparse_cap': 64 * 64},
        sampling=cfg.SamplingConfig(bev_horizon_dist=4.0,
                                    bev_dist_between_samples=1.0,
                                    bevs_per_sample=1),
        output=cfg.OutputConfig(output_dir=out_dir, viz_to_disk=False,
                                async_io=False),
        accum_cfg=cfg.AccumConfig(max_points_per_frame=16384,
                                  max_frames=32,
                                  max_painted_points_per_frame=16384,
                                  max_instances=64),
        manifest_path=manifest_path, seed=0, nusc=nusc)
    stats = nuscenes_bev_gen.run(root, **kw)
    assert stats['bevs'] >= 1 and stats['units'] == ['0']
    files = _files(out_dir)
    assert len(files) == stats['bevs']
    bev = read_compressed_pickle(os.path.join(out_dir, files[0]))
    assert bev['scene_idx'] == 0
    assert bev['map'] == 'fake-location'
    assert isinstance(bev['ego_global_x'], float)
    assert np.asarray(bev['road_full']).shape == (64, 64)

    # Rerun: the completed scene is skipped, nothing is rewritten.
    stats2 = nuscenes_bev_gen.run(root, **kw)
    assert stats2 == {'bevs': 0, 'units': [],
                      'resumed_at': stats['bevs']}


def test_unit_stays_pending_if_overflow_drain_raises(runs, tmp_path,
                                                     monkeypatch):
    """The runner must drain the tile raster's deferred overflow checks
    BEFORE mark_done: a raised TileRouteOverflow leaves the unit pending
    so a resume re-runs it instead of shipping silently-corrupt BEVs."""
    from pc_accumulation_lib_tpu.bev.sem_bev import SemBEVGenerator
    from pc_accumulation_lib_tpu.parallel.sharded import TileRouteOverflow

    orig_close = SemBEVGenerator.close

    def close_detects_overflow(self):
        orig_close(self)
        raise TileRouteOverflow('simulated deferred-counter overflow')

    monkeypatch.setattr(SemBEVGenerator, 'close', close_detects_overflow)
    out = str(tmp_path / 'overflow')
    manifest_path = str(tmp_path / 'overflow_manifest.jsonl')
    with pytest.raises(TileRouteOverflow):
        _job(runs['dataset'], out, mesh=runs['mesh'],
             manifest_path=manifest_path)
    man = CompletionManifest(manifest_path)
    assert not any(man.is_done(s) for s in SEQS)


def test_nuscenes_skipped_scene_reprocessed_after_filter_change(tmp_path):
    """A scene excluded by one run's do_scene_idxs/skip_attr filters is
    recorded for observability but stays PENDING: a later run without the
    filter must process it (a completion mark would exclude it forever)."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from fake_nusc import FakeNuScenes
    from pc_accumulation_lib_tpu.models.semseg import SemSegTPU
    from pc_accumulation_lib_tpu.runners import nuscenes_bev_gen

    root = str(tmp_path / 'nusc')
    nusc = FakeNuScenes(root, n_keyframes=6, sweeps_between=1, step=4.0,
                        seed=1)
    manifest_path = str(tmp_path / 'manifest.jsonl')
    kw = dict(
        semseg_model=SemSegTPU(seed=0, stage_sizes=(1, 1, 1, 1)),
        use_oracle_pose=True, end_scene_idx=1,
        bev_params={'type': 'sem', 'view_size': 40, 'pixel_size': 64,
                    'max_trans_radius': 0., 'zoom_thresh': 0.,
                    'do_warp': False, 'int_scaler': 1.,
                    'int_sep_scaler': 30., 'int_mid_threshold': 0.12,
                    'height_filter': None},
        sampling=cfg.SamplingConfig(bev_horizon_dist=4.0,
                                    bev_dist_between_samples=1.0,
                                    bevs_per_sample=1),
        output=cfg.OutputConfig(output_dir=str(tmp_path / 'bevs'),
                                viz_to_disk=False, async_io=False),
        accum_cfg=cfg.AccumConfig(max_points_per_frame=16384,
                                  max_frames=32,
                                  max_painted_points_per_frame=16384,
                                  max_instances=64),
        manifest_path=manifest_path, seed=0, nusc=nusc)
    stats = nuscenes_bev_gen.run(root, do_scene_idxs=[999], **kw)
    assert stats['bevs'] == 0
    man = CompletionManifest(manifest_path)
    assert man.get('0')['skipped'] == 'idx_list'
    assert not man.is_done('0')

    stats2 = nuscenes_bev_gen.run(root, **kw)
    assert stats2['bevs'] >= 1 and stats2['units'] == ['0']
    assert CompletionManifest(manifest_path).is_done('0')


def test_job_two_shards_partition_the_units(runs, tmp_path):
    """num_shards=2 splits the unit list; the two shards' outputs land in
    disjoint shardNN/ subtrees, cover every unit exactly once, and each
    unit's per-shard sample count matches the single-shard manifest."""
    out = str(tmp_path / 'sharded')
    manifest_path = str(tmp_path / 'shard_manifest.jsonl')
    s0 = _job(runs['dataset'], out, manifest_path=manifest_path,
              shard_idx=0, num_shards=2)
    s1 = _job(runs['dataset'], out, manifest_path=manifest_path,
              shard_idx=1, num_shards=2)
    assert s0['units'] == [SEQS[0], SEQS[2]]
    assert s1['units'] == [SEQS[1]]
    assert s0['bevs'] + s1['bevs'] == runs['stats_single']['bevs']
    man_ref = CompletionManifest(runs['mesh_manifest'])
    man = CompletionManifest(manifest_path)
    for s in SEQS:
        assert int(man.get(s)['bevs']) == int(man_ref.get(s)['bevs'])
    f0 = _files(os.path.join(out, 'shard00'))
    f1 = _files(os.path.join(out, 'shard01'))
    assert len(f0) == s0['bevs'] and len(f1) == s1['bevs']
    # A unit's outputs are identical no matter which shard ran it: shard 0
    # leads with unit 0, whose samples match the single-device run's.
    unit0_bevs = int(man.get(SEQS[0])['bevs'])
    singles = _files(runs['single_dir'])
    for rel_s, rel_a in zip(f0[:unit0_bevs], singles[:unit0_bevs]):
        a = read_compressed_pickle(os.path.join(out, 'shard00', rel_s))
        b = read_compressed_pickle(
            os.path.join(runs['single_dir'], rel_a))
        for k in a:
            if k.startswith('trajs'):
                continue
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]),
                                          err_msg=(rel_s, k))
