"""Viz panel smoke tests + static_obj_partitioning_by_elev parity vs a
per-point numpy oracle of the reference loop (sem_bev.py:556-591)."""
import numpy as np

from pc_accumulation_lib_tpu import config as cfg
from pc_accumulation_lib_tpu.bev.sem_bev import SemBEVGenerator


def _gen(P=32, **kw):
    return SemBEVGenerator(cfg.DEFAULT_SEM_IDXS, 80, P, int_scaler=20.,
                           int_sep_scaler=20., int_mid_threshold=0.5,
                           seed=0, **kw)


def _pixel_pc(rng, P, n=400):
    pc = np.zeros((n, 10))
    pc[:, 0] = rng.integers(0, P, n)      # i pixel
    pc[:, 1] = rng.integers(0, P, n)      # j pixel
    pc[:, 2] = rng.uniform(-1, 4, n)      # z
    return pc


def _oracle_partition(pc, P, elev_thresh):
    """Direct transcription of the reference's two per-point loops."""
    elevmap = np.zeros((P, P))
    obs = np.zeros((P, P), bool)
    for idx in range(pc.shape[0]):
        i, j, z = int(pc[idx, 0]), int(pc[idx, 1]), pc[idx, 2]
        j_rev = P - 1 - j
        if obs[j_rev][i]:
            if z < elevmap[j_rev][i]:
                elevmap[j_rev][i] = z
        else:
            elevmap[j_rev][i] = z
            obs[j_rev][i] = True
    out = pc.copy()
    for idx in range(pc.shape[0]):
        i, j, z = int(pc[idx, 0]), int(pc[idx, 1]), pc[idx, 2]
        j_rev = P - 1 - j
        if z > elevmap[j_rev][i] + elev_thresh:
            out[idx, 8] = 1
    return out[out[:, 8] == 0], out[out[:, 8] == 1], elevmap, obs


def test_static_obj_partitioning_matches_reference_loop(rng):
    P = 32
    gen = _gen(P)
    pc = _pixel_pc(rng, P)
    st_r, dy_r, em_r, ob_r = _oracle_partition(pc.copy(), P, 1.0)
    st, dy, em, ob = gen.static_obj_partitioning_by_elev(pc.copy(), 1.0)
    np.testing.assert_array_equal(ob, ob_r)
    np.testing.assert_allclose(em, em_r)
    np.testing.assert_allclose(st, st_r)
    np.testing.assert_allclose(dy, dy_r)
    assert dy.shape[0] > 0 and st.shape[0] > 0


def test_get_elevation_map_min_semantics(rng):
    P = 16
    gen = _gen(P)
    pc = np.zeros((3, 10))
    pc[:, 0] = 5
    pc[:, 1] = 7
    pc[:, 2] = [2.0, -1.0, 0.5]
    em, ob = gen.get_elevation_map(pc)
    assert em[P - 1 - 7, 5] == -1.0 and ob[P - 1 - 7, 5]
    assert ob.sum() == 1 and em[~ob].sum() == 0


def _full_bev(rng, gen):
    n = 2048
    pc = np.zeros((n, 10), np.float32)
    pc[:, 0:2] = rng.uniform(-30, 30, size=(n, 2))
    pc[:, 2] = rng.uniform(-2, 5, size=n)
    pc[:, 4:7] = rng.integers(0, 256, size=(n, 3))
    pc[:, 7] = rng.choice([0, 2, 13], size=n)
    pcs = {'pc_present': pc, 'pc_future': pc.copy()}
    trajs = {'ego_traj_present': np.array([[0., 0, 0], [2, 1, 0]]),
             'ego_traj_future': np.array([[2., 1, 0], [4, 2, 0]]),
             'ego_traj_full': np.array([[0., 0, 0], [4, 2, 0]])}
    return gen.generate(pcs, trajs)


def test_viz_panel_written_with_lanes_and_images(rng, tmp_path):
    gen = _gen(48)
    bev = _full_bev(rng, gen)
    bev['gt_lanes'] = [np.array([[3., 3, 0], [20, 20, 0], [40, 30, 0]])]
    imgs = [np.zeros((24, 48, 3), np.uint8) for _ in range(6)]
    sems = [np.zeros((24, 48), np.int32) for _ in range(6)]
    out = tmp_path / 'panel.png'
    gen.viz_bev(bev, str(out), rgbs=imgs, semsegs=sems)
    assert out.exists() and out.stat().st_size > 10_000


def test_viz_panel_present_only(rng, tmp_path):
    gen = _gen(32)
    pc = _pixel_pc(rng, 32)[:, :10].astype(np.float32)
    pc[:, 0:2] = rng.uniform(-30, 30, size=(pc.shape[0], 2))
    bev = gen.generate({'pc_present': pc},
                       {'ego_traj_present': np.array([[0., 0, 0]])})
    out = tmp_path / 'present.png'
    gen.viz_bev(bev, str(out))
    assert out.exists() and out.stat().st_size > 1_000
