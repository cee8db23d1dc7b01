"""GOLDEN parity: run the actual reference BEV generator (pure numpy, no
heavy deps) on identical inputs and compare full output dicts.

The reference tree is mounted read-only at /root/reference; these tests
import its bev_generator package as an oracle (skipped when absent). The
deterministic non-augmented path (do_warp=False, heading-aligned rotation)
must match our device pipeline within float16 tolerance.
"""
import os
import sys

import numpy as np
import pytest

REF_PATH = '/root/reference'
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_PATH, 'bev_generator')),
    reason='reference tree not mounted')

SEM_IDXS = {'road': 0, 'car': 13, 'truck': 14, 'bus': 15, 'motorcycle': 17}
VIEW, P = 40.0, 64


def _ref_generator():
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    from bev_generator.sem_bev import SemBEVGenerator as RefGen
    return RefGen(SEM_IDXS, VIEW, P, 0., 0., False, 20., 20., 0.5, None)


def _our_generator():
    from pc_accumulation_lib_tpu.bev.sem_bev import SemBEVGenerator
    return SemBEVGenerator(SEM_IDXS, VIEW, P, 0., 0., False, 20., 20., 0.5,
                           None, seed=0)


def make_inputs(rng, n_p=4000, n_f=3000, with_others=True):
    def cloud(n):
        pc = np.zeros((n, 10))
        pc[:, 0:2] = rng.uniform(-25, 25, size=(n, 2))
        pc[:, 2] = rng.uniform(-1.8, 3, size=n)
        pc[:, 3] = rng.uniform(0, 1, size=n)
        pc[:, 4:7] = rng.integers(0, 256, size=(n, 3))
        pc[:, 7] = rng.choice([0, 1, 2, 13, 14, 15, 17], size=n)
        pc[:, 8] = 0.0
        pc[:, 9] = rng.choice([0.0, 1.0], size=n, p=[0.85, 0.15])
        return pc
    pc_p, pc_f = cloud(n_p), cloud(n_f)
    pcs = {'pc_present': pc_p, 'pc_future': pc_f,
           'pc_full': np.concatenate([pc_p, pc_f])}
    ego_p = np.stack([np.linspace(-12, 0, 8), np.linspace(-3, 0, 8),
                      np.zeros(8)], 1)
    ego_f = np.stack([np.linspace(0, 14, 8), np.linspace(0, 4, 8),
                      np.zeros(8)], 1)
    others = [np.stack([np.linspace(-8, 30, 6), np.full(6, 3.0),
                        np.zeros(6)], 1)] if with_others else []
    trajs = {
        'ego_traj_present': ego_p, 'other_trajs_present': list(others),
        'ego_traj_future': ego_f, 'other_trajs_future': list(others),
        'ego_traj_full': np.concatenate([ego_p, ego_f]),
        'other_trajs_full': list(others),
    }
    return pcs, trajs


def _deepcopy_inputs(pcs, trajs):
    # The reference mutates inputs in place (bev_generator.py:224-231).
    c = lambda a: None if a is None else np.array(a, copy=True)  # noqa
    pcs2 = {k: c(v) for k, v in pcs.items()}
    trajs2 = {k: ([c(t) for t in v] if isinstance(v, list) else c(v))
              for k, v in trajs.items()}
    return pcs2, trajs2


@pytest.mark.parametrize('with_others', [False, True])
def test_full_bev_dict_matches_reference(rng, with_others):
    pcs, trajs = make_inputs(rng, with_others=with_others)
    ref_bev = _ref_generator().generate(*_deepcopy_inputs(pcs, trajs))
    our_bev = _our_generator().generate(*_deepcopy_inputs(pcs, trajs))

    assert set(ref_bev.keys()) == set(our_bev.keys())
    for k in ref_bev:
        if k.startswith('trajs'):
            assert len(ref_bev[k]) == len(our_bev[k]), k
            for rt, ot in zip(ref_bev[k], our_bev[k]):
                assert rt.shape == ot.shape, k
                np.testing.assert_allclose(ot, rt, atol=2e-3, err_msg=k)
            continue
        r = np.asarray(ref_bev[k], np.float32)
        o = np.asarray(our_bev[k], np.float32)
        assert r.shape == o.shape, k
        # float16 quantum + f32 summation-order on intensity sums; single
        # borderline points may shift one cell under f32-vs-f64 rotation.
        diff = np.abs(r - o)
        frac_bad = (diff > 5e-3).mean()
        assert frac_bad < 0.004, (k, frac_bad, diff.max())


def test_present_only_reference_is_broken_ours_works(rng):
    """The reference's present-only generate() path crashes with
    UnboundLocalError (bev_generator.py:111-123 only defines trajs_future
    inside the gen_future branch but always passes it) — a latent reference
    bug. Our path must work."""
    pcs, trajs = make_inputs(rng)
    pcs['pc_future'] = None
    pcs['pc_full'] = None
    with pytest.raises(UnboundLocalError):
        _ref_generator().generate(*_deepcopy_inputs(pcs, trajs))
    our_bev = _our_generator().generate(*_deepcopy_inputs(pcs, trajs))
    assert 'road_present' in our_bev and 'road_future' not in our_bev


def test_reference_warp_math_identical(rng):
    """cal_warp_params / warp_dense / warp_point bit-parity with the
    reference implementations on shared parameters."""
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    from bev_generator.bev_generator import BEVGenerator as RefBase

    from pc_accumulation_lib_tpu.ops import warp as our_warp
    i_warp, j_warp = 38.2, 22.7
    a1r, a2r = RefBase.cal_warp_params(i_warp, 32, 63)
    a1o, a2o = our_warp.cal_warp_params(i_warp, 32, 63)
    assert np.isclose(a1r, a1o) and np.isclose(a2r, a2o)

    maps = rng.uniform(size=(2, 64, 64))
    b1r, b2r = RefBase.cal_warp_params(j_warp, 32, 63)
    ref_out = RefBase.warp_dense_probmaps(maps.copy(), a1r, a2r, b1r, b2r)
    our_out = np.asarray(our_warp.warp_dense_maps(maps, a1o, a2o, b1r, b2r))
    np.testing.assert_allclose(our_out, ref_out, atol=1e-12)