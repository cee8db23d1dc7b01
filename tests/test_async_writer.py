"""Native async gzip writer: output must round-trip through the standard
reader (utils/io.read_compressed_pickle) identically to the sync path."""
import numpy as np
import pytest

from pc_accumulation_lib_tpu.utils.async_writer import AsyncPickleWriter
from pc_accumulation_lib_tpu.utils.io import (read_compressed_pickle,
                                              write_compressed_pickle)


@pytest.fixture(scope='module')
def payloads(tmp_path_factory):
    rng = np.random.default_rng(0)
    return [{'road_present': rng.normal(size=(64, 64)).astype(np.float16),
             'trajs_present': [rng.normal(size=(5, 3))],
             'idx': i} for i in range(8)]


@pytest.mark.parametrize('force_python', [False, True])
def test_async_writer_roundtrip(payloads, tmp_path, force_python):
    writer = AsyncPickleWriter(n_threads=3, force_python=force_python)
    for i, obj in enumerate(payloads):
        writer.write(obj, f'bev_{i:03d}.pkl', str(tmp_path))
    writer.wait()
    assert writer.pending() == 0
    for i, obj in enumerate(payloads):
        got = read_compressed_pickle(str(tmp_path / f'bev_{i:03d}.pkl.gz'))
        np.testing.assert_array_equal(got['road_present'],
                                      obj['road_present'])
        assert got['idx'] == i


def test_native_backend_builds():
    writer = AsyncPickleWriter(n_threads=1)
    # The C++ toolchain is part of the environment; the native path must
    # actually build here.
    assert writer.native


def test_matches_sync_writer(tmp_path):
    obj = {'a': np.arange(10), 'b': 'x'}
    write_compressed_pickle(obj, 'sync.pkl', str(tmp_path))
    w = AsyncPickleWriter(n_threads=1)
    w.write(obj, 'async.pkl', str(tmp_path))
    w.wait()
    a = read_compressed_pickle(str(tmp_path / 'sync.pkl.gz'))
    b = read_compressed_pickle(str(tmp_path / 'async.pkl.gz'))
    np.testing.assert_array_equal(a['a'], b['a'])
    assert a['b'] == b['b']
