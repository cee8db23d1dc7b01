"""Exercise the multi-host bring-up path (parallel/mesh.py):
jax.distributed.initialize really runs (single-process coordinator in a
subprocess so this test process's backend stays untouched), collectives
work afterwards, and the unconfigured call is a no-op."""
import os
import socket
import subprocess
import sys
import textwrap

from pc_accumulation_lib_tpu.parallel.mesh import initialize_multihost

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_unconfigured_is_noop():
    initialize_multihost(None)   # must not raise or init anything


def test_single_process_coordinator_bringup():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    code = textwrap.dedent(f"""
        import jax
        jax.config.update('jax_platforms', 'cpu')
        from pc_accumulation_lib_tpu.parallel.mesh import (
            initialize_multihost, make_mesh)
        initialize_multihost('localhost:{port}', num_processes=1,
                             process_id=0)
        assert jax.process_count() == 1, jax.process_count()
        import numpy as np
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        mesh = make_mesh((1,), ('data',))
        out = jax.jit(jax.shard_map(
            lambda x: jax.lax.psum(x, 'data'), mesh=mesh,
            in_specs=P('data'), out_specs=P()))(jnp.arange(4.))
        assert np.allclose(np.asarray(out), np.arange(4.)), out
        print('MULTIHOST_OK')
    """)
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    r = subprocess.run([sys.executable, '-c', code], capture_output=True,
                       text=True, timeout=300, cwd=_REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'MULTIHOST_OK' in r.stdout
