"""Test harness: run all tests on a virtual 8-device CPU mesh.

The environment's sitecustomize force-registers the axon TPU platform and
sets jax_platforms='axon,cpu' AFTER env vars are read, so plain
JAX_PLATFORMS=cpu does not stick — override via jax.config before any
backend is initialized (SURVEY.md section 4: multi-chip tests without a
pod).
"""
import os

_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.join(os.path.dirname(__file__), '..',
                                   '.jax_cache'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert jax.default_backend() == 'cpu', jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
