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
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..',
                               '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
assert jax.default_backend() == 'cpu', jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
