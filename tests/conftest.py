"""Test configuration: run every test on a virtual 8-device CPU mesh.

This is the JAX-native way to exercise multi-device sharding without TPU
hardware (SURVEY.md §4). XLA_FLAGS must be set before jax initializes; the
platform override goes through jax.config because the environment pins
JAX_PLATFORMS to the TPU plugin.
"""

import os
import sys

_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')
