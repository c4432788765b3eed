"""Test configuration: run on a virtual 8-device CPU mesh.

The axon sitecustomize forces jax_platforms='axon,cpu' (TPU tunnel); tests
must run locally, so we override to CPU and expose 8 virtual devices for
sharding tests before any backend is initialized.
"""

import os
import sys

os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8'

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
