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
# Persistent compilation cache: test graphs are identical run-over-run, so
# cached XLA compiles cut suite wall time substantially on the 1-CPU box.
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_COMPILE_CACHE',
                                 os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '.jax_cache')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
