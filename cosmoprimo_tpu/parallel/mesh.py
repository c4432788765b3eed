"""Device-mesh and sharding helpers."""

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_names=('dp', 'tp'), shape=None):
    """Create a Mesh over ``devices`` (default: all available).

    If ``shape`` is None, the device count is factored to give the 'tp' axis
    the largest power of two <= sqrt(n) and 'dp' the rest, so both axes are
    exercised whenever more than one device is available.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        else:
            tp = 1
            while tp * 2 <= max(1, int(math.isqrt(n))) and n % (tp * 2) == 0:
                tp *= 2
            shape = (n // tp, tp) + (1,) * (len(axis_names) - 2)
    device_array = np.asarray(devices).reshape(shape)
    return Mesh(device_array, axis_names)


def batch_sharding(mesh, axis='dp', ndim=1):
    """NamedSharding placing axis 0 on ``axis`` and replicating the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_array(array, mesh, axis='dp'):
    """Shard ``array`` along its leading dimension over the mesh axis."""
    return jax.device_put(array, batch_sharding(mesh, axis=axis, ndim=np.ndim(array)))


def replicate(tree, mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
