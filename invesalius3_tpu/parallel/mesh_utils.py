"""Device mesh creation and sharding helpers.

The TPU-native replacement for the reference's multiprocessing pool
(reference surface.py:1360-1430 spawns one worker per 20-slice slab): a
1-or-2-axis ``jax.sharding.Mesh`` where volumes shard along Z over the
"z" axis (the structural analog of slab decomposition) and patch batches
shard along "data".
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("z",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Create a device mesh.  Default: all devices on one "z" axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def z_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a (Z, Y, X) volume along Z over the mesh's 'z' axis."""
    return NamedSharding(mesh, P("z", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_volume(volume: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a volume Z-sharded on the mesh (pads Z to a multiple of the
    mesh size if needed — callers track the original extent)."""
    n = mesh.shape["z"]
    z = volume.shape[0]
    if z % n:
        import jax.numpy as jnp

        volume = jnp.pad(volume, ((0, n - z % n), (0, 0), (0, 0)))
    return jax.device_put(volume, z_sharding(mesh))
