"""Device mesh + batch sharding for pod-scale generation.

The reference scales by forking CPU ``DataLoader`` workers around a single
CUDA device (``test_dl.py:17-23``). The TPU-native equivalent (SURVEY §2):
generation is embarrassingly parallel per volume, so the batch axis is
``vmap``-ed and sharded across chips over ICI with ``jax.sharding`` — no
collectives inside the generator itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..generator.config import GeneratorCfg
from ..generator.pipeline import _synth_core


def data_mesh(devices=None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis,))


def make_sharded_generator(mesh: Mesh, cfg: GeneratorCfg, axis: str = "data"):
    """Build a jitted batch generator sharded over ``mesh``.

    Returns ``gen(keys, seeds, segs) -> (images, labels)`` where all inputs
    carry a leading batch axis sharded across ``axis``. Each chip generates
    its local shard independently (ICI traffic: none — the ideal layout for
    an input pipeline feeding a data-parallel trainer).
    """
    batch_sharding = NamedSharding(mesh, P(axis))

    def _batch(keys, seeds, segs):
        out, seg = jax.vmap(
            lambda k, sd, sg: _synth_core(
                k, sd, sg, jnp.zeros((), jnp.float32), (), cfg, (), False
            )[:2]
        )(keys, seeds, segs)
        return out, seg

    gen = jax.jit(
        _batch,
        in_shardings=(batch_sharding, batch_sharding, batch_sharding),
        out_shardings=(batch_sharding, batch_sharding),
    )
    return gen


def shard_batch(mesh: Mesh, arr, axis: str = "data"):
    """Place a host batch onto the mesh, sharded along its leading axis."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis)))
