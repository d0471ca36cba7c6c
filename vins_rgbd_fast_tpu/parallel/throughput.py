"""Multi-chip scaling: batched-sequence throughput mode over a device mesh.

The reference's only multi-machine story is ROS topics between two nodelet
processes (``doc/RUNNING_PROCEDURE.md``, SURVEY §2.4/§5.8) — a latency
pipeline, not a scaling mechanism.  The TPU-native scaling axis is
*throughput*: N independent sensor streams (robots, bag replays, eval
sweeps) batched under ``vmap`` and sharded across chips with
``jax.sharding`` — XLA inserts the (trivially empty) collectives; ICI is
only exercised if a reduction (e.g. fleet-level statistics) is requested.

Everything in the backend is already shape-static and vmap-clean, so the
batched step is literally ``vmap(vio_step)`` + sharding annotations.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..backend import estimator as est


def make_mesh(n_devices: Optional[int] = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_shard(mesh: Mesh, tree, axis: str = "batch"):
    """Place a batched pytree with its leading axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree.map(put, tree)


def make_batched_step(cfg: est.EstimatorConfig, mesh: Mesh, axis: str = "batch"):
    """Returns a jitted batched VIO step: all leading-axis-sharded inputs,
    one ``vio_step`` per sequence, no cross-sequence communication."""
    spec = NamedSharding(mesh, P(axis))

    @partial(jax.jit, out_shardings=(spec, spec))
    def step(states, feats, imus, keys):
        return jax.vmap(
            lambda s, f, i, k: est.vio_step(cfg, s, f, i, k)
        )(states, feats, imus, keys)

    return step


def replicate_state(state, batch: int):
    """Tile a single-sequence EstimatorState into a batch."""
    return jax.tree.map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), state)
