"""Distribution helpers: multi-host init, pair-parallel inference sharding,
Gaussian-sharded splat training (SURVEY §2c; §7.2 layer 8).

The design follows the scaling-book recipe: pick a mesh, annotate shardings
with NamedSharding/device_put, and let XLA insert the collectives over ICI.
No custom transport — `jax.distributed.initialize` + compiled psum /
all_gather / reduce_scatter are the whole communication layer.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ("initialize_distributed", "pair_sharding", "shard_gs_state",
           "replicate")


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (SURVEY §5 comm-backend row). No-ops when args
    are absent and env vars aren't set (single-host)."""
    import os
    if coordinator is None and "JAX_COORDINATOR_ADDRESS" not in os.environ \
            and "COORDINATOR_ADDRESS" not in os.environ:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def pair_sharding(mesh: Mesh, axis: Optional[str] = None) -> NamedSharding:
    """Sharding for a (B, H, W, 3) pair batch: batch split along the data
    axis (pair-parallel inference, SURVEY §2c row 1)."""
    axis = axis or mesh.axis_names[0]
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_gs_state(state, mesh: Mesh, axis: Optional[str] = None):
    """Shard a GSState's Gaussians (dim 0 of every param leaf and the
    matching Adam moments) along a mesh axis; scalars replicate.

    train_step then runs under these shardings with XLA inserting the
    cross-device reductions for the loss/grad (tile gradients
    reduce-scattered by the compiler).
    """
    axis = axis or mesh.axis_names[0]
    gauss = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def place_param(x):
        return jax.device_put(x, gauss)

    params = {k: place_param(v) for k, v in state.params.items()}

    def place_opt(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] == next(iter(
                state.params.values())).shape[0]:
            return jax.device_put(x, gauss)
        return jax.device_put(x, repl)

    opt_state = jax.tree_util.tree_map(place_opt, state.opt_state)
    return state._replace(
        params=params, opt_state=opt_state,
        step=jax.device_put(state.step, repl),
        key=jax.device_put(state.key, repl),
        n_alive=jax.device_put(state.n_alive, repl))
