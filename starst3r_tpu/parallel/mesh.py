"""Device mesh construction and sharding helpers.

The reference has no distribution at all (SURVEY §2c). Here the mesh is the
single first-class parallelism object: every distributed code path takes a
`jax.sharding.Mesh` with named axes and annotates shardings; XLA inserts the
collectives (psum / all_gather / reduce_scatter) over ICI.

Axes (see config.MeshConfig):
  data  — pair-parallel inference, camera minibatches, correspondence shards
  model — optional tensor parallelism of the ViT (not needed for parity)
  gauss — Gaussian shards in splat training
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ("make_mesh", "replicated", "shard_along", "local_mesh", "P",
           "NamedSharding")


def make_mesh(data: int = 0, model: int = 1,
              devices: Optional[Sequence] = None,
              data_axis: str = "data", model_axis: str = "model") -> Mesh:
    """Build a 2D (data, model) mesh. data=0 means "all remaining devices"."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data <= 0:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model <= n, (data, model, n)
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (data_axis, model_axis))


def local_mesh(axis: str = "data") -> Mesh:
    """1D mesh over all local devices."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_along(mesh: Mesh, axis_name: str, ndim: int = 1,
                dim: int = 0) -> NamedSharding:
    """NamedSharding that shards array dim ``dim`` along mesh axis
    ``axis_name`` and replicates everything else."""
    spec = [None] * ndim
    spec[dim] = axis_name
    return NamedSharding(mesh, P(*spec))
