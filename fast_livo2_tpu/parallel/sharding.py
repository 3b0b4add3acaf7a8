"""Device-mesh sharding of the per-frame measurement fan-in.

The reference is single-process (SURVEY.md §2.3: two OpenMP loops, no
distributed backend). The TPU-native scaling story exploits the structure
of both filters: every heavy term is a *sum over measurements* —

    LIO:  H^T R^-1 H (6x6),  H^T R^-1 z (6,)   over N scan points
    VIO:  H^T H (7x7),       H^T z (7,)        over M patches x 64 pixels

so sharding the measurement axis over a mesh axis ("dp") makes each
device compute a partial 19-dim normal-equation contribution from its
point shard against a replicated map, with one psum (inserted by XLA from
the sharded-einsum contraction) per iteration riding ICI. Map scatter
updates commute (adds) or write identical values, so the replicated map
stays consistent.

This module provides the mesh/NamedSharding plumbing; the step functions
themselves are unchanged — XLA's SPMD partitioner derives the collectives
from the in_shardings (the scaling-book recipe: pick a mesh, annotate
shardings, let XLA insert collectives).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_points(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Sharding for (N, ...) measurement arrays: split the leading axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_sharded(tree, sharding: NamedSharding):
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def put_replicated(tree, mesh: Mesh):
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
