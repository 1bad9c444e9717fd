"""Device-mesh utilities: data-parallel scaling over ICI.

The reference is single-device ('cuda:0' everywhere, SURVEY.md §2.8); device
parallelism here is a new capability expressed the TPU-native way: a 1-D
``jax.sharding.Mesh`` over all chips, batches sharded on the 'data' axis,
parameters replicated. Under ``jax.jit`` XLA inserts the gradient
all-reduces over ICI automatically — there is no NCCL-style backend to port.

The models are tiny (<5M params) so data parallelism is the only load-bearing
axis; TP/PP/SP are intentionally out of scope (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
