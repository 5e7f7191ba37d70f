"""Device-mesh and sharding utilities — the TPU-native replacement for a
distributed backend (net-new; the reference has no parallelism at all,
SURVEY.md §2.2: single GPU via ``CUDA_VISIBLE_DEVICES``).

Strategy for this model family: pure data parallelism over the ICI ring —
batch-sharded inputs, replicated parameters; XLA inserts the gradient
all-reduce over ICI from sharding propagation (no hand-written collectives).
A ``model`` axis exists (size 1 by default) so tensor-parallel sharding can be
added later without breaking the mesh API. Multi-host scale-out composes with
``jax.distributed.initialize`` — each host feeds its own file shard
(``data.pipeline`` + ``batch_sharding``), and the same ``jit`` program spans
slices over DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data_parallel: int = -1,
    model_parallel: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2D ``(data, model)`` mesh over the available devices.

    ``data_parallel=-1`` uses all devices on the data axis.
    ``mesh_utils.create_device_mesh`` lays devices out so the data axis rides
    the ICI torus (nearest-neighbor all-reduce), not DCN.
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if data_parallel == -1:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} != {n} devices")
    arr = mesh_utils.create_device_mesh(
        (data_parallel, model_parallel), devices=devs)
    return Mesh(arr, axis_names=(data_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(data_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, optimizer state, scalars)."""
    return NamedSharding(mesh, P())
