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


# Tensor-parallel threshold: tensors with at least this many ELEMENTS get
# their last (output-features) dim sharded over the model axis. 1M elements
# = 4 MB f32 — catches the dense-head kernels (e.g. VGG16's flatten head,
# 100k x 4096 = 411M params; GAP head 4960-unit kernels) AND the widest
# darknet conv filters (3x3x1024x1024 = 9.4M elements, column-sharded on
# output channels), while leaving small conv filters, biases, and BN vectors
# replicated.
TP_MIN_ELEMENTS = 1 << 20


def state_sharding(mesh: Mesh, tree, model_axis: str = "model",
                   min_elements: int = TP_MIN_ELEMENTS):
    """Sharding pytree for a train state (or any param/opt pytree).

    Rule: rank>=2 tensors with >= ``min_elements`` elements are sharded on
    their LAST dim over the model axis (column-parallel dense: each shard
    computes its own output features; XLA inserts the all-gather where a
    consumer needs the full activation). Everything else is replicated.
    Adam/EMA moments mirror the param shapes, so they pick up identical
    shardings by the same rule. With ``model_parallel=1`` the spec degrades
    to fully-replicated, so this is safe as the universal default.

    SCAFFOLDING, not a perf feature for this model family: static HLO
    analysis of the flagship train step (tools/tp_comm_analysis.py,
    benchmarks/tp_comm_analysis.json) measures dp4xtp2 at +172 all-gathers /
    +40.5 MB (+12.7%) per-device collective payload per step vs pure dp8,
    while the 45M-param model fits a single chip trivially — run DP-only
    (model_parallel=1) unless the model outgrows per-chip HBM.
    """
    def rule(x):
        if (hasattr(x, "ndim") and x.ndim >= 2
                and x.size >= min_elements
                and x.shape[-1] % mesh.shape[model_axis] == 0):
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1) + [model_axis])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, tree)
