"""Device mesh bring-up.

The reference is single-process/single-device (hardcoded ``'cuda:1'`` at
``model/LightGCN/train.py:87``; no torch.distributed anywhere). This module is
the TPU-native replacement: a ``jax.sharding.Mesh`` with ``("data", "model")``
axes. Dense BPR math is data-parallel over "data"; embedding tables and the
item-item diffusion operator are row/block-sharded over "model"
(SURVEY.md section 2.9).

On CPU test rigs, fake an 8-device mesh with
``XLA_FLAGS=--xla_force_host_platform_device_count=8``.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def mesh_axes() -> Tuple[str, str]:
    return (DATA_AXIS, MODEL_AXIS)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host runtime bring-up (``jax.distributed.initialize``).

    On a real multi-host TPU slice the env (TPU metadata) supplies the
    arguments; explicit values support DCN clusters. Single-process callers
    get a no-op. Returns the global device count. The reference has no
    multi-host story at all (SURVEY.md section 2.9).
    """
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return len(jax.devices())


def make_mesh(
    mesh_shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh.

    With no arguments, uses all local devices on the model axis for a single
    host (table sharding is the binding constraint for this workload: the
    catalog axes U and I are what outgrow one chip, not the batch).
    """
    devs = list(devices if devices is not None else jax.devices())
    if mesh_shape is None:
        mesh_shape = (1, len(devs))
    n_needed = mesh_shape[0] * mesh_shape[1]
    if n_needed > len(devs):
        raise ValueError(
            f"mesh {mesh_shape} needs {n_needed} devices, have {len(devs)}"
        )
    grid = np.asarray(devs[:n_needed]).reshape(mesh_shape)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def mesh_from_config(compute) -> Optional[Mesh]:
    """The product mesh the flagship path trains/serves on, from
    ``ComputeConfig.mesh_shape``: ``(1, 1)`` (the default) means single
    device and returns None; ``(0, 0)`` means "auto" — all local devices on
    the model axis; anything else is used verbatim. This is what makes the
    reference's hardcoded single device (``model/LightGCN/train.py:87``) a
    config knob instead."""
    shape = tuple(compute.mesh_shape)
    if shape == (1, 1):
        return None
    if shape == (0, 0):
        shape = (1, len(jax.devices()))
        if shape[1] == 1:
            return None
    return make_mesh(shape)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh) -> NamedSharding:
    """Rows over the model axis: embedding tables (U, D) / (I, D), score
    matrices sharded by user rows."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def col_sharded(mesh: Mesh) -> NamedSharding:
    """Columns over the model axis: interaction matrix (U, I) sharded by item
    blocks, diffusion operator (I, I) by output-item blocks."""
    return NamedSharding(mesh, P(None, MODEL_AXIS))


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Leading dim over the data axis: minibatch index arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))
