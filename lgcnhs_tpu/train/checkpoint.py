"""Sharded checkpoint / resume via orbax.

The reference checkpoints once, at the end of training, by pickling the whole
torch module (``model/LightGCN/train.py:184``) with no optimizer state and no
mid-train resume (SURVEY.md section 5.4). This module supplies the TPU-native
equivalent: orbax checkpoints of the params + optimizer-state pytree that
preserve each array's NamedSharding on restore, plus step metadata, so long
runs resume exactly (same step, same Adam moments, same LR schedule position).
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _manager(path: str):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(path),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_train_state(
    path: str, step: int, params: Any, opt_state: Any
) -> None:
    """Checkpoint the full training state (params + optimizer pytree)."""
    import orbax.checkpoint as ocp

    mgr = _manager(path)
    mgr.save(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(params),
            opt_state=ocp.args.StandardSave(opt_state),
        ),
    )
    mgr.wait_until_finished()
    mgr.close()


def restore_train_state(
    path: str,
    params_like: Any,
    opt_state_like: Any,
    step: Optional[int] = None,
) -> Optional[Tuple[int, Any, Any]]:
    """(step, params, opt_state) from the latest (or given) checkpoint, with
    arrays restored onto the shardings of the provided abstract/like trees.
    Returns None when no checkpoint exists."""
    import orbax.checkpoint as ocp

    if not os.path.isdir(path):
        return None
    mgr = _manager(path)
    try:
        target = step if step is not None else mgr.latest_step()
        if target is None:
            return None
        abstract = lambda tree: jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
            if hasattr(x, "shape")
            else x,
            tree,
        )
        restored = mgr.restore(
            target,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(abstract(params_like)),
                opt_state=ocp.args.StandardRestore(abstract(opt_state_like)),
            ),
        )
        return int(target), restored["params"], restored["opt_state"]
    finally:
        mgr.close()
