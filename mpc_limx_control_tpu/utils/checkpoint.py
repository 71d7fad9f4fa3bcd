"""Checkpoint / resume of batched scenario state.

The reference has no checkpointing (SURVEY.md §5); for long batched
scaling runs this saves/restores any pytree of arrays (PlantState, KFState,
metrics accumulators) with orbax when available, falling back to a
single-file .npz.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def save(path, tree) -> None:
    """Save a pytree of arrays to `path` (directory for orbax, .npz file
    for the fallback)."""
    path = Path(path)
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.absolute(), tree, force=True)
        ckptr.wait_until_finished()
    except Exception:
        leaves, treedef = jax.tree.flatten(tree)
        np.savez(path.with_suffix(".npz"),
                 __treedef__=np.frombuffer(
                     repr(treedef).encode(), dtype=np.uint8),
                 **{f"leaf_{i}": np.asarray(x)
                    for i, x in enumerate(leaves)})


def restore(path, like):
    """Restore a pytree with the structure/dtypes of `like`."""
    path = Path(path)
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like)
        return ckptr.restore(path.absolute(), abstract)
    except Exception:
        data = np.load(path.with_suffix(".npz"))
        leaves_like, treedef = jax.tree.flatten(like)
        leaves = [data[f"leaf_{i}"] for i in range(len(leaves_like))]
        return jax.tree.unflatten(treedef, leaves)
