"""Checkpoint / resume for the fit loop (SURVEY.md §6): scene + optimizer
state saved as flat .npz pytrees. The reference has no persistence at all;
this is a new-framework capability so long optimizations are resumable.

Uses numpy .npz with dotted-path keys (orbax is available in the image but a
flat npz is dependency-light, deterministic, and diff-able; the format holds
every float/int leaf of an arbitrary pytree).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def _flatten_with_names(tree: Any) -> tuple[list[tuple[str, np.ndarray]], Any]:
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    named = []
    for i, (path, leaf) in enumerate(flat):
        name = ".".join(str(getattr(p, "name", getattr(p, "idx", p))) for p in path)
        named.append((f"{i:04d}|{name}", np.asarray(leaf)))
    return named, treedef


def save_pytree(path: str, tree: Any) -> None:
    """Save any pytree of arrays to ``path`` (.npz)."""
    named, _ = _flatten_with_names(tree)
    np.savez(path, **dict(named))


def load_pytree(path: str, like: Any) -> Any:
    """Load a pytree saved by ``save_pytree``, using ``like`` for structure.

    Leaf order and dtypes must match; shapes are validated.
    """
    data = np.load(path)
    keys = sorted(data.files, key=lambda k: int(k.split("|", 1)[0]))
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    if len(keys) != len(leaves_like):
        raise ValueError(
            f"checkpoint has {len(keys)} leaves, expected {len(leaves_like)}"
        )
    leaves = []
    for key, ref in zip(keys, leaves_like):
        arr = data[key]
        ref = np.asarray(ref)
        if arr.shape != ref.shape:
            raise ValueError(
                f"leaf {key}: shape {arr.shape} != expected {ref.shape}"
            )
        leaves.append(jax.numpy.asarray(arr.astype(ref.dtype)))
    return jax.tree_util.tree_unflatten(treedef, leaves)
