"""Checkpoint / resume for the fit loop (SURVEY.md §6): scene + optimizer
state saved as flat .npz pytrees. The reference has no persistence at all;
this is a new-framework capability so long optimizations are resumable.

Uses numpy .npz with dotted-path keys (orbax is available in the image but a
flat npz is dependency-light, deterministic, and diff-able; the format holds
every float/int leaf of an arbitrary pytree).
"""

from __future__ import annotations

import os
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


def _assemble(data, keys: list[str], like: Any) -> Any:
    """Rebuild a pytree from npz entries ``keys`` using ``like`` for
    structure; leaf order/dtypes must match, shapes are validated."""
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


def load_pytree(path: str, like: Any) -> Any:
    """Load a pytree saved by ``save_pytree``, using ``like`` for structure.

    Leaf order and dtypes must match; shapes are validated.
    """
    data = np.load(path)
    keys = sorted(data.files, key=lambda k: int(k.split("|", 1)[0]))
    return _assemble(data, keys, like)


def save_fit_state(
    path: str, train_leaves: Any, opt_state: Any, step: int, losses: list
) -> None:
    """Checkpoint one fit-loop state: trainable leaves + optimizer state +
    step counter + loss history (SURVEY.md §6 "fit-loop params checkpointed
    so runs are resumable"). The write is atomic (tmp file + rename) so a
    kill mid-save never leaves a corrupt checkpoint."""
    named, _ = _flatten_with_names((train_leaves, opt_state))
    arrays = {f"s{k}": v for k, v in named}
    arrays["meta_step"] = np.asarray(step, np.int64)
    arrays["meta_losses"] = np.asarray(losses, np.float64)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_fit_state(
    path: str, like_leaves: Any, like_opt_state: Any
) -> tuple[Any, Any, int, list]:
    """Restore (train_leaves, opt_state, step, losses) from save_fit_state.

    ``like_*`` provide structure (from partition_scene / tx.init on the same
    scene/optimizer config as the original run); restored values are bitwise
    the saved float32 leaves, so a resumed run continues the optimization
    trajectory exactly (asserted in tests/test_fit.py)."""
    data = np.load(path)
    keys = sorted(
        (k for k in data.files if k.startswith("s")),
        key=lambda k: int(k[1:].split("|", 1)[0]),
    )
    train_leaves, opt_state = _assemble(data, keys, (like_leaves, like_opt_state))
    step = int(data["meta_step"])
    losses = [float(x) for x in data["meta_losses"]]
    return train_leaves, opt_state, step, losses
