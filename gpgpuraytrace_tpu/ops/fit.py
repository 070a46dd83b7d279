"""Differentiable fitting: recover scene parameters from a target image by
pixel-gradient descent (BASELINE.json:9, driver config 3).

The "training step" of this framework: loss = mean squared pixel error,
gradients flow through shading and through the march via the
implicit-function VJP (ops/march.py), parameters updated with optax.

Scenes mix float leaves (differentiable) with integer leaves (the lattice
seed), so the optimizer works on a *partition*: trainable float leaves are
extracted into a flat list (its own pytree), gradients/updates apply to that
list, and the full scene is re-assembled each step.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from gpgpuraytrace_tpu.models.scene import RenderConfig, Scene
from gpgpuraytrace_tpu.ops.render import render

DEFAULT_TRAINABLE = ("noise.amplitudes", "camera.")


def default_trainable(name: str) -> bool:
    return name.startswith(DEFAULT_TRAINABLE)


def partition_scene(
    scene: Scene, trainable: Callable[[str], bool] = default_trainable
):
    """Split a scene into (trainable_leaves, merge_fn).

    ``trainable_leaves`` is a list of float arrays (a valid pytree for optax
    and jax.grad); ``merge_fn(leaves) -> Scene`` re-assembles the full scene
    with frozen leaves (including integer ones) closed over as constants.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(scene)
    is_train = []
    for path, leaf in flat:
        name = ".".join(str(getattr(p, "name", p)) for p in path)
        is_float = jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
        is_train.append(bool(is_float and trainable(name)))
    train_leaves = [leaf for (_, leaf), t in zip(flat, is_train) if t]
    frozen_leaves = [leaf for (_, leaf), t in zip(flat, is_train) if not t]

    def merge(train):
        train_it = iter(train)
        frozen_it = iter(frozen_leaves)
        leaves = [next(train_it) if t else next(frozen_it) for t in is_train]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    return train_leaves, merge


def pixel_loss(scene: Scene, cfg: RenderConfig, target: jax.Array) -> jax.Array:
    """Mean squared error over linear-RGB pixels."""
    img = render(scene, cfg)
    diff = img - target
    return jnp.mean(diff * diff)


def make_fit_step(cfg: RenderConfig, merge, tx: optax.GradientTransformation):
    """jit-compiled step over the trainable-leaf list."""

    @jax.jit
    def step(train_leaves, opt_state: Any, target: jax.Array):
        def loss_fn(leaves):
            return pixel_loss(merge(leaves), cfg, target)

        loss, grads = jax.value_and_grad(loss_fn)(train_leaves)
        updates, opt_state = tx.update(grads, opt_state, train_leaves)
        train_leaves = optax.apply_updates(train_leaves, updates)
        return train_leaves, opt_state, loss

    return step


def fit(
    scene: Scene,
    cfg: RenderConfig,
    target: jax.Array,
    steps: int = 200,
    learning_rate: float = 2e-2,
    trainable: Callable[[str], bool] | None = None,
    log_every: int = 20,
    log_fn=print,
    save_path: str = "",
    save_every: int = 25,
    resume: bool = False,
) -> tuple[Scene, list[float]]:
    """Gradient-descend scene params toward a target image.

    ``trainable`` filters dotted leaf names (default: fBm amplitudes and the
    camera pose — the BASELINE.json:9 recovery set).

    Checkpoint/resume (SURVEY.md §6): with ``save_path``, the trainable
    leaves + optimizer state + step counter are checkpointed every
    ``save_every`` steps (and at the end); ``resume=True`` restores from an
    existing checkpoint and continues the exact optimization trajectory
    (the restored state is bitwise the saved one — kill-and-resume equals an
    uninterrupted run, asserted in tests/test_fit.py).
    """
    from gpgpuraytrace_tpu.utils.checkpoint import load_fit_state, save_fit_state

    train_leaves, merge = partition_scene(scene, trainable or default_trainable)
    tx = optax.adam(learning_rate)
    opt_state = tx.init(train_leaves)
    start, losses = 0, []
    if resume and save_path and os.path.exists(save_path):
        train_leaves, opt_state, start, losses = load_fit_state(
            save_path, train_leaves, opt_state
        )
        log_fn(f"fit: resumed from {save_path} at step {start}")
    step = make_fit_step(cfg, merge, tx)

    for i in range(start, steps):
        train_leaves, opt_state, loss = step(train_leaves, opt_state, target)
        losses.append(float(loss))
        if log_every and (i % log_every == 0 or i == steps - 1):
            log_fn(f"fit step {i:4d}  loss {losses[-1]:.6e}")
        if save_path and (
            (save_every and (i + 1) % save_every == 0) or i == steps - 1
        ):
            save_fit_state(save_path, train_leaves, opt_state, i + 1, losses)
    return merge(train_leaves), losses


def perturb_scene(scene: Scene, key: jax.Array, rel: float = 0.25) -> Scene:
    """Perturb the fit-recoverable params (for fit demos/tests): scales the
    fBm amplitudes and nudges the camera pose."""
    k1, k2, k3 = jax.random.split(key, 3)
    noise = dataclasses.replace(
        scene.noise,
        amplitudes=scene.noise.amplitudes
        * (
            1.0
            + rel
            * jax.random.uniform(
                k1, scene.noise.amplitudes.shape, minval=-1, maxval=1
            )
        ),
    )
    camera = dataclasses.replace(
        scene.camera,
        yaw=scene.camera.yaw + rel * 0.2 * jax.random.normal(k2, ()),
        pitch=scene.camera.pitch + rel * 0.1 * jax.random.normal(k3, ()),
    )
    return dataclasses.replace(scene, noise=noise, camera=camera)
