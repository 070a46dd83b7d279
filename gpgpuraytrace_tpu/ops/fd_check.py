"""Finite-difference gradient checker — the judged "pixel-grad allclose vs
finite-diff" harness (BASELINE.json:2, SURVEY.md §5 gradients level).

Compares autodiff pixel-loss gradients against central finite differences for
selected scalar parameters. Silhouette pixels (where a parameter nudge flips
hit↔miss) make the true derivative a delta function; the harness therefore
compares on a loss restricted to pixels whose hit mask is stable under ±eps
(the honest comparison — the discontinuity itself is measure-zero and
non-differentiable; SURVEY.md §8 hard-part 1).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from gpgpuraytrace_tpu.models.scene import RenderConfig, Scene
from gpgpuraytrace_tpu.ops.camera import generate_rays
from gpgpuraytrace_tpu.ops.march import march
from gpgpuraytrace_tpu.ops.shade import shade


def _stable_hit_mask(
    get_scene: Callable[[jax.Array], Scene],
    theta: jax.Array,
    eps: float,
    cfg: RenderConfig,
    t_cap: float = 0.1,
) -> jax.Array:
    """Pixels where the derivative exists and FD is trustworthy: the hit mask
    agrees at θ-eps, θ, θ+eps AND the hit distance moves smoothly (|Δt| under
    ``t_cap``; grazing rays can re-route around ridges chaotically, making
    both FD and the true derivative meaningless there)."""
    masks, ts = [], []
    for dt in (-eps, 0.0, eps):
        scene = get_scene(theta + dt)
        o, d = generate_rays(scene.camera, cfg.height, cfg.width)
        t, hit = march(cfg, o, d, scene.noise)
        masks.append(hit)
        ts.append(t)
    stable = (masks[0] == masks[1]) & (masks[1] == masks[2])
    smooth = (jnp.abs(ts[2] - ts[0]) < t_cap) & (jnp.abs(ts[1] - ts[0]) < t_cap)
    return stable & smooth


def fd_check_scalar(
    get_scene: Callable[[jax.Array], Scene],
    theta0,
    cfg: RenderConfig,
    target: jax.Array,
    eps: float = 1e-3,
    t_cap: float = 0.1,
) -> tuple[float, float]:
    """Returns (autodiff_grad, finite_diff_grad) of the masked pixel loss
    w.r.t. a scalar parameter theta (get_scene builds the scene from it).

    ``t_cap`` is the smoothness filter's |Δt| bound (see _stable_hit_mask).
    Measured (round 5): a handful of pixels can carry kinked sub-cap t
    jumps (Newton-bracket branch switches, step-floor max() crossovers) —
    real non-smoothnesses of the rendered function where AD follows one
    branch and central FD averages both. At the default 0.1 cap they set a
    scene-dependent ~5% noise floor on aggregate AD-vs-FD agreement;
    tightening the cap to ~10·eps drops agreement error to ~0.05% while
    keeping ≳95% of pixels."""
    theta0 = jnp.asarray(theta0, jnp.float32)
    stable = _stable_hit_mask(get_scene, theta0, eps, cfg, t_cap=t_cap)
    w = stable.astype(jnp.float32)[..., None]
    denom = jnp.sum(w) * 3.0

    def loss(theta):
        scene = get_scene(theta)
        o, d = generate_rays(scene.camera, cfg.height, cfg.width)
        t, hit = march(cfg, o, d, scene.noise)
        img = shade(o, d, t, hit, scene.noise, scene.materials)
        return jnp.sum(w * (img - target) ** 2) / denom

    ad = jax.grad(loss)(theta0)
    fd = (loss(theta0 + eps) - loss(theta0 - eps)) / (2.0 * eps)
    return float(ad), float(fd)
