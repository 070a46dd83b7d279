"""The procedural terrain field f(p, θ) — the scene geometry.

The reference's ``tracescreen.hlsl`` marches a density field built from
Perlin/fBm noise (BASELINE.json:5,8). Here the terrain is an fBm heightfield
h(x, z); the march field is the signed height-above-terrain

    f(p, θ) = p.y - h(p.x, p.z, θ)

which is a conservative distance bound once scaled by ``step_relax`` (a
heightfield is Lipschitz but not a true SDF). ``terrain_height`` returns the
analytic spatial gradient alongside the value, so surface normals and the
implicit march VJP cost no extra field evaluations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpgpuraytrace_tpu.models.scene import NoiseParams
from gpgpuraytrace_tpu.ops.noise import fbm2


def terrain_height(
    x: jax.Array, z: jax.Array, noise: NoiseParams
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Heightfield h(x, z) and its analytic derivatives (h, dh/dx, dh/dz)."""
    hs = noise.horizontal_scale
    n, nx, nz = fbm2(x * hs, z * hs, noise.amplitudes, noise.lacunarity, noise.seed)
    h = noise.height_offset + noise.height_scale * n
    dh_dx = noise.height_scale * hs * nx
    dh_dz = noise.height_scale * hs * nz
    return h, dh_dx, dh_dz


def field(p: jax.Array, noise: NoiseParams) -> jax.Array:
    """Signed height above terrain: f(p) = p.y - h(p.x, p.z). Shape (...,3)→(...)."""
    h, _, _ = terrain_height(p[..., 0], p[..., 2], noise)
    return p[..., 1] - h


def field_and_grad(
    p: jax.Array, noise: NoiseParams
) -> tuple[jax.Array, jax.Array]:
    """f(p) and its spatial gradient ∇p f = (-dh/dx, 1, -dh/dz), analytic."""
    h, dh_dx, dh_dz = terrain_height(p[..., 0], p[..., 2], noise)
    f = p[..., 1] - h
    grad = jnp.stack([-dh_dx, jnp.ones_like(h), -dh_dz], axis=-1)
    return f, grad


def surface_normal(p: jax.Array, noise: NoiseParams) -> jax.Array:
    """Unit surface normal from the analytic heightfield gradient.

    Replaces the reference's normals-from-gradient central differences
    (BASELINE.json:5 "normals-from-gradient") with the exact derivative —
    zero extra noise evaluations.
    """
    _, grad = field_and_grad(p, noise)
    return grad * jax.lax.rsqrt(jnp.sum(grad * grad, axis=-1, keepdims=True))
