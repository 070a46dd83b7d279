"""Hash-based gradient (Perlin-style) noise with analytic derivatives.

Replaces the reference's HLSL noise library (the Perlin/fBm include used by
``tracescreen.hlsl``; BASELINE.json:5 "procedural Perlin/fBm noise terrain
volumes"). TPU-first deviations from classic Perlin:

* **No permutation table.** Table lookups are gathers, which are slow on the
  TPU VPU. Lattice gradients come from an arithmetic integer hash
  (murmur3-style finalizer) — pure int32 mul/xor/shift, fully vectorized.
* **int32 everywhere.** Mosaic (the Pallas TPU compiler) has no
  uint32→float32 cast, so all hash arithmetic runs in int32 — bitwise
  identical to uint32 for mul/xor/add (two's-complement wraparound) — with
  ``lax.shift_right_logical`` standing in for uint32 ``>>``.
* **Analytic derivatives.** The value and its spatial derivative are computed
  together in closed form (one pass), so surface normals and the implicit
  march gradient need no extra finite-difference field evaluations
  (the reference estimates normals with extra field taps; we get them free).
* **Everything is differentiable w.r.t. the continuous inputs** (point
  coordinates and fBm amplitudes); lattice hashing is integer-only and
  correctly contributes zero gradient.

All functions broadcast over leading dimensions: inputs of shape (...,) give
outputs of shape (...,).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# murmur3-inspired mixing constants (public-domain finalizer constants),
# reinterpreted as int32 literals (same bit patterns as the uint32 values).
_C1 = np.int32(np.uint32(0x85EBCA6B).view(np.int32))
_C2 = np.int32(np.uint32(0xC2B2AE35).view(np.int32))
_KX = np.int32(np.uint32(0x8DA6B343).view(np.int32))
_KZ = np.int32(np.uint32(0xD8163841).view(np.int32))
_KY = np.int32(np.uint32(0xCB1AB31F).view(np.int32))

_lsr = jax.lax.shift_right_logical


def _mix(h: jax.Array) -> jax.Array:
    """Finalize an int32 hash (murmur3 fmix32, logical shifts)."""
    h = h ^ _lsr(h, 16)
    h = h * _C1
    h = h ^ _lsr(h, 13)
    h = h * _C2
    h = h ^ _lsr(h, 16)
    return h


def hash2(ix: jax.Array, iz: jax.Array, seed: jax.Array) -> jax.Array:
    """int32 hash of a 2D integer lattice coordinate (+ seed)."""
    h = ix.astype(jnp.int32) * _KX + iz.astype(jnp.int32) * _KZ
    return _mix(h + seed.astype(jnp.int32) * _KY)


def _grad2(h: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Unit-ish 2D gradient from an int32 hash — arithmetic only, no tables.

    Low/high 16 bits become two uniforms in [-1, 1); the vector is normalized
    with rsqrt (eps-guarded so a zero vector cannot produce NaN).
    """
    gx = (h & 0xFFFF).astype(jnp.float32) * (1.0 / 32768.0) - 1.0
    gz = _lsr(h, 16).astype(jnp.float32) * (1.0 / 32768.0) - 1.0
    inv = jax.lax.rsqrt(gx * gx + gz * gz + 1e-12)
    return gx * inv, gz * inv


def _fade(f: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Quintic fade u(f) = 6f^5 - 15f^4 + 10f^3 and its derivative."""
    u = f * f * f * (f * (f * 6.0 - 15.0) + 10.0)
    du = 30.0 * f * f * (f * (f - 2.0) + 1.0)
    return u, du


def noise2(x: jax.Array, z: jax.Array, seed) -> tuple[jax.Array, jax.Array, jax.Array]:
    """2D gradient noise: returns (value, d/dx, d/dz), all analytic.

    Value range is roughly [-1, 1]. The derivative is exact (verified against
    finite differences in tests/test_noise.py).
    """
    seed = jnp.asarray(seed)
    x0 = jnp.floor(x)
    z0 = jnp.floor(z)
    fx = x - x0
    fz = z - z0
    ix = x0.astype(jnp.int32)
    iz = z0.astype(jnp.int32)

    h00 = hash2(ix, iz, seed)
    h10 = hash2(ix + 1, iz, seed)
    h01 = hash2(ix, iz + 1, seed)
    h11 = hash2(ix + 1, iz + 1, seed)

    g00x, g00z = _grad2(h00)
    g10x, g10z = _grad2(h10)
    g01x, g01z = _grad2(h01)
    g11x, g11z = _grad2(h11)

    # Corner dot products g · (p - corner).
    n00 = g00x * fx + g00z * fz
    n10 = g10x * (fx - 1.0) + g10z * fz
    n01 = g01x * fx + g01z * (fz - 1.0)
    n11 = g11x * (fx - 1.0) + g11z * (fz - 1.0)

    u, du = _fade(fx)
    v, dv = _fade(fz)

    k1 = n10 - n00
    k2 = n01 - n00
    k3 = n00 - n10 - n01 + n11
    value = n00 + u * k1 + v * k2 + u * v * k3

    # d(corner dot)/dx is just the corner gradient's x component; chain rule
    # through the bilinear blend plus the fade-weight term.
    gx_blend = (
        g00x
        + u * (g10x - g00x)
        + v * (g01x - g00x)
        + u * v * (g00x - g10x - g01x + g11x)
    )
    gz_blend = (
        g00z
        + u * (g10z - g00z)
        + v * (g01z - g00z)
        + u * v * (g00z - g10z - g01z + g11z)
    )
    d_dx = gx_blend + du * (k1 + k3 * v)
    d_dz = gz_blend + dv * (k2 + k3 * u)
    return value, d_dx, d_dz


def fbm2(
    x: jax.Array,
    z: jax.Array,
    amplitudes: jax.Array,
    lacunarity,
    seed,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """fBm octave sum with per-octave learnable amplitudes (BASELINE.json:9).

    value(p) = sum_i amp[i] * noise2(p * lacunarity**i, seed + i)

    The octave count is static (``amplitudes.shape[0]``) so the loop unrolls
    under jit/Pallas. Returns (value, d/dx, d/dz); derivatives scale with
    each octave's frequency. Differentiable w.r.t. x, z and ``amplitudes``.
    """
    num_octaves = amplitudes.shape[0]
    lac = jnp.asarray(lacunarity, jnp.float32)
    value = jnp.zeros_like(jnp.asarray(x, jnp.float32))
    d_dx = jnp.zeros_like(value)
    d_dz = jnp.zeros_like(value)
    freq = jnp.float32(1.0)
    for i in range(num_octaves):
        n, nx, nz = noise2(x * freq, z * freq, jnp.asarray(seed) + i)
        amp = amplitudes[i]
        value = value + amp * n
        d_dx = d_dx + amp * freq * nx
        d_dz = d_dz + amp * freq * nz
        freq = freq * lac
    return value, d_dx, d_dz
