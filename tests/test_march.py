"""March unit tests against analytic fields (flat terrain = plane) with
closed-form hit distances (SURVEY.md §5), plus implicit-VJP correctness."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gpgpuraytrace_tpu.models.scene import NoiseParams, RenderConfig
from gpgpuraytrace_tpu.ops.march import march, march_from_saved, march_with_stats


def _flat_noise(height=0.0):
    """Zero-amplitude noise → terrain is the plane y = height_offset."""
    return NoiseParams(
        amplitudes=jnp.zeros(1, jnp.float32),
        lacunarity=jnp.float32(2.0),
        height_scale=jnp.float32(1.0),
        height_offset=jnp.float32(height),
        horizontal_scale=jnp.float32(0.1),
    )


CFG = RenderConfig(height=8, width=8, max_steps=96, t_max=100.0, use_pallas=False)


def test_plane_hit_distance_exact():
    # Ray from (0, 5, 0) pointing down at 45°: plane y=0 hit at t = 5*sqrt(2).
    d = jnp.asarray([[0.0, -1.0, 1.0]]) / np.sqrt(2.0)
    o = jnp.asarray([[0.0, 5.0, 0.0]])
    t, hit = march(CFG, o, d, _flat_noise())
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 5.0 * np.sqrt(2.0), rtol=1e-3)


def test_miss_upward_ray():
    d = jnp.asarray([[0.0, 1.0, 0.1]])
    d = d / jnp.linalg.norm(d)
    o = jnp.asarray([[0.0, 5.0, 0.0]])
    t, hit = march(CFG, o, d, _flat_noise())
    assert not bool(hit[0])
    np.testing.assert_allclose(float(t[0]), CFG.t_max, rtol=1e-5)


def test_march_batched_shapes():
    o = jnp.broadcast_to(jnp.asarray([0.0, 5.0, 0.0]), (4, 6, 3))
    dirs = jnp.broadcast_to(
        jnp.asarray([0.0, -1.0, 0.3]) / np.linalg.norm([0.0, -1.0, 0.3]), (4, 6, 3)
    )
    t, hit = march(CFG, o, dirs, _flat_noise())
    assert t.shape == (4, 6) and hit.shape == (4, 6)
    assert np.asarray(hit).all()


def test_march_with_stats_step_counts():
    o = jnp.asarray([[0.0, 5.0, 0.0]])
    d = jnp.asarray([[0.0, -1.0, 0.0]])
    t, hit, steps = march_with_stats(CFG, o, d, _flat_noise())
    assert bool(hit[0])
    assert 0 < int(steps[0]) <= CFG.max_steps


def test_implicit_grad_plane_height_offset():
    """Plane at y = h0: t(h0) = sqrt(2)·(o_y - h0) ⇒ dt/dh0 = -sqrt(2)
    (raising the terrain brings the hit closer)."""
    o = jnp.asarray([[0.0, 5.0, 0.0]])
    d = jnp.asarray([[0.0, -1.0, 1.0]]) / np.sqrt(2.0)

    def t_of_h(h0):
        noise = _flat_noise(h0)
        t, _ = march(CFG, o, d, noise)
        return t[0]

    g = jax.grad(t_of_h)(jnp.float32(0.0))
    np.testing.assert_allclose(float(g), -np.sqrt(2.0), rtol=1e-3)


def test_implicit_grad_origin_height():
    """dt/do_y = -1/d_y = sqrt(2) for the 45° down ray on plane y=0."""
    d = jnp.asarray([[0.0, -1.0, 1.0]]) / np.sqrt(2.0)

    def t_of_oy(oy):
        o = jnp.stack([jnp.zeros(()), oy, jnp.zeros(())])[None]
        t, _ = march(CFG, o, d, _flat_noise())
        return t[0]

    g = jax.grad(t_of_oy)(jnp.float32(5.0))
    np.testing.assert_allclose(float(g), np.sqrt(2.0), rtol=1e-3)


def test_miss_pixels_have_zero_grad():
    d = jnp.asarray([[0.0, 1.0, 0.0]])  # straight up, never hits
    o = jnp.asarray([[0.0, 5.0, 0.0]])

    def t_of_h(h0):
        t, _ = march(CFG, o, d, _flat_noise(h0))
        return t[0]

    g = jax.grad(t_of_h)(jnp.float32(0.0))
    assert float(g) == 0.0


def test_march_from_saved_matches_march_grads():
    o = jnp.asarray([[0.0, 5.0, 0.0]])
    d = jnp.asarray([[0.0, -1.0, 1.0]]) / np.sqrt(2.0)
    noise = _flat_noise()
    t_saved, hit_saved = march(CFG, o, d, noise)

    def via_march(h0):
        t, _ = march(CFG, o, d, dataclasses.replace(noise, height_offset=h0))
        return t[0]

    def via_saved(h0):
        t, _ = march_from_saved(
            CFG, o, d, dataclasses.replace(noise, height_offset=h0), t_saved, hit_saved
        )
        return t[0]

    g1 = jax.grad(via_march)(jnp.float32(0.0))
    g2 = jax.grad(via_saved)(jnp.float32(0.0))
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-4)
