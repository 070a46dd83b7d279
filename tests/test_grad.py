"""The judged gradient metric: pixel-loss gradients vs central finite
differences (BASELINE.json:2 "pixel-grad allclose vs finite-diff"), via the
ops.fd_check harness, for noise amplitudes, camera pose, and material
constants (BASELINE.json:5)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from gpgpuraytrace_tpu.models.scene import RenderConfig, default_scene
from gpgpuraytrace_tpu.ops.fd_check import fd_check_scalar
from gpgpuraytrace_tpu.ops.render import render_jax

CFG = RenderConfig(height=48, width=64, max_steps=96, num_octaves=2, use_pallas=False)


@pytest.fixture(scope="module")
def setup():
    scene = default_scene(num_octaves=2)
    target = render_jax(
        dataclasses.replace(
            scene,
            noise=dataclasses.replace(
                scene.noise, amplitudes=scene.noise.amplitudes * 1.1
            ),
        ),
        CFG,
    )
    return scene, target


def _check(get_scene, theta0, target, eps=1e-3, rtol=5e-2):
    ad, fd = fd_check_scalar(get_scene, theta0, CFG, target, eps=eps)
    assert np.isfinite(ad) and np.isfinite(fd)
    assert abs(ad - fd) <= rtol * max(abs(fd), 1e-5), f"ad={ad} fd={fd}"
    return ad


def test_amplitude_gradient(setup):
    scene, target = setup

    def get_scene(theta):
        amps = scene.noise.amplitudes.at[0].set(theta)
        return dataclasses.replace(
            scene, noise=dataclasses.replace(scene.noise, amplitudes=amps)
        )

    ad = _check(get_scene, scene.noise.amplitudes[0], target, eps=3e-3)
    assert ad != 0.0, "amplitude gradient should be nonzero"


def test_camera_yaw_gradient(setup):
    scene, target = setup

    def get_scene(theta):
        return dataclasses.replace(
            scene, camera=dataclasses.replace(scene.camera, yaw=theta)
        )

    ad = _check(get_scene, scene.camera.yaw, target, eps=3e-3)
    assert ad != 0.0


def test_camera_height_gradient(setup):
    scene, target = setup

    def get_scene(theta):
        pos = scene.camera.position.at[1].set(theta)
        return dataclasses.replace(
            scene, camera=dataclasses.replace(scene.camera, position=pos)
        )

    _check(get_scene, scene.camera.position[1], target, eps=1e-2)


def test_height_scale_gradient(setup):
    scene, target = setup

    def get_scene(theta):
        return dataclasses.replace(
            scene, noise=dataclasses.replace(scene.noise, height_scale=theta)
        )

    # eps 1e-3, not 1e-2: with the 8-direction gradient set (round 3) the
    # masked-loss derivative for height_scale at this scene is small
    # (~2.5e-5) with heavy positive/negative cancellation, so the FD
    # estimate is eps-sensitive at the several-percent level; 1e-3 sits in
    # the sweet spot between truncation and f32 noise (measured sweep:
    # rel err 0.037 at 1e-3 vs 0.068-0.15 at 8e-3/5e-4).
    _check(get_scene, scene.noise.height_scale, target, eps=1e-3)


def test_material_fog_density_gradient(setup):
    scene, target = setup

    def get_scene(theta):
        return dataclasses.replace(
            scene, materials=dataclasses.replace(scene.materials, fog_density=theta)
        )

    # Fog only affects shading (no march dependence): tight tolerance.
    _check(get_scene, scene.materials.fog_density, target, eps=1e-4, rtol=1e-2)


def test_material_sun_color_gradient(setup):
    scene, target = setup

    def get_scene(theta):
        sc = scene.materials.sun_color.at[0].set(theta)
        return dataclasses.replace(
            scene, materials=dataclasses.replace(scene.materials, sun_color=sc)
        )

    _check(get_scene, scene.materials.sun_color[0], target, eps=1e-3, rtol=1e-2)
