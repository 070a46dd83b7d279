"""Silent-failure observability (VERDICT r4 weak #3 / next-item 3):
budget-exhausted lane counting and the scene-roughness warning."""

import warnings

import dataclasses
import jax.numpy as jnp
import pytest

from gpgpuraytrace_tpu.models.scene import RenderConfig, default_scene
from gpgpuraytrace_tpu.utils.profiling import (
    ROUGHNESS_WARN_THRESHOLD, march_stats, roughness_proxy, warn_if_rough,
)

CFG = RenderConfig(height=64, width=64, max_steps=128, num_octaves=3,
                   use_pallas=False)


def _rough_scene(octaves: int = 3, height_scale: float = 8.0):
    """The BASELINE.md robustness-table rough variant: slow amplitude decay
    × large height_scale (27.5% of pixels measured off at relax 1.0)."""
    scene = default_scene(num_octaves=octaves)
    return dataclasses.replace(
        scene,
        noise=dataclasses.replace(
            scene.noise,
            amplitudes=jnp.asarray(
                [0.65 ** i for i in range(octaves)], jnp.float32
            ),
            height_scale=jnp.float32(height_scale),
        ),
    )


def test_exhausted_lane_count_present_and_small_on_default():
    s = march_stats(default_scene(num_octaves=3), CFG)
    assert "exhausted_lanes" in s and "exhausted_frac" in s
    # The default config finishes every ray: hit, or escape clamped to t_max.
    assert s["exhausted_frac"] < 0.01, s["exhausted_frac"]


def test_exhausted_lane_count_detects_budget_starvation():
    """Tiny relax + tiny budget leaves grazing rays mid-march — the silent
    sky-hole failure the counter exists to surface."""
    starved = dataclasses.replace(CFG, step_relax=0.05, max_steps=16,
                                  step_floor_t=0.0)
    s = march_stats(default_scene(num_octaves=3), starved)
    assert s["exhausted_lanes"] > 100, s["exhausted_lanes"]


def test_roughness_proxy_values():
    scene = default_scene(num_octaves=6)
    r_default = roughness_proxy(scene.noise, 6)
    r_rough = roughness_proxy(_rough_scene(6).noise, 6)
    # Default family ≈ 1.8; the measured-unsafe rough row ≈ 4.0 — the
    # threshold must separate them.
    assert r_default < ROUGHNESS_WARN_THRESHOLD < r_rough
    assert r_default == pytest.approx(1.8, rel=0.2)
    assert r_rough == pytest.approx(5.1, rel=0.2)


def test_default_scene_does_not_warn():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        warn_if_rough(default_scene(num_octaves=6),
                      RenderConfig(num_octaves=6, use_pallas=False))


def test_rough_scene_warns():
    with pytest.warns(UserWarning, match="roughness proxy"):
        warn_if_rough(_rough_scene(6),
                      RenderConfig(num_octaves=6, use_pallas=False))


def test_fit_warns_on_rough_scene():
    """The warning is wired into the library fit loop, not just the CLI."""
    import jax
    from gpgpuraytrace_tpu.ops.fit import fit
    from gpgpuraytrace_tpu.ops.render import render_jit

    cfg = RenderConfig(height=32, width=32, max_steps=32, num_octaves=2,
                       use_pallas=False)
    # 2 octaves keep the render cheap; height_scale 24 puts the proxy at
    # ≈2.8, past the threshold.
    scene = _rough_scene(2, height_scale=24.0)
    target = jax.block_until_ready(render_jit(scene, cfg))
    with pytest.warns(UserWarning, match="roughness proxy"):
        fit(scene, cfg, target, steps=1, log_fn=lambda *_: None)
