"""Regenerate the frozen golden images (run on CPU for determinism).

Usage: JAX_PLATFORMS=cpu python scripts/make_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# jax.config override needed: this environment's sitecustomize pins the
# platform via jax.config, which beats the JAX_PLATFORMS env var.
jax.config.update("jax_platforms", "cpu")

import numpy as np

from gpgpuraytrace_tpu.models.scene import RenderConfig, default_scene
from gpgpuraytrace_tpu.ops.render import render_jax

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def main():
    os.makedirs(OUT, exist_ok=True)
    # Pins step_floor_t=0 and step_relax=0.7 (classic strict march) — keep
    # in sync with tests/test_render.py CFG1 so the frozen golden is
    # march-tuning-stable.
    cfg = RenderConfig(
        height=128, width=128, max_steps=96, num_octaves=1, use_pallas=False,
        step_floor_t=0.0, step_relax=0.7, newton_iters=4,
    )
    img = np.asarray(render_jax(default_scene(num_octaves=1), cfg))
    np.save(os.path.join(OUT, "config1_128.npy"), img)
    print("wrote config1_128.npy", img.shape, img.dtype, "mean", img.mean())


if __name__ == "__main__":
    main()
