"""Tracing / profiling / observability (SURVEY.md §6).

The reference's only observability was an FPS counter. Here:
* ``trace()`` — context manager around ``jax.profiler`` producing
  TensorBoard/Perfetto traces of the XLA/Pallas execution;
* ``march_stats()`` — per-frame step-count histograms and hit rates from the
  non-differentiable stats march (where the compute goes per pixel);
* ``Timer`` — a wall-clock timer that blocks on device work, for honest
  frame timing through the async dispatch queue.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np

from gpgpuraytrace_tpu.models.scene import RenderConfig, Scene
from gpgpuraytrace_tpu.ops.camera import generate_rays
from gpgpuraytrace_tpu.ops.march import march_with_stats


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpu_raymarch_trace"):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def march_stats(scene: Scene, cfg: RenderConfig) -> dict:
    """Step-count histogram + hit rate for a frame (runs the stats march)."""
    o, d = generate_rays(scene.camera, cfg.height, cfg.width)
    t, hit, steps = jax.jit(
        march_with_stats, static_argnums=0
    )(cfg, o, d, scene.noise)
    steps = np.asarray(steps)
    hit = np.asarray(hit)
    hist, edges = np.histogram(steps, bins=16, range=(0, cfg.max_steps))
    return {
        "hit_rate": float(hit.mean()),
        "steps_mean": float(steps.mean()),
        "steps_p50": float(np.percentile(steps, 50)),
        "steps_p99": float(np.percentile(steps, 99)),
        "steps_max": int(steps.max()),
        "histogram": hist.tolist(),
        "bin_edges": edges.tolist(),
        "t_mean_hit": float(np.asarray(t)[hit].mean()) if hit.any() else None,
    }


class Timer:
    """min-of-N wall timer with device sync: Timer()(fn, *args) -> seconds."""

    def __init__(self, iters: int = 10, warmup: int = 2):
        self.iters = iters
        self.warmup = warmup

    def __call__(self, fn, *args):
        for _ in range(self.warmup):
            jax.block_until_ready(fn(*args))
        best = float("inf")
        for _ in range(self.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best
