"""Kernel-measured whole-tile executed march steps (VERDICT r4 item 4).

Rounds 2–4 justified abandoning ray compaction with a divergence-tax figure
("whole-tile executed steps ≈ 34") that was a chunked-model reconstruction
from lane-level stats plus one older measurement — the kernel never emitted
its own counter. The fused kernel's chunk loop now carries it out behind
``debug_steps`` (kernels/trace.py:_render_pallas_raw), so this script makes
the three derived claims kernel measurements:

* **executed steps/ray** — mean over tiles of the per-tile counter (every
  lane pays its tile's count on the VPU);
* **divergence tax** — executed / lane-useful (lane-useful from the stats
  march, identical march algorithm);
* **compaction harvest bound** — (executed − useful) × fixed-mode
  ns/ray/step × rays: the most a perfect divergence eliminator could still
  recover per frame;

and measures what the counter itself costs: a 40→80-frame wall ladder A/B
of the kernel with and without the extra SMEM output (expected ≈0 — the
while loop already carries the counter; the output is one i32 scalar per
tile).

Usage: python scripts/march_counter.py [--size 512] [--octaves 6]
       [--skip-timing]   (timing needs the real chip; counters run anywhere)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gpgpuraytrace_tpu.models.scene import RenderConfig, default_scene
from gpgpuraytrace_tpu.kernels.trace import _render_pallas_raw

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Fixed-mode march-step slope, BASELINE.md "march-step cost" (round-4 wall
# ladder, terrain v2 + tile16). Used only to convert the measured step gap
# into a per-frame time bound.
NS_PER_RAY_STEP = 0.179


def ladder(scene, cfg, debug_steps: bool):
    """Forward wall ladder (40→80 frames): seconds/frame. Same instrument as
    scripts/relax_sweep.py — see BASELINE.md "Timing discipline"."""

    @jax.jit
    def run(salt, n):
        def body(i, acc):
            s = dataclasses.replace(scene, noise=dataclasses.replace(
                scene.noise,
                height_offset=scene.noise.height_offset
                + (salt + i.astype(jnp.float32)) * 1e-6))
            outs = _render_pallas_raw(s, cfg, debug_steps=debug_steps)
            acc = acc + outs[1].sum()
            if debug_steps:
                acc = acc + outs[3].sum().astype(jnp.float32)
            return acc
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(jnp.float32(900.0), 1))

    def timed(n, salt):
        t0 = time.perf_counter()
        float(run(jnp.float32(salt), n))
        return time.perf_counter() - t0

    from gpgpuraytrace_tpu.utils.timing import process_salt_base
    base = process_salt_base()
    timed(40, base + 800.0)  # warm
    t_40 = min(timed(40, base + 100.0 * r) for r in range(1, 3))
    t_80 = min(timed(80, base + 100.0 * r + 50.0) for r in range(1, 3))
    return max(t_80 - t_40, 1e-9) / 40.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--octaves", type=int, default=6)
    ap.add_argument("--volumetric", action="store_true")
    ap.add_argument("--skip-timing", action="store_true")
    args = ap.parse_args()
    n = args.size
    scene = default_scene(num_octaves=args.octaves,
                          volumetric=args.volumetric)
    on_tpu = jax.default_backend() == "tpu"
    cfg = RenderConfig(height=n, width=n, max_steps=128,
                       num_octaves=args.octaves, use_pallas=True,
                       volumetric=args.volumetric, interpret=not on_tpu)

    # --- kernel counter: whole-tile executed steps --------------------------
    _, _, hit, steps_tile = _render_pallas_raw(scene, cfg, debug_steps=True)
    steps_tile = np.asarray(steps_tile)
    executed = float(steps_tile.mean())  # per ray == per tile (all lanes pay)

    # --- lane-useful steps (stats march, same algorithm) --------------------
    from gpgpuraytrace_tpu.ops.camera import generate_rays
    from gpgpuraytrace_tpu.ops.march import march_with_stats

    cfg_x = dataclasses.replace(cfg, use_pallas=False, interpret=False)
    o, d = generate_rays(scene.camera, n, n)
    # The lane stats must march from the SAME prime map the kernel used
    # (the kernel's own coarse pass) — since priming became the default
    # (round 5), unprimed lane stats against the primed kernel counter
    # would conflate priming savings with tile-divergence waste.
    t0p = None
    if cfg.prime_ds:
        from gpgpuraytrace_tpu.ops.march import (
            coarse_prime_cfg, prime_from_coarse,
        )

        _, t_c, _ = _render_pallas_raw(
            scene, coarse_prime_cfg(cfg), -1.0, n // cfg.prime_ds + 2
        )
        t0p = prime_from_coarse(t_c, cfg)
    _, _, lane = jax.jit(march_with_stats, static_argnums=0)(
        cfg_x, o, d, scene.noise, t0p)
    lane = np.asarray(lane)
    useful = float(lane.mean())
    # Chunked whole-tile model from the same lane data (what rounds 2-4
    # used) — kept for the model-vs-kernel-measurement comparison.
    chunk = cfg.march_chunk or 8
    th = cfg.tile_h
    tile_max = lane.reshape(n // th, th, n // 128, 128).max(axis=(1, 3))
    model = float((np.ceil((tile_max + 1) / chunk) * chunk).mean())

    harvest_ms = (executed - useful) * NS_PER_RAY_STEP * n * n / 1e6
    out = {
        "config": f"{n}x{n}x{args.octaves}"
                  + ("-volumetric" if args.volumetric else ""),
        "backend": jax.default_backend(),
        "executed_steps_per_ray_kernel": round(executed, 2),
        "executed_steps_model_from_lanes": round(model, 2),
        "useful_steps_per_ray": round(useful, 2),
        "divergence_tax": round(executed / max(useful, 1e-9), 2),
        "tile_counter_p50": float(np.percentile(steps_tile, 50)),
        "tile_counter_p99": float(np.percentile(steps_tile, 99)),
        "tile_counter_max": int(steps_tile.max()),
        "harvest_bound_ms_per_frame": round(harvest_ms, 3),
        "hit_rate": round(float(np.asarray(hit).mean()), 4),
    }

    # --- counter cost: ladder A/B ------------------------------------------
    if not args.skip_timing and on_tpu:
        sec_off = ladder(scene, cfg, debug_steps=False)
        sec_on = ladder(scene, cfg, debug_steps=True)
        out["ms_per_frame_no_counter"] = round(sec_off * 1e3, 3)
        out["ms_per_frame_with_counter"] = round(sec_on * 1e3, 3)
        out["counter_overhead_pct"] = round(
            (sec_on / sec_off - 1.0) * 100.0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
