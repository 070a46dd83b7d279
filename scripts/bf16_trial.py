"""Measured bf16-march trial (round-2 VERDICT item 6: "bf16 trial for the
march value path (flagged since round 1, never run)").

Compares RenderConfig(march_bf16=True) against the f32 default at the bench
config (512x512, 6 octaves, fused Pallas forward):

* forward rays/s, via the same traced-trip-count fori_loop differencing as
  bench.py (value-fetch sync, T(K)-T(1) cancels dispatch+tunnel constants);
* quality vs the f32 render: mean abs pixel error, fraction of pixels
  within 5e-3, and hit-verdict flips (the failure mode the precision split
  predicts: bf16 blend error ~0.4% x h_scale can flip marginal silhouette
  pixels; positions/hashing/polish stay f32 so nothing else moves).

Emits one JSON line; the verdict lands in BASELINE.md either way — a
documented negative result is an acceptable outcome, silence is not.

    python scripts/bf16_trial.py [--size 512] [--octaves 6]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def measure_fwd(scene, cfg, iters=16) -> dict:
    """Forward rays/s by traced-trip-count differencing (bench.py method)."""
    from gpgpuraytrace_tpu.ops.render import render

    @jax.jit
    def run(scene, n, salt):
        def body(i, acc):
            s = dataclasses.replace(
                scene,
                noise=dataclasses.replace(
                    scene.noise,
                    height_offset=scene.noise.height_offset
                    + 1e-6 * (salt + i.astype(jnp.float32)),
                ),
            )
            return acc + jnp.mean(render(s, cfg))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(run(scene, 1, jnp.float32(900.0)))
    compile_s = time.perf_counter() - t0

    def timed(n, salt):
        t0 = time.perf_counter()
        float(run(scene, n, jnp.float32(salt)))
        return time.perf_counter() - t0

    K = max(iters, 4)
    timed(K, 800.0)
    t_k = min(timed(K, 100.0 * r) for r in range(1, 4))
    t_1 = min(timed(1, 100.0 * r + 50.0) for r in range(1, 4))
    sec = max(t_k - t_1, 1e-9) / (K - 1)
    return {
        "rays_per_sec": cfg.height * cfg.width / sec,
        "ms_per_frame": sec * 1e3,
        "compile_s": round(compile_s, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--octaves", type=int, default=6)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    from gpgpuraytrace_tpu.kernels.trace import _render_pallas_raw
    from gpgpuraytrace_tpu.models.scene import RenderConfig, default_scene

    on_tpu = jax.default_backend() == "tpu"
    cfg = RenderConfig(
        height=args.size, width=args.size, max_steps=128,
        num_octaves=args.octaves, use_pallas=on_tpu,
        interpret=not on_tpu,
    )
    scene = default_scene(num_octaves=args.octaves)
    cfg_bf = dataclasses.replace(cfg, march_bf16=True)

    f32 = measure_fwd(scene, cfg, args.iters)
    bf16 = measure_fwd(scene, cfg_bf, args.iters)

    # Quality: same frame, both precisions, plus hit-verdict flips.
    _, _, hit_f32 = jax.jit(
        lambda s: _render_pallas_raw(s, cfg)
    )(scene)
    img_f32 = jax.jit(
        lambda s: _render_pallas_raw(s, cfg)[0]
    )(scene)
    img_bf16, _, hit_bf16 = jax.jit(
        lambda s: _render_pallas_raw(s, cfg_bf)
    )(scene)
    d = np.abs(np.asarray(img_f32) - np.asarray(img_bf16))
    flips = int(
        (np.asarray(hit_f32) != np.asarray(hit_bf16)).sum()
    )
    out = {
        "metric": "bf16_march_trial",
        "config": f"{args.size}x{args.size}x{args.octaves}oct",
        "backend": jax.default_backend(),
        "f32_mrays": round(f32["rays_per_sec"] / 1e6, 1),
        "bf16_mrays": round(bf16["rays_per_sec"] / 1e6, 1),
        "speedup": round(bf16["rays_per_sec"] / f32["rays_per_sec"], 3),
        "quality": {
            "mean_abs_err": float(d.mean()),
            "frac_pixels_within_5e-3": float((d.max(axis=-1) < 5e-3).mean()),
            "hit_flips": flips,
            "hit_flips_frac": flips / (args.size * args.size),
        },
        "detail": {"f32": f32, "bf16": bf16},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
