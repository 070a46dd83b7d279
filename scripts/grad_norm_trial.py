"""Upper-bound probe: what would removing the per-corner gradient
normalization (4x rsqrt+2mul per octave per march step) buy?

The march step counts 1152 Mosaic vector slots; the rsqrt-normalize chain in
``_grad2`` is ~24 slots/octave = ~144/step (12.5%). This probe monkeypatches
``ops.noise._grad2`` to return the raw (unnormalized) hash gradients — the
IMAGE IS WRONG (different noise statistics), but the kernel op mix is
exactly what a select-based classic-Perlin gradient set would approach, so
the measured delta is the realistic ceiling for that redesign. If the gain
is small, the VPU's multi-issue is absorbing the normalization for free and
the redesign (plus golden re-anchoring) is not worth it.

    python scripts/grad_norm_trial.py [--size 512] [--octaves 6]

Emits one JSON line {stock_mrays, nonorm_mrays, ceiling_speedup}.
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


def measure_fwd(scene, cfg, iters=16) -> float:
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

    float(run(scene, 1, jnp.float32(900.0)))

    def timed(n, salt):
        t0 = time.perf_counter()
        float(run(scene, n, jnp.float32(salt)))
        return time.perf_counter() - t0

    K = max(iters, 4)
    timed(K, 800.0)
    t_k = min(timed(K, 100.0 * r) for r in range(1, 4))
    t_1 = min(timed(1, 100.0 * r + 50.0) for r in range(1, 4))
    sec = max(t_k - t_1, 1e-9) / (K - 1)
    return cfg.height * cfg.width / sec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--octaves", type=int, default=6)
    args = ap.parse_args()

    from gpgpuraytrace_tpu.models.scene import RenderConfig, default_scene
    from gpgpuraytrace_tpu.ops import noise as noise_mod

    on_tpu = jax.default_backend() == "tpu"
    cfg = RenderConfig(
        height=args.size, width=args.size, max_steps=128,
        num_octaves=args.octaves, use_pallas=on_tpu, interpret=not on_tpu,
    )
    scene = default_scene(num_octaves=args.octaves)

    stock = measure_fwd(scene, cfg)

    # Monkeypatch: raw (unnormalized) gradients. noise2/noise2_value resolve
    # _grad2 through the module global at trace time, and the Pallas kernel
    # builds its field through the same functions, so one patch covers every
    # path consistently (the image changes — this is a perf probe only).
    # Since round 5 the noise paths resolve _grad2_raw (deferred 1/sqrt5),
    # so that is the symbol to patch.
    orig = noise_mod._grad2_raw

    def grad2_nonorm(h):
        gx = (h & 0xFFFF).astype(jnp.float32) * (1.0 / 32768.0) - 1.0
        gz = noise_mod._lsr(h, 16).astype(jnp.float32) * (1.0 / 32768.0) - 1.0
        return gx, gz

    noise_mod._grad2_raw = grad2_nonorm
    try:
        nonorm = measure_fwd(scene, cfg)
    finally:
        noise_mod._grad2_raw = orig

    print(json.dumps({
        "metric": "grad_norm_removal_ceiling",
        "config": f"{args.size}x{args.size}x{args.octaves}oct",
        "backend": jax.default_backend(),
        "stock_mrays": round(stock / 1e6, 1),
        "nonorm_mrays": round(nonorm / 1e6, 1),
        "ceiling_speedup": round(nonorm / stock, 3),
    }))


if __name__ == "__main__":
    main()
