"""Forward-kernel perf sweep on the real chip: tile_h / march_mode / octave
LOD variants. Scan-length differencing (same methodology as bench.py) so the
TPU-tunnel dispatch cost cancels out.

Usage: python scripts/perf_sweep.py [--size 512] [--variants v1,v2,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gpgpuraytrace_tpu.models.scene import RenderConfig, default_scene
from gpgpuraytrace_tpu.ops.render import render


def time_cfg(cfg: RenderConfig, K: int = 40) -> dict:
    """40→80-frame wall-ladder differencing (round 4): at ~2 ms/frame the
    old K=12 (T(K)-T(1))/(K-1) slope has a ~24 ms signal against ±10 ms
    tunnel-RTT variance — the same failure mode that made the first relax
    sweep read +400% (BASELINE.md "Timing discipline"). The ladder's
    endpoints carry identical dispatch cost and the signal is K·frame.
    Salts carry a process-unique fractional base (cross-process replay
    trap, ibid.)."""
    scene = default_scene(num_octaves=cfg.num_octaves, volumetric=cfg.volumetric)

    def make_run(k):
        @jax.jit
        def run(salts):
            def body(acc, salt):
                s = scene.replace(
                    noise=scene.noise.replace(
                        height_offset=scene.noise.height_offset + salt
                    )
                )
                img = render(s, cfg)
                return acc + jnp.sum(img), ()

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), salts)
            return acc

        return run

    from gpgpuraytrace_tpu.utils.timing import process_salt_base
    pbase = process_salt_base()

    def salts(k, base):
        return jnp.arange(k, dtype=jnp.float32) * 1e-6 + (base + pbase) * 1e-7

    run_k, run_2k = make_run(K), make_run(2 * K)
    t0 = time.perf_counter()
    jax.block_until_ready(run_k(salts(K, 1)))
    compile_s = time.perf_counter() - t0
    jax.block_until_ready(run_2k(salts(2 * K, 2)))

    def timed(fn, k, base):
        s = salts(k, base)
        jax.block_until_ready(s)
        # Sync by fetching the scalar VALUE: through the axon tunnel,
        # block_until_ready on a persistent-cache-loaded executable's result
        # can return without waiting; the fetch RTT is constant and cancels
        # in the ladder differencing.
        t0 = time.perf_counter()
        float(fn(s))
        return time.perf_counter() - t0

    t_k = min(timed(run_k, K, 3 + r) for r in range(2))
    t_2k = min(timed(run_2k, 2 * K, 30 + r) for r in range(2))
    sec = max(t_2k - t_k, 1e-9) / K
    return {
        "ms_per_frame": round(sec * 1e3, 3),
        "mrays_per_sec": round(cfg.height * cfg.width / sec / 1e6, 1),
        "compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--variants", type=str, default="")
    args = ap.parse_args()
    n = args.size

    base = dict(height=n, width=n, max_steps=128, num_octaves=6, use_pallas=True)
    all_variants = {
        "tile8_chunked": RenderConfig(**base, tile_h=8),
        "tile16_chunked": RenderConfig(**base, tile_h=16),
        "tile32_chunked": RenderConfig(**base, tile_h=32),
        "tile8_fixed": RenderConfig(**base, tile_h=8, march_mode="fixed"),
        "tile8_lod": RenderConfig(**base, tile_h=8, march_mode="lod"),
        "tile16_lod": RenderConfig(**base, tile_h=16, march_mode="lod"),
        "tile8_vol": RenderConfig(**{**base, "volumetric": True}, tile_h=8),
        "tile16_vol": RenderConfig(**{**base, "volumetric": True}, tile_h=16),
        "tile8_vol_lod": RenderConfig(
            **{**base, "volumetric": True}, tile_h=8, march_mode="lod"
        ),
        "tile8_eps1": RenderConfig(**base, tile_h=8, march_eps_scale=1.0),
        "tile8_eps4": RenderConfig(**base, tile_h=8, march_eps_scale=4.0),
        "tile8_floor0": RenderConfig(**base, tile_h=8, step_floor_t=0.0),
        "tile8_floor1e3": RenderConfig(**base, tile_h=8, step_floor_t=1e-3),
        "tile8_floor2e3": RenderConfig(**base, tile_h=8, step_floor_t=2e-3),
        "tile8_floor4e3": RenderConfig(**base, tile_h=8, step_floor_t=4e-3),
        "tile8_vol_floor2e3": RenderConfig(
            **{**base, "volumetric": True}, tile_h=8, step_floor_t=2e-3
        ),
        "tile8_chunk4": RenderConfig(**base, tile_h=8, march_chunk=4),
        "tile8_chunk16": RenderConfig(**base, tile_h=8, march_chunk=16),
        "tile16_chunk4": RenderConfig(**base, tile_h=16, march_chunk=4),
        # Two-phase ray compaction (march_mode="compact"; VERDICT r3 item 1)
        # at a budget sweep — model prediction on the bench scene: executed
        # steps/ray minimized near budget 32.
        "tile16_compact16": RenderConfig(
            **base, tile_h=16, march_mode="compact", compact_budget=16
        ),
        "tile16_compact24": RenderConfig(
            **base, tile_h=16, march_mode="compact", compact_budget=24
        ),
        "tile16_compact32": RenderConfig(
            **base, tile_h=16, march_mode="compact", compact_budget=32
        ),
        "tile16_compact48": RenderConfig(
            **base, tile_h=16, march_mode="compact", compact_budget=48
        ),
        "tile8_compact32": RenderConfig(
            **base, tile_h=8, march_mode="compact", compact_budget=32
        ),
        "tile16_vol_compact32": RenderConfig(
            **{**base, "volumetric": True}, tile_h=16,
            march_mode="compact", compact_budget=32
        ),
    }
    names = (
        [v for v in args.variants.split(",") if v]
        if args.variants
        else list(all_variants)
    )
    for name in names:
        cfg = all_variants[name]
        try:
            res = time_cfg(cfg)
        except Exception as e:  # noqa: BLE001 — sweep must survive bad variants
            res = {"error": f"{type(e).__name__}: {str(e)[:120]}"}
        print(json.dumps({"variant": name, **res}), flush=True)


if __name__ == "__main__":
    main()
