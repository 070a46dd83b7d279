"""Fwd+bwd perf sweep on the real chip (the headline metric's methodology,
applied to non-headline configs — VERDICT r3 item 5: the volumetric
differentiable path had parity tests but no fwd+bwd number).

Identical measurement discipline to bench.py's headline child: gradients
w.r.t. every float scene leaf, K salted fwd+bwd steps inside ONE jitted
fori_loop with a *traced* trip count, scalar VALUE fetch for sync, and
(T(K)-T(1))/(K-1) differencing so the tunnel's dispatch/transfer constants
cancel. K=40 per the round-3 calibration (children converge to ±1%; K≤16
single samples carry ±8%).

Usage:
  python scripts/fwdbwd_sweep.py [--size 512] [--octaves 6] [--k 40]
                                 [--variants vol_tile16,vol_tile8,...]
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
from gpgpuraytrace_tpu.ops.fit import partition_scene
from gpgpuraytrace_tpu.ops.render import render

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def time_fwd_bwd(cfg: RenderConfig, K: int = 40) -> dict:
    scene = default_scene(
        num_octaves=cfg.num_octaves, volumetric=cfg.volumetric
    )
    leaves, merge = partition_scene(scene, trainable=lambda name: True)

    def loss(leaves):
        img = render(merge(leaves), cfg)
        return jnp.mean(img * img)

    grad_fn = jax.value_and_grad(loss)

    @jax.jit
    def run(leaves, n, salt):
        def body(i, acc):
            eps = 1e-6 * (salt + i.astype(jnp.float32))
            leaves_i = [leaf + eps for leaf in leaves]
            v, g = grad_fn(leaves_i)
            return acc + v + sum(
                jnp.sum(x) for x in jax.tree_util.tree_leaves(g)
            )
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(run(leaves, 1, jnp.float32(900.0)))
    compile_s = time.perf_counter() - t0

    def timed(n, salt):
        t0 = time.perf_counter()
        float(run(leaves, n, jnp.float32(salt)))
        return time.perf_counter() - t0

    # Process-unique fractional salt base (replay-cache + perturbation-
    # scale traps; utils/timing.py).
    from gpgpuraytrace_tpu.utils.timing import process_salt_base
    base = process_salt_base()
    timed(K, base + 800.0)  # warm
    t_k = min(timed(K, base + 100.0 * r) for r in range(1, 4))
    t_1 = min(timed(1, base + 100.0 * r + 50.0) for r in range(1, 4))
    sec = max(t_k - t_1, 1e-9) / (K - 1)
    return {
        "ms_per_step": round(sec * 1e3, 3),
        "mrays_per_sec": round(cfg.height * cfg.width / sec / 1e6, 1),
        "compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--octaves", type=int, default=6)
    ap.add_argument("--k", type=int, default=40)
    ap.add_argument("--variants", type=str, default="")
    args = ap.parse_args()
    n = args.size

    base = dict(
        height=n, width=n, max_steps=128, num_octaves=args.octaves,
        use_pallas=True,
    )
    vol = {**base, "volumetric": True, "step_relax": 0.9}  # round-4 default
    all_variants = {
        # Heightfield anchor: the headline config, for same-session context.
        "hf_tile16": RenderConfig(**base, tile_h=16),
        # Two-phase ray compaction (VERDICT r3 item 1).
        "hf_tile16_compact32": RenderConfig(
            **base, tile_h=16, march_mode="compact", compact_budget=32
        ),
        "hf_tile16_compact24": RenderConfig(
            **base, tile_h=16, march_mode="compact", compact_budget=24
        ),
        # Volumetric fwd+bwd (VERDICT r3 item 5) + tile/chunk A/B.
        "vol_tile16": RenderConfig(**vol, tile_h=16),
        "vol_tile8": RenderConfig(**vol, tile_h=8),
        "vol_tile16_chunk4": RenderConfig(**vol, tile_h=16, march_chunk=4),
        "vol_tile16_chunk16": RenderConfig(**vol, tile_h=16, march_chunk=16),
    }
    names = (
        [v for v in args.variants.split(",") if v]
        if args.variants
        else list(all_variants)
    )
    for name in names:
        cfg = all_variants[name]
        try:
            res = time_fwd_bwd(cfg, K=args.k)
        except Exception as e:  # noqa: BLE001 — sweep must survive variants
            res = {"error": f"{type(e).__name__}: {str(e)[:160]}"}
        print(json.dumps({"variant": name, **res}), flush=True)


if __name__ == "__main__":
    main()
