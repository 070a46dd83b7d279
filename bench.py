"""Benchmark harness: rays/sec/chip forward+backward at 512×512 (the judged
headline metric, BASELINE.json:2). Prints ONE JSON line.

The reference publishes no numbers (BASELINE.json:13 "published": {}), so
``vs_baseline`` is measured against this framework's own pure-XLA (non-Pallas)
path on the same hardware — i.e. the speedup the fused Pallas kernel delivers
over letting XLA schedule the march, which is the honest available baseline.
"""

from __future__ import annotations

import json
import time


def _time_fn(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def run_bench(size=(512, 512), octaves: int = 6, iters: int = 10) -> dict:
    import jax
    import jax.numpy as jnp

    from gpgpuraytrace_tpu.models.scene import RenderConfig, default_scene
    from gpgpuraytrace_tpu.ops.render import render

    h, w = size
    on_tpu = jax.default_backend() == "tpu"
    scene = default_scene(num_octaves=octaves)

    def fwd_bwd_loss(cfg):
        def loss(scene):
            img = render(scene, cfg)
            return jnp.mean(img * img)

        return jax.jit(jax.value_and_grad(loss))

    results = {}
    for use_pallas in ([False, True] if on_tpu else [False]):
        cfg = RenderConfig(
            height=h, width=w, max_steps=128, num_octaves=octaves,
            use_pallas=use_pallas,
        )
        step = fwd_bwd_loss(cfg)
        sec = _time_fn(step, scene, iters=iters)
        results["pallas" if use_pallas else "xla"] = h * w / sec

    main = results.get("pallas", results["xla"])
    baseline = results["xla"]
    return {
        "metric": "rays_per_sec_fwd_bwd_512x512",
        "value": main,
        "unit": "rays/s/chip",
        "vs_baseline": main / baseline,
        "detail": {k: round(v) for k, v in results.items()},
        "backend": jax.default_backend(),
    }


if __name__ == "__main__":
    print(json.dumps(run_bench()))
