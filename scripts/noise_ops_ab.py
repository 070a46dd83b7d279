"""Round-5 ops-per-step A/B harness (VERDICT r4 item 5).

Measures the march's terrain-independent per-step cost with the trusted
fixed-mode 40→80-frame wall ladder (BASELINE.md "Timing discipline") plus
the default chunked forward and the volumetric forward, for whatever noise
implementation is currently checked out. Run it twice — once on the
candidate tree, once on the baseline (e.g. under `git stash`) — in the
SAME session for an honest A/B.

Usage: python scripts/noise_ops_ab.py [--size 512] [--octaves 6] [--tag X]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gpgpuraytrace_tpu.models.scene import RenderConfig

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    from scripts.perf_sweep import time_cfg

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--octaves", type=int, default=6)
    ap.add_argument("--tag", type=str, default="")
    args = ap.parse_args()
    n = args.size
    base = dict(height=n, width=n, num_octaves=args.octaves, use_pallas=True,
                tile_h=16)

    fixed64 = time_cfg(RenderConfig(**base, max_steps=64, march_mode="fixed"))
    fixed128 = time_cfg(RenderConfig(**base, max_steps=128, march_mode="fixed"))
    chunked = time_cfg(RenderConfig(**base, max_steps=128))
    vol = time_cfg(RenderConfig(**base, max_steps=128, volumetric=True))

    # ms → ns is ×1e6; slope over the 64-step delta, per ray.
    slope_ns = (
        (fixed128["ms_per_frame"] - fixed64["ms_per_frame"]) * 1e6
        / 64.0 / (n * n)
    )
    print(json.dumps({
        "tag": args.tag,
        "backend": jax.default_backend(),
        "fixed64_ms": fixed64["ms_per_frame"],
        "fixed128_ms": fixed128["ms_per_frame"],
        "ns_per_ray_per_step": round(slope_ns, 4),
        "chunked_fwd_mrays": chunked["mrays_per_sec"],
        "chunked_ms": chunked["ms_per_frame"],
        "volumetric_fwd_mrays": vol["mrays_per_sec"],
        "volumetric_ms": vol["ms_per_frame"],
    }))


if __name__ == "__main__":
    main()
