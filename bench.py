"""Benchmark harness: rays/sec/chip forward+backward at 512×512 (the judged
headline metric, BASELINE.json:2). Prints ONE JSON line.

The reference publishes no numbers (BASELINE.json:13 "published": {}), so
``vs_baseline`` is measured against this framework's own pure-XLA
(non-Pallas) path on the same hardware — i.e. the speedup the fused Pallas
kernel delivers over letting XLA schedule the march, which is the honest
available baseline.

Robustness: every measurement runs in a child process under a hard timeout,
so a wedged TPU tunnel or a pathological kernel compile degrades the
benchmark (variant reported as null / CPU fallback) instead of hanging the
driver.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD_TIMEOUT_S = int(os.environ.get("BENCH_TIMEOUT_S", "480"))

_CHILD_CODE = r"""
import json, sys, time
use_pallas = sys.argv[1] == "1"
h, w, octaves, iters = (int(a) for a in sys.argv[2:6])
force_cpu = sys.argv[6] == "1"

import jax
if force_cpu:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from gpgpuraytrace_tpu.models.scene import RenderConfig, default_scene
from gpgpuraytrace_tpu.ops.fit import partition_scene
from gpgpuraytrace_tpu.ops.render import render

scene = default_scene(num_octaves=octaves)
cfg = RenderConfig(height=h, width=w, max_steps=128, num_octaves=octaves,
                   use_pallas=use_pallas)
# Gradients w.r.t. every float scene leaf (noise + camera + materials) —
# the full fwd+bwd path of the fit loop.
leaves, merge = partition_scene(scene, trainable=lambda name: True)

def loss(leaves):
    img = render(merge(leaves), cfg)
    return jnp.mean(img * img)

grad_fn = jax.value_and_grad(loss)

# Scan-length differencing: run K fwd+bwd steps inside ONE jitted lax.scan
# (distinct inputs per step — the TPU tunnel content-addresses (executable,
# args) pairs, and identical repeats would be served from cache), then
# subtract a 1-step scan. (T(K) - T(1)) / (K - 1) cancels the fixed
# dispatch/transfer/tunnel cost, leaving pure device time per step — the
# same batch-diff methodology as the forward number in BASELINE.md.
def make_run(K):
    @jax.jit
    def run(stacked):
        def body(acc, leaves_k):
            v, g = grad_fn(leaves_k)
            contrib = v + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
            return acc + contrib, ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), stacked)
        return acc
    return run

def stack(K, salt):
    return [
        jnp.stack([leaf + jnp.float32(1e-6 * (salt + k + 1)) for k in range(K)])
        for leaf in leaves
    ]

K = max(iters, 4)
run_k, run_1 = make_run(K), make_run(1)
t0 = time.perf_counter()
jax.block_until_ready(run_1(stack(1, 900)))
compile_s = time.perf_counter() - t0
jax.block_until_ready(run_k(stack(K, 800)))  # warm the K-step executable

def timed(fn, K_, salt):
    s = stack(K_, salt)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(s))
    return time.perf_counter() - t0

t_k = min(timed(run_k, K, 100 * r) for r in range(1, 4))
t_1 = min(timed(run_1, 1, 100 * r + 50) for r in range(1, 4))
sec = max(t_k - t_1, 1e-9) / (K - 1)
wall = t_k / K  # includes dispatch overhead: the conservative lower bound
print(json.dumps({
    "rays_per_sec": h * w / sec,
    "ms_per_step": sec * 1e3,
    "rays_per_sec_wall": h * w / wall,
    "compile_s": compile_s,
    "backend": jax.default_backend(),
}))
"""


def _run_variant(use_pallas: bool, h: int, w: int, octaves: int, iters: int,
                 force_cpu: bool = False):
    """Run one bench variant in a child process; None on timeout/crash."""
    try:
        proc = subprocess.run(
            [
                sys.executable, "-c", _CHILD_CODE,
                "1" if use_pallas else "0",
                str(h), str(w), str(octaves), str(iters),
                "1" if force_cpu else "0",
            ],
            capture_output=True,
            text=True,
            timeout=_CHILD_TIMEOUT_S,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        return None
    if proc.returncode != 0:
        return None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return None


def run_bench(size=(512, 512), octaves: int = 6, iters: int = 10) -> dict:
    h, w = size
    # Headline (pallas) first: the xla baseline's fwd+bwd compile can take
    # many minutes through a remote-compile tunnel and may hit the child
    # timeout; the headline number must never depend on it.
    pallas = _run_variant(True, h, w, octaves, iters)
    xla = _run_variant(False, h, w, octaves, iters)
    note = None
    if pallas and not xla:
        note = "xla_baseline_timed_out"
    if xla is None and pallas is None:
        # Device path unavailable (e.g. wedged tunnel): CPU fallback so the
        # harness still emits a valid measurement, clearly labeled.
        xla = _run_variant(False, h, w, octaves, max(2, iters // 5), force_cpu=True)
        note = "tpu_unavailable_cpu_fallback"

    main = pallas or xla
    baseline = xla or pallas
    detail = {}
    if xla:
        detail["xla"] = round(xla["rays_per_sec"])
    if pallas:
        detail["pallas"] = round(pallas["rays_per_sec"])
    result = {
        "metric": "rays_per_sec_fwd_bwd_512x512",
        "value": main["rays_per_sec"] if main else 0.0,
        "unit": "rays/s/chip",
        "vs_baseline": (main["rays_per_sec"] / baseline["rays_per_sec"])
        if (main and baseline)
        else 0.0,
        "detail": detail,
        "backend": main.get("backend") if main else "none",
    }
    if note:
        result["note"] = note
    return result


if __name__ == "__main__":
    print(json.dumps(run_bench()))
