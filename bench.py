"""Benchmark harness: rays/sec/chip forward+backward at 512×512 (the judged
headline metric, BASELINE.json:2). Prints ONE JSON line.

The reference publishes no numbers (BASELINE.json:13 "published": {}), so
``vs_baseline`` is measured against this framework's own pure-XLA
(non-Pallas) path on the same hardware — i.e. the speedup the fused Pallas
kernel delivers over letting XLA schedule the march, which is the honest
available baseline.

Robustness (hardened after round 1, where the Pallas child silently timed
out and the record degraded to the XLA fallback with no trace):

* every measurement runs in a child process under a hard timeout;
* children use a persistent compilation cache (``.jax_cache/`` next to
  this file). Measured caveat: the cache hits across processes for plain
  XLA programs but NOT for the big bench executables (each run writes a
  fresh fingerprint — the Pallas/Mosaic custom-call payload is not
  bit-deterministic across processes), so budget for cold compiles: the
  fused-Pallas child compiles in ~40–190 s, well inside its 480 s timeout;
* each variant compiles **one** executable (a dynamic-trip-count
  ``fori_loop`` over fwd+bwd steps) instead of round 1's two scan programs —
  roughly halving cold-compile time;
* the emitted JSON always carries a per-variant ``status``
  (ok / timeout / crash+stderr-tail), and a ``note`` whenever the headline
  value is NOT the fused-Pallas number. There is no silent-fallback path.

``python bench.py``          → headline single-chip JSON line.
``python bench.py --mesh N`` → scaling harness: sharded fwd+bwd rays/s at
mesh sizes 1..N and parallel efficiency (BASELINE.json:2 "N-host scaling
eff"); uses virtual CPU devices when N real chips are not attached, so the
harness itself is exercised before pod hardware exists.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD_TIMEOUT_S = int(os.environ.get("BENCH_TIMEOUT_S", "480"))
_STATS_TIMEOUT_S = int(os.environ.get("BENCH_STATS_TIMEOUT_S", "480"))
_REPO = os.path.dirname(os.path.abspath(__file__))
_CACHE_DIR = os.path.join(_REPO, ".jax_cache")

# Shared child preamble: persistent compile cache (works through the axon
# TPU tunnel — verified: cache entries are written and replayed) so the
# driver's end-of-round run pays seconds, not minutes, of Mosaic compile.
_PREAMBLE = r"""
import json, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", %r)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
""" % _CACHE_DIR

_CHILD_CODE = _PREAMBLE + r"""
use_pallas = sys.argv[1] == "1"
h, w, octaves, iters = (int(a) for a in sys.argv[2:6])
force_cpu = sys.argv[6] == "1"
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

# ONE executable, runtime trip count: n fwd+bwd steps inside a fori_loop
# (lowers to while_loop — the bound is a traced arg, so T(1) and T(K) reuse
# the same compiled program). Each step perturbs the leaves by a distinct
# salt+i so (a) no two steps are identical work and (b) the TPU tunnel's
# content-addressed (executable, args) cache never serves a repeat.
# (T(K) - T(1)) / (K - 1) cancels the fixed dispatch/transfer/tunnel cost,
# leaving pure device time per step — same differencing methodology as
# BASELINE.md's forward numbers.
@jax.jit
def run(leaves, n, salt):
    def body(i, acc):
        eps = 1e-6 * (salt + i.astype(jnp.float32))
        leaves_i = [leaf + eps for leaf in leaves]
        v, g = grad_fn(leaves_i)
        return acc + v + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

K = max(iters, 4)
t0 = time.perf_counter()
# Sync by fetching the scalar VALUE, not block_until_ready: through the
# axon tunnel, block_until_ready on the result of a persistent-cache-loaded
# executable can return without waiting (measured: 0.2 ms reported for
# 0.9 s of device work). The fetch RTT is constant and cancels in the
# T(K) - T(1) differencing.
float(run(leaves, 1, jnp.float32(900.0)))
compile_s = time.perf_counter() - t0

def timed(n, salt):
    t0 = time.perf_counter()
    float(run(leaves, n, jnp.float32(salt)))
    return time.perf_counter() - t0

timed(K, 800.0)  # warm the K-step path (touches nothing new, belt+braces)
t_k = min(timed(K, 100.0 * r) for r in range(1, 4))
t_1 = min(timed(1, 100.0 * r + 50.0) for r in range(1, 4))
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

# March observability (SURVEY.md §6): step-count histogram + hit rate at the
# bench config, from the non-differentiable stats march. Optional — failure
# only marks status.stats, never the headline.
_STATS_CODE = _PREAMBLE + r"""
h, w, octaves = (int(a) for a in sys.argv[1:4])
from gpgpuraytrace_tpu.models.scene import RenderConfig, default_scene
from gpgpuraytrace_tpu.utils.profiling import march_stats

cfg = RenderConfig(height=h, width=w, max_steps=128, num_octaves=octaves,
                   use_pallas=False)
scene = default_scene(num_octaves=octaves)
s = march_stats(scene, cfg)
print(json.dumps({
    "hit_rate": s["hit_rate"],
    "steps_mean": s["steps_mean"],
    "steps_p99": s["steps_p99"],
    "histogram": s["histogram"],
}))
"""

# Scaling harness child (BASELINE.json:2 "scaling efficiency ... at 1 chip /
# 1 host / N hosts"): sharded fwd+bwd over a 'tiles' mesh at each size in the
# sweep, same fori_loop differencing. argv: n_list_csv, h, w, octaves, iters,
# use_pallas, interpret, virtual_cpu.
_MESH_CODE = _PREAMBLE + r"""
n_list = [int(a) for a in sys.argv[1].split(",")]
h, w, octaves, iters = (int(a) for a in sys.argv[2:6])
use_pallas = sys.argv[6] == "1"
interpret = sys.argv[7] == "1"
if sys.argv[8] == "1":
    # Virtual-device mode: this environment's sitecustomize pins the TPU
    # platform through jax.config, which OVERRIDES the JAX_PLATFORMS env
    # var — force CPU the same way (XLA_FLAGS from the parent provides the
    # virtual device count).
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from gpgpuraytrace_tpu.models.scene import RenderConfig, default_scene
from gpgpuraytrace_tpu.ops.fit import partition_scene
from gpgpuraytrace_tpu.parallel.mesh import make_mesh
from gpgpuraytrace_tpu.parallel.sharded import (
    _sharded_loss_and_grad_body, shard_target,
)

cfg = RenderConfig(height=h, width=w, max_steps=128, num_octaves=octaves,
                   use_pallas=use_pallas, interpret=interpret)
scene = default_scene(num_octaves=octaves)
leaves, merge = partition_scene(scene, trainable=lambda name: True)
K = max(iters, 4)
out = {}
for n in n_list:
    mesh = make_mesh(jax.devices()[:n])
    body = _sharded_loss_and_grad_body(merge, cfg, mesh)
    target = shard_target(jnp.zeros((h, w, 3), jnp.float32), mesh)

    @jax.jit
    def run(leaves, target, nsteps, salt):
        def step(i, acc):
            eps = 1e-6 * (salt + i.astype(jnp.float32))
            loss, grads = body([leaf + eps for leaf in leaves], target)
            return acc + loss + sum(
                jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return jax.lax.fori_loop(0, nsteps, step, jnp.float32(0.0))

    # Value-fetch sync (see the headline child): block_until_ready can
    # no-op on cache-loaded executables through the TPU tunnel.
    float(run(leaves, target, 1, jnp.float32(900.0)))

    def timed(nsteps, salt):
        t0 = time.perf_counter()
        float(run(leaves, target, nsteps, jnp.float32(salt)))
        return time.perf_counter() - t0

    timed(K, 800.0)
    t_k = min(timed(K, 100.0 * r) for r in range(1, 4))
    t_1 = min(timed(1, 100.0 * r + 50.0) for r in range(1, 4))
    sec = max(t_k - t_1, 1e-9) / (K - 1)
    out[str(n)] = h * w / sec
print(json.dumps({"rays_per_sec": out, "backend": jax.default_backend()}))
"""


def _run_child(code: str, argv: list[str], timeout_s: int, env=None):
    """Run one bench child; returns (parsed_json_or_None, status_string)."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code, *argv],
            capture_output=True,
            text=True,
            timeout=timeout_s,
            cwd=_REPO,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return None, f"timeout>{timeout_s}s"
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-3:]
        return None, "crash: " + " | ".join(tail)[-300:]
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line), "ok"
        except json.JSONDecodeError:
            continue
    return None, "no-json-output"


def _run_variant(use_pallas: bool, h: int, w: int, octaves: int, iters: int,
                 force_cpu: bool = False):
    return _run_child(
        _CHILD_CODE,
        ["1" if use_pallas else "0", str(h), str(w), str(octaves), str(iters),
         "1" if force_cpu else "0"],
        _CHILD_TIMEOUT_S,
    )


_RECORDED_BASELINE = os.path.join(_REPO, "bench_reference.json")


def _recorded_xla_baseline(h: int, w: int, octaves: int):
    """Stored XLA-baseline measurement (bench_reference.json, committed).

    The pure-XLA fwd+bwd baseline can take >480 s of cold Mosaic-free XLA
    compile through the remote-compile tunnel — longer than its child
    timeout on a bad day. The baseline denominator should not vanish when
    that happens (round 2 saw exactly this: pallas ok in 63 s, xla child
    timed out, vs_baseline degraded to 1.0), so a previously *measured*
    number for the same (h, w, octaves) config is kept on disk and used,
    clearly labeled, when the live run fails.
    """
    try:
        with open(_RECORDED_BASELINE) as f:
            rec = json.load(f)
        entry = rec[f"{w}x{h}x{octaves}"]
        return {"rays_per_sec": float(entry["xla_rays_per_sec"]),
                "backend": entry.get("backend", "tpu")}, entry
    except (OSError, KeyError, ValueError):
        return None, None


def run_bench(size=(512, 512), octaves: int = 6, iters: int = 10) -> dict:
    h, w = size
    # Headline (pallas) first: the xla baseline's fwd+bwd compile can take
    # minutes cold through the remote-compile tunnel; the headline number
    # must never depend on it.
    pallas, st_pallas = _run_variant(True, h, w, octaves, iters)
    xla, st_xla = _run_variant(False, h, w, octaves, iters)
    status = {"pallas": st_pallas, "xla": st_xla}
    note = None
    if pallas and not xla:
        recorded, entry = _recorded_xla_baseline(h, w, octaves)
        if recorded is not None:
            xla = recorded
            status["xla"] = (
                f"live-run-failed ({st_xla}); using recorded measurement "
                f"from {entry.get('measured', '?')}"
            )
            note = "xla_baseline_from_recorded_measurement"
        else:
            note = f"xla_baseline_unavailable ({st_xla}); vs_baseline=pallas-only"
    if xla is None and pallas is None:
        # Device path unavailable (e.g. wedged tunnel): CPU fallback so the
        # harness still emits a valid measurement, clearly labeled.
        xla, st_cpu = _run_variant(
            False, h, w, octaves, max(2, iters // 5), force_cpu=True
        )
        status["cpu_fallback"] = st_cpu
        note = (
            f"tpu_unavailable_cpu_fallback (pallas: {st_pallas}; "
            f"xla: {st_xla})"
        )
    elif pallas is None:
        # The headline variant died but the baseline survived — round 1's
        # silent-degradation case. Say so loudly in the record.
        note = f"HEADLINE_IS_XLA_FALLBACK: pallas variant failed ({st_pallas})"

    stats, st_stats = _run_child(
        _STATS_CODE, [str(h), str(w), str(octaves)], _STATS_TIMEOUT_S
    )
    status["stats"] = st_stats
    if stats is None:
        # March-stats compile (pure-XLA march_with_stats) can exceed the
        # child timeout cold; fall back to the recorded measurement for
        # this config, clearly labeled (observability data only — never
        # affects the headline or vs_baseline).
        try:
            with open(_RECORDED_BASELINE) as f:
                entry = json.load(f)[f"{w}x{h}x{octaves}"]
            stats = entry["march_stats"]
            status["stats"] = (
                f"live-run-failed ({st_stats}); using recorded march stats "
                f"from {entry.get('measured', '?')}"
            )
        except (OSError, KeyError, ValueError):
            pass

    main = pallas or xla
    baseline = xla or pallas
    detail = {}
    if xla:
        key = "xla_recorded" if note == "xla_baseline_from_recorded_measurement" else "xla"
        detail[key] = round(xla["rays_per_sec"])
    if pallas:
        detail["pallas"] = round(pallas["rays_per_sec"])
        detail["pallas_ms_per_step"] = round(pallas["ms_per_step"], 3)
        detail["pallas_compile_s"] = round(pallas["compile_s"], 1)
    if stats:
        detail["march"] = stats
    result = {
        "metric": "rays_per_sec_fwd_bwd_512x512",
        "value": main["rays_per_sec"] if main else 0.0,
        "unit": "rays/s/chip",
        "vs_baseline": (main["rays_per_sec"] / baseline["rays_per_sec"])
        if (main and baseline)
        else 0.0,
        "detail": detail,
        "backend": main.get("backend") if main else "none",
        "status": status,
    }
    if note:
        result["note"] = note
    return result


def run_bench_mesh(
    n_devices: int, size=(512, 512), octaves: int = 6, iters: int = 8
) -> dict:
    """Scaling harness: sharded fwd+bwd rays/s at mesh sizes 1,2,4..N and
    parallel efficiency eff(N) = rps(N) / (N · rps(1)).

    Runs on real devices when ≥N are attached; otherwise on N virtual CPU
    devices (``xla_force_host_platform_device_count``) with interpret-mode
    Pallas — the measured efficiency is then about harness/collective
    overheads, not ICI, and the JSON says so. Hardware-day is measurement
    only: point this at a pod and the same code path rides ICI/DCN.
    """
    h, w = size
    sweep = [1]
    while sweep[-1] * 2 <= n_devices:
        sweep.append(sweep[-1] * 2)
    if sweep[-1] != n_devices:
        sweep.append(n_devices)
    import jax

    real = len(jax.devices())
    virtual = real < n_devices
    env = None
    if virtual:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
        env["JAX_PLATFORMS"] = "cpu"
        # Virtual CPU meshes shrink the frame (CPU march is ~100x slower) —
        # the point is exercising the harness + efficiency math end-to-end.
        h, w = min(h, 128), min(w, 256)
    assert h % n_devices == 0, f"height {h} must divide over {n_devices}"
    use_pallas = not virtual
    child, status = _run_child(
        _MESH_CODE,
        [",".join(map(str, sweep)), str(h), str(w), str(octaves), str(iters),
         "1" if use_pallas else "0", "0", "1" if virtual else "0"],
        _CHILD_TIMEOUT_S * 2,
        env=env,
    )
    rps = {int(k): v for k, v in (child or {}).get("rays_per_sec", {}).items()}
    eff = {
        str(n): rps[n] / (n * rps[1]) for n in rps if 1 in rps and rps[1] > 0
    }
    result = {
        "metric": f"scaling_efficiency_mesh{n_devices}_{w}x{h}",
        "value": eff.get(str(n_devices), 0.0),
        "unit": "parallel_efficiency",
        "vs_baseline": eff.get(str(n_devices), 0.0) / 0.80,  # ≥80% target
        "detail": {
            "rays_per_sec": {str(k): round(v) for k, v in rps.items()},
            "efficiency": {k: round(v, 4) for k, v in eff.items()},
            "devices": "virtual_cpu" if virtual else child.get("backend")
            if child else "none",
        },
        "status": {"mesh": status},
    }
    if virtual:
        result["note"] = (
            "virtual CPU devices (no pod attached): efficiency reflects "
            "harness+collective overhead, not ICI"
        )
    return result


if __name__ == "__main__":
    if "--mesh" in sys.argv:
        n = int(sys.argv[sys.argv.index("--mesh") + 1])
        print(json.dumps(run_bench_mesh(n)))
    else:
        print(json.dumps(run_bench()))
