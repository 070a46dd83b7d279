"""Cold-compile investigation harness (VERDICT round-2 item 2).

The judged problem: the fused-Pallas bench child cold-compiles in ~458 s
through the axon TPU tunnel, and the persistent compilation cache
(.jax_cache/) does not hit across processes for the big Mosaic programs —
so every driver run, parity gate, and cold CLI start pays minutes.

Three subcommands, each answering one question with a measurement:

  key    Is the lowered program bit-deterministic across processes?
         Lowers the exact bench fwd+bwd program, hashes (a) the StableHLO
         text, (b) the serialized HLO proto that the compilation-cache key
         is derived from, and (c) each Mosaic custom-call backend_config
         payload individually. Run it twice (two processes) and compare:
         identical hashes ⇒ the cache *key* is stable and a miss must come
         from elsewhere (flags/env in the key, or cache write/read bugs);
         differing hashes ⇒ diff the dumped artifacts to find the varying
         bytes.

  split  Where do the 458 s go? Times, separately, on the real backend:
         fwd-only pallas_call compile, fwd+bwd (value_and_grad) compile,
         and the full bench fori_loop wrapper compile.

  aot    Does executable serialization round-trip through the tunnel?
         `jax.experimental.serialize_executable.serialize` the compiled
         bench program to .jax_cache/aot/, then (in --load mode, a fresh
         process) deserialize_and_load + run one step, timing every phase.
         A working round-trip caps every future cold start at
         deserialize-time instead of Mosaic-compile-time.

Usage:
    python scripts/compile_probe.py key [--tag A]
    python scripts/compile_probe.py split
    python scripts/compile_probe.py aot --save
    python scripts/compile_probe.py aot --load
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
_CACHE = os.path.join(_REPO, ".jax_cache")
_OUT = os.path.join(_REPO, ".jax_cache", "probe")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402


def _bench_program(h=512, w=512, octaves=6, use_pallas=True):
    """The exact computation bench.py's pallas child compiles."""
    from gpgpuraytrace_tpu.models.scene import RenderConfig, default_scene
    from gpgpuraytrace_tpu.ops.fit import partition_scene
    from gpgpuraytrace_tpu.ops.render import render

    scene = default_scene(num_octaves=octaves)
    cfg = RenderConfig(height=h, width=w, max_steps=128, num_octaves=octaves,
                       use_pallas=use_pallas)
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
            return acc + v + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    args = (leaves, jnp.int32(1), jnp.float32(900.0))
    return run, args, (scene, cfg, leaves, merge)


def _sha(b) -> str:
    if isinstance(b, str):
        b = b.encode()
    return hashlib.sha256(b).hexdigest()[:16]


def cmd_key(tag: str) -> None:
    os.makedirs(_OUT, exist_ok=True)
    run, args, _ = _bench_program()
    t0 = time.perf_counter()
    lowered = run.lower(*args)
    t_lower = time.perf_counter() - t0

    stablehlo = lowered.as_text()
    report = {"tag": tag, "lower_s": round(t_lower, 2),
              "stablehlo_sha": _sha(stablehlo),
              "stablehlo_len": len(stablehlo)}

    # The serialized HLO proto is what the compilation-cache key hashes.
    try:
        hlo = lowered.compiler_ir("hlo")
        proto = hlo.as_serialized_hlo_module_proto()
        report["hlo_proto_sha"] = _sha(proto)
        report["hlo_proto_len"] = len(proto)
    except Exception as e:  # noqa: BLE001 — report, don't die
        report["hlo_proto_err"] = repr(e)

    # Mosaic custom-call payloads, individually: find WHICH one varies.
    import re
    payloads = re.findall(
        r'tpu_custom_call.*?backend_config\s*=\s*"((?:[^"\\]|\\.)*)"',
        stablehlo,
    )
    if not payloads:
        # stablehlo text may carry the kernel as a nested module attribute
        payloads = re.findall(r'kernel_body\s*=\s*"((?:[^"\\]|\\.)*)"', stablehlo)
    report["mosaic_payloads"] = [
        {"sha": _sha(p), "len": len(p)} for p in payloads
    ]

    # JAX's actual cache key, via the internal helper if it exists.
    try:
        from jax._src import cache_key as ck
        from jax._src import compiler as jcompiler  # noqa: F401
        backend = jax.devices()[0].client
        exe_devices = None
        compile_options = None
        # get_compile_options signature churn — best-effort.
        try:
            compile_options = jax._src.compiler.get_compile_options(
                num_replicas=1, num_partitions=1
            )
        except Exception:  # noqa: BLE001
            pass
        if compile_options is not None:
            key = ck.get(hlo, exe_devices or jax.devices(), compile_options, backend)
            report["jax_cache_key"] = key
    except Exception as e:  # noqa: BLE001
        report["jax_cache_key_err"] = repr(e)[:200]

    path = os.path.join(_OUT, f"stablehlo_{tag}.mlir")
    with open(path, "w") as f:
        f.write(stablehlo)
    report["dump"] = path
    print(json.dumps(report))


def cmd_split() -> None:
    from gpgpuraytrace_tpu.ops.render import render

    out = {"backend": jax.default_backend()}

    # 1. fwd-only pallas render, 512².
    run_fwd, a_fwd, (scene, cfg, leaves, merge) = _bench_program()

    def timed_compile(name, fn, args):
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(*args) if not hasattr(fn, "lower") else fn.lower(*args)
        t1 = time.perf_counter()
        compiled = lowered.compile()
        t2 = time.perf_counter()
        out[name] = {"lower_s": round(t1 - t0, 2), "compile_s": round(t2 - t1, 2)}
        print(f"  {name}: lower {t1-t0:.1f}s compile {t2-t1:.1f}s", file=sys.stderr)
        return compiled

    fwd = lambda s: render(s, cfg)  # noqa: E731
    timed_compile("fwd_pallas_512", fwd, (scene,))

    # 2. fwd+bwd value_and_grad (single step, no fori wrapper).
    import jax.numpy as jnp

    def loss(leaves):
        img = render(merge(leaves), cfg)
        return jnp.mean(img * img)

    vg = jax.value_and_grad(loss)
    timed_compile("fwd_bwd_512", vg, (leaves,))

    # 3. the full bench fori_loop wrapper.
    timed_compile("bench_wrapper_512", run_fwd, a_fwd)
    print(json.dumps(out))


def cmd_aot(save: bool, load: bool) -> None:
    from jax.experimental import serialize_executable as se

    aot_dir = os.path.join(_CACHE, "aot")
    os.makedirs(aot_dir, exist_ok=True)
    path = os.path.join(aot_dir, "bench_512x512x6.bin")
    run, args, _ = _bench_program()
    out = {"backend": jax.default_backend()}

    import pickle

    trees_path = path + ".trees"
    if save:
        t0 = time.perf_counter()
        lowered = run.lower(*args)
        t1 = time.perf_counter()
        compiled = lowered.compile()
        t2 = time.perf_counter()
        payload, in_tree, out_tree = se.serialize(compiled)
        t3 = time.perf_counter()
        with open(path, "wb") as f:
            f.write(payload)
        # The call trees come back from serialize(); persist them so the
        # loading process never has to reconstruct (or re-lower) anything.
        with open(trees_path, "wb") as f:
            pickle.dump((in_tree, out_tree), f)
        out.update({"lower_s": round(t1 - t0, 2),
                    "compile_s": round(t2 - t1, 2),
                    "serialize_s": round(t3 - t2, 2),
                    "bytes": len(payload), "path": path})
        # Smoke: run the compiled executable once.
        t4 = time.perf_counter()
        r = compiled(*args)
        out["first_run_s"] = round(time.perf_counter() - t4, 2)
        out["value"] = float(jax.device_get(r))
    if load:
        _, args2, _ = _bench_program()
        t0 = time.perf_counter()
        with open(path, "rb") as f:
            payload = f.read()
        with open(trees_path, "rb") as f:
            in_tree, out_tree = pickle.load(f)
        t1 = time.perf_counter()
        compiled = se.deserialize_and_load(payload, in_tree, out_tree)
        t2 = time.perf_counter()
        r = compiled(*args2)
        v = float(jax.device_get(r))
        t3 = time.perf_counter()
        out.update({"read_s": round(t1 - t0, 2),
                    "deserialize_s": round(t2 - t1, 2),
                    "first_run_s": round(t3 - t2, 2), "value": v})
    print(json.dumps(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["key", "split", "aot"])
    ap.add_argument("--tag", default="A")
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--load", action="store_true")
    a = ap.parse_args()
    if a.mode == "key":
        cmd_key(a.tag)
    elif a.mode == "split":
        cmd_split()
    else:
        cmd_aot(a.save, a.load)


if __name__ == "__main__":
    main()
