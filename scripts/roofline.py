"""Speed-of-light analysis for the fused march kernels (VERDICT round-1
item 5; BASELINE.json:5 "at speed-of-light per chip").

Three measurements, one conclusion:

1. **VPU peak on THIS chip** — a Pallas microbenchmark of chained f32 FMAs
   on (8,128)-aligned tiles (the march is elementwise VPU work; the MXU is
   irrelevant to a ray marcher). This is the empirical "speed of light",
   no datasheet guessing.
2. **Ops per ray** — counted from the actual jaxprs of the kernel's field
   functions (value path, derivative path, shade) weighted per element,
   times the measured march-step distribution (march_with_stats) at the
   bench config. Two numbers fall out:
     * useful ops/ray  (per-lane steps — what the physics needs)
     * executed ops/ray (whole-tile chunked march: every lane pays the
       tile's max step count rounded up to CHUNK — the SIMD divergence tax)
3. **Achieved ops/s** — measured Mrays/s × executed ops/ray, as a fraction
   of (1).

    python scripts/roofline.py             # uses the attached backend
    python scripts/roofline.py --mrays 99  # score an externally measured rate

Emits one JSON line; prose goes to stderr.
"""

from __future__ import annotations

import argparse
import functools
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

# Per-element issue-slot weights for VPU elementwise primitives. Almost all
# march-loop ops (add/mul/xor/shift/and/floor/convert/min/max/select) are
# single-slot; mul+add pairs may fuse to FMA (we count them separately, so
# the "peak" comparison is conservative for the kernel). Transcendentals go
# through the special-function path; rsqrt ≈ 1 approx op + 1 Newton
# iteration ≈ 4 slots (assumption, stated in the output).
_WEIGHTS = {
    "rsqrt": 4.0,
    "exp": 4.0,
    "log": 4.0,
    "sin": 4.0,
    "cos": 4.0,
    "integer_pow": 2.0,
    "div": 2.0,
}
_ZERO_COST = {
    "broadcast_in_dim", "reshape", "squeeze", "slice", "concatenate",
    "transpose", "copy", "convert_element_type_noop", "stop_gradient",
    "custom_jvp_call", "custom_vjp_call", "pjit",
}


def _count_jaxpr(jaxpr, consts_shape_elems) -> float:
    """Total per-element op slots in a (closed) jaxpr, recursing into calls."""
    total = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        inner = None
        for k in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
            if k in eqn.params:
                inner = eqn.params[k]
                break
        if inner is not None:
            cj = inner.jaxpr if hasattr(inner, "jaxpr") else inner
            total += _count_jaxpr(cj, consts_shape_elems)
            continue
        if prim in _ZERO_COST:
            continue
        elems = max(
            (int(np.prod(v.aval.shape)) for v in eqn.outvars if hasattr(v, "aval")),
            default=1,
        )
        if elems < consts_shape_elems:
            # scalar/broadcast bookkeeping — negligible next to tile ops
            continue
        total += _WEIGHTS.get(prim, 1.0) * elems
    return total


def ops_per_call(fn, *args) -> float:
    """Op slots per element for fn evaluated on (8,128) f32 tiles."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    elems = 8 * 128
    return _count_jaxpr(jaxpr.jaxpr, elems) / elems


def count_kernel_ops(cfg, scene):
    """Per-ray op accounting from the kernel's own building blocks."""
    from gpgpuraytrace_tpu.kernels.trace import _field_fns, _raygen, _shade_tile
    from gpgpuraytrace_tpu.utils import packing as pk

    packed, seed = pk.pack_scene(scene, cfg.height, cfg.width, 0.0)
    theta = tuple(packed[0, k] for k in range(packed.shape[1]))
    sc = lambda k: theta[k]  # noqa: E731
    tile = jnp.ones((8, 128), jnp.float32)
    i = jnp.int32(0)

    def fwd_value_step(t):
        o, d = _raygen(sc, cfg, 8, i, i)
        _, field_at = _field_fns(sc, seed[0, 0], cfg, o, d)
        return field_at(t)

    def fwd_grad_eval(t):
        o, d = _raygen(sc, cfg, 8, i, i)
        field_grad_at, _ = _field_fns(sc, seed[0, 0], cfg, o, d)
        return field_grad_at(t)

    def shade_eval(t):
        o, d = _raygen(sc, cfg, 8, i, i)
        field_grad_at, _ = _field_fns(sc, seed[0, 0], cfg, o, d)
        return _shade_tile(sc, cfg, t, tile > 0.5, d, field_grad_at)

    def bwd_eval(t):
        # the backward kernel's two pullbacks at the saved t
        def color_of(th, t):
            s = lambda k: th[k]  # noqa: E731
            o, d = _raygen(s, cfg, 8, i, i)
            fga, _ = _field_fns(s, seed[0, 0], cfg, o, d)
            return _shade_tile(s, cfg, t, tile > 0.5, d, fga)

        _, pull = jax.vjp(color_of, theta, t)
        th_bar, t_bar = pull((tile, tile, tile))

        def f_of(th):
            s = lambda k: th[k]  # noqa: E731
            o, d = _raygen(s, cfg, 8, i, i)
            _, fat = _field_fns(s, seed[0, 0], cfg, o, d)
            return fat(t)

        _, pull2 = jax.vjp(f_of, theta)
        (th_bar2,) = pull2(t_bar)
        return th_bar, th_bar2

    return {
        "value_step": ops_per_call(fwd_value_step, tile),  # march step field
        "grad_eval": ops_per_call(fwd_grad_eval, tile),  # Newton/shade eval
        "shade": ops_per_call(shade_eval, tile),
        "bwd_total": ops_per_call(bwd_eval, tile),
    }


# ---------------------------------------------------------------------------
# Mosaic-module op counting (round-2 VERDICT item 7: replace naive jaxpr slot
# counts with counts from the actual lowered Mosaic kernel). The fwd Pallas
# program is lowered (seconds, now that scene constants live on host — see
# ops/fit.py:partition_scene), the Mosaic custom-call payload is extracted
# from the StableHLO, parsed with jaxlib's MLIR bindings, and vector-typed
# compute ops are counted per region: per-march-step (the scf.for body inside
# the chunk scf.while), per-Newton-iteration (the refine scf.for body), and
# straight-line (raygen + bracket setup + final eval + shade).
#
# What this does and does not claim: the payload is the module Mosaic
# *receives* — constants, broadcasts and shape casts are excluded as
# hoistable/free, and an FMA-paired lower bound (every mulf paired with one
# add/sub) is reported alongside the naive count. Mosaic's own scheduling can
# still shave ops, so treat [fma_paired, naive] as a bracket on the issued
# vector-op stream.
# ---------------------------------------------------------------------------

_MOSAIC_FREE = ("constant", "broadcast", "shape_cast", "extract", "splat")


def _mosaic_payloads(stablehlo_text: str):
    import base64
    import re

    bodies = re.findall(
        r'\\22body\\22:\s*\\22([A-Za-z0-9+/=]+)\\22', stablehlo_text
    )
    if not bodies:  # unescaped variant (older serialization)
        bodies = re.findall(
            r'"body":\s*"([A-Za-z0-9+/=]+)"', stablehlo_text
        )
    return [base64.b64decode(b) for b in bodies]


def _count_region(op, weights) -> dict:
    """Vector-typed compute ops under ``op`` (recursing, skipping nested
    scf/func wrappers), as {naive, fma_paired, mulf, addsub}."""
    cnt = {"naive": 0.0, "mulf": 0, "addsub": 0}

    def rec(o):
        for r in o.regions:
            for blk in r.blocks:
                for inner in blk.operations:
                    name = inner.name.replace("stable_mosaic.", "")
                    if name.startswith(("scf.", "func.")):
                        rec(inner)
                        continue
                    if not any(
                        "vector" in str(res.type) for res in inner.results
                    ):
                        continue
                    if any(f in name for f in _MOSAIC_FREE):
                        continue
                    leaf = name.split(".")[-1]
                    cnt["naive"] += weights.get(leaf, 1.0)
                    if leaf == "mulf":
                        cnt["mulf"] += 1
                    elif leaf in ("addf", "subf"):
                        cnt["addsub"] += 1
                    rec(inner)
    rec(op)
    cnt["fma_paired"] = cnt["naive"] - min(cnt["mulf"], cnt["addsub"])
    return cnt


def _for_trip_count(for_op):
    """Static trip count of an scf.for, if its bounds are constants."""
    try:
        bounds = []
        for operand in list(for_op.operands)[:3]:
            owner = operand.owner
            attr = dict(owner.attributes)["value"]
            bounds.append(int(str(attr).split(":")[0].strip()))
        lo, hi, step = bounds
        return max(0, (hi - lo + step - 1) // step)
    except Exception:  # noqa: BLE001 — dynamic bounds
        return None


def count_mosaic_ops(cfg, scene) -> dict:
    """Parse the fwd kernel's Mosaic module; returns per-region op counts.

    Weights: rsqrt 4 slots (approx + Newton), everything else 1 — same
    convention as the jaxpr counter so the two are comparable.
    """
    from jax._src.interpreters.mlir import ir

    from gpgpuraytrace_tpu.ops.render import render

    lowered = jax.jit(lambda s: render(s, cfg)).lower(scene)
    payloads = _mosaic_payloads(lowered.as_text())
    if not payloads:
        return {"error": "no mosaic payload found (not a pallas lowering?)"}
    weights = {"rsqrt": 4.0, "exp": 4.0, "log": 4.0, "powf": 4.0, "divf": 2.0}

    with ir.Context() as ctx:
        ctx.allow_unregistered_dialects = True
        m = ir.Module.parse(payloads[0])
        funcs = [o for o in m.body.operations if "func" in o.name]
        blk = list(funcs[0].regions[0].blocks[0].operations)
        whiles = [o for o in blk if o.name.endswith("scf.while")]
        fors = [o for o in blk if o.name.endswith("scf.for")]

        out = {"kernel_total": _count_region(funcs[0], weights)["naive"]}
        march_region = None
        newton_region = None
        if whiles:
            # chunked/lod: the march chunk loop is the (last) scf.while; its
            # inner scf.for body is ONE march step.
            march_for = None
            for w in whiles[-1:]:
                for r in w.regions:
                    for b in r.blocks:
                        for o in b.operations:
                            if o.name.endswith("scf.for"):
                                march_for = o
            march_region = march_for
            newton_region = fors[0] if fors else None
        else:
            # fixed mode: two scf.fors — march has trip count max_steps.
            for f in fors:
                if _for_trip_count(f) == cfg.max_steps:
                    march_region = f
                else:
                    newton_region = f
        if march_region is not None:
            out["march_step"] = _count_region(march_region, weights)
        if newton_region is not None:
            out["newton_iter"] = _count_region(newton_region, weights)
            out["newton_trips"] = _for_trip_count(newton_region)
        loops = (march_region, newton_region)
        straight = {"naive": 0.0, "mulf": 0, "addsub": 0}
        for o in blk:
            if o in loops or o.name.endswith(("scf.while", "scf.for")):
                continue
            c = _count_region(o, weights)
            # _count_region on a leaf op counts its children only; count the
            # op itself when it is a vector compute op.
            name = o.name.replace("stable_mosaic.", "")
            leaf = name.split(".")[-1]
            if (
                any("vector" in str(res.type) for res in o.results)
                and not any(f in name for f in _MOSAIC_FREE)
                and not name.startswith(("scf.", "func."))
            ):
                c["naive"] += weights.get(leaf, 1.0)
                if leaf == "mulf":
                    c["mulf"] += 1
                elif leaf in ("addf", "subf"):
                    c["addsub"] += 1
            for k in ("naive", "mulf", "addsub"):
                straight[k] += c[k]
        straight["fma_paired"] = straight["naive"] - min(
            straight["mulf"], straight["addsub"]
        )
        out["straight_line"] = straight
        return out


def measure_fixed_mode_slope(cfg, scene, steps_lo=64, steps_hi=128, reps=8):
    """Marginal march-step cost, measured exactly: render in march_mode
    'fixed' (EVERY lane executes EXACTLY max_steps steps — no early exit, no
    envelope skip, no estimates) at two step counts; the time difference
    divided by the step delta is the pure march-loop cost per step. Combined
    with the Mosaic-counted slots/step this yields a slot throughput built
    from two measurements and one exact static count.

    Timing discipline (same as bench.py): per step count, ONE jitted
    fori_loop executable with a traced trip count and per-iteration salts —
    T(reps) − T(1) cancels the tunnel RTT/dispatch constants, and the salts
    defeat the tunnel's content-addressed (executable, args) replay cache
    (un-salted repeats time the cache, not the device — the bug in the first
    version of this function)."""
    import dataclasses

    from gpgpuraytrace_tpu.ops.render import render

    def per_frame_s(n_steps):
        c = dataclasses.replace(cfg, march_mode="fixed", max_steps=n_steps)

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
                return acc + jnp.mean(render(s, c))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(run(scene, 1, jnp.float32(900.0)))  # compile+warm

        def timed(n, salt):
            t0 = time.perf_counter()
            float(run(scene, n, jnp.float32(salt)))
            return time.perf_counter() - t0

        timed(reps, 800.0)
        t_k = min(timed(reps, 100.0 * r) for r in range(1, 4))
        t_1 = min(timed(1, 100.0 * r + 50.0) for r in range(1, 4))
        return max(t_k - t_1, 1e-12) / (reps - 1)

    t_lo = per_frame_s(steps_lo)
    t_hi = per_frame_s(steps_hi)
    n_rays = cfg.height * cfg.width
    per_ray_per_step = max(t_hi - t_lo, 1e-12) / (steps_hi - steps_lo) / n_rays
    return {
        "frame_lo_ms": round(t_lo * 1e3, 3),
        "frame_hi_ms": round(t_hi * 1e3, 3),
        "steps": [steps_lo, steps_hi],
        "sec_per_ray_per_step": per_ray_per_step,
    }


def measure_vpu_peak():
    """Empirical VPU f32 FMA-stream rate: ``CHAINS`` independent FMA chains
    per loop iteration, each a (TH, TW) tile, ``UNROLL`` dependent steps per
    chain per iteration.

    Interpretation caveats, measured in round 3 (a parameter sweep lives in
    the session logs; BASELINE.md carries the numbers):

    * The original (8 chains × (64,128) tiles) configuration held 64 VREGs
      live and register-spilled — it measured 1.6–1.8 Tflops/s, which the
      march kernel itself disproves (it sustains 5.2 T counted lane-ops/s).
      The current shape (24 chains × (8,128), unroll 4) measured best:
      ~2.0 T FMA-slots/s = 4.1 Tflops/s.
    * A homogeneous stream UNDER-measures the chip: pure-FMA peaks at
      ~2.0 T slots/s and pure single-op float at ~3.3 T ops/s, yet the
      march's mixed float/int stream sustains ~5.2 T ops/s — the VPU
      multi-issues across op classes, so treat this function's number as a
      lower bound on the issue ceiling (theoretical: 4 ALUs x 1024 lanes x
      ~1.5-1.67 GHz = 6.1-6.8 T ops/s).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ITERS = 512
    CHAINS = 24
    UNROLL = 4
    TH, TW = 8, 128
    GRID = 512

    def kernel(x_ref, n_ref, o_ref):
        xs = [x_ref[:, :] * jnp.float32(1.0 + 1e-6 * c) for c in range(CHAINS)]
        a = jnp.float32(1.0000001)
        b = jnp.float32(1e-7)

        def body(_, xs):
            for _ in range(UNROLL):
                xs = tuple(x * a + b for x in xs)
            return xs

        xs = jax.lax.fori_loop(0, ITERS * n_ref[0, 0], body, tuple(xs))
        acc = xs[0]
        for x in xs[1:]:
            acc = acc + x
        o_ref[:, :] = acc

    @jax.jit
    def run(x, n):
        out = pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((TH, TW), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((TH, TW), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((TH * GRID, TW), jnp.float32),
        )(x, n)
        return jnp.sum(out)  # scalar: the host fetch is one RTT

    # Trip-count differencing with value-fetch sync: through the TPU
    # tunnel, block_until_ready can no-op on cache-loaded executables and
    # a full-array pull is bandwidth-bound; T(4R) - T(R) on a traced
    # repeat count cancels both the RTT and the fixed launch cost.
    def timed(reps, salt):
        n = jnp.full((1, 1), reps, jnp.int32)
        x = jnp.full((TH * GRID, TW), 1.0 + 1e-9 * salt, jnp.float32)
        jax.block_until_ready((n, x))
        t0 = time.perf_counter()
        float(run(x, n))
        return time.perf_counter() - t0

    timed(1, 0.0)  # compile + warm
    timed(8, 1.0)
    # Tunnel timing variance is large (independent runs of the old
    # min-of-3 T(4)-T(1) estimator spread 1.6-12 Tflops); a wider trip-count
    # delta and more repetitions squeeze the spread to the point where the
    # march kernel's own measured throughput bounds the answer from below.
    t8 = min(timed(8, 10.0 * r) for r in range(1, 6))
    t1 = min(timed(1, 10.0 * r + 5.0) for r in range(1, 6))
    dt = max(t8 - t1, 1e-9) / 7.0  # per ITERS-block
    flops = 2.0 * ITERS * UNROLL * CHAINS * TH * TW * GRID  # fma = 2 flops
    return flops / dt


def _timed(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def march_step_stats(cfg, scene):
    """Per-lane and tile-executed step statistics at the bench config."""
    from gpgpuraytrace_tpu.models.scene import RenderConfig
    from gpgpuraytrace_tpu.ops.camera import generate_rays
    from gpgpuraytrace_tpu.ops.march import march_with_stats
    from gpgpuraytrace_tpu.kernels.trace import CHUNK, TILE_W
    import dataclasses

    # prime_ds=0: this is the divergence-tax anatomy of the RAW march (the
    # roofline's per-step analysis is prime-independent); the primed
    # shipping stats live in bench.py's stats child / utils.march_stats.
    xcfg = dataclasses.replace(cfg, use_pallas=False, prime_ds=0)
    o, d = generate_rays(scene.camera, cfg.height, cfg.width)
    _, hit, steps = jax.jit(
        lambda o, d: march_with_stats(xcfg, o, d, scene.noise)
    )(o, d)
    steps = np.asarray(steps)
    th = cfg.tile_h
    tiles = steps.reshape(
        cfg.height // th, th, cfg.width // TILE_W, TILE_W
    ).transpose(0, 2, 1, 3)
    tile_max = tiles.max(axis=(2, 3))
    executed = np.ceil(np.maximum(tile_max, 1) / CHUNK) * CHUNK
    return {
        "steps_mean": float(steps.mean()),
        "steps_p99": float(np.percentile(steps, 99)),
        "hit_rate": float(np.asarray(hit).mean()),
        "tile_exec_steps_mean": float(executed.mean()),
        "divergence_tax": float(executed.mean() / max(steps.mean(), 1e-9)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--octaves", type=int, default=6)
    ap.add_argument("--mrays-fwd", type=float, default=None,
                    help="measured forward Mrays/s to score (else skip)")
    ap.add_argument("--mrays-fwdbwd", type=float, default=None)
    ap.add_argument("--mosaic-ops", action="store_true",
                    help="firmed roofline: count slots from the lowered "
                    "Mosaic module and measure the fixed-mode march slope "
                    "(two measurements + one exact count, no jaxpr model)")
    args = ap.parse_args()

    from gpgpuraytrace_tpu.models.scene import RenderConfig, default_scene

    cfg = RenderConfig(
        height=args.size, width=args.size, max_steps=128,
        num_octaves=args.octaves,
    )
    scene = default_scene(num_octaves=args.octaves)

    if args.mosaic_ops:
        mos = count_mosaic_ops(cfg, scene)
        print(f"mosaic op counts: {mos}", file=sys.stderr)
        out = {"metric": "mosaic_roofline",
               "config": f"{args.size}x{args.size}x{args.octaves}oct",
               "mosaic_ops": mos}
        if jax.default_backend() == "tpu":
            slope = measure_fixed_mode_slope(cfg, scene)
            peak = measure_vpu_peak()
            out["fixed_mode_slope"] = slope
            out["vpu_peak_tops"] = round(peak / 1e12, 3)
            ms = mos.get("march_step", {})
            if ms and slope["sec_per_ray_per_step"] > 0:
                thr_naive = ms["naive"] / slope["sec_per_ray_per_step"]
                thr_fma = ms["fma_paired"] / slope["sec_per_ray_per_step"]
                peak_slots = peak / 2.0  # 1 issue slot = 1 FMA = 2 flops
                out["march_slot_throughput_tops"] = {
                    "naive": round(thr_naive / 1e12, 3),
                    "fma_paired": round(thr_fma / 1e12, 3),
                }
                out["march_slot_ratio_vs_peak"] = {
                    "naive": round(thr_naive / peak_slots, 3),
                    "fma_paired": round(thr_fma / peak_slots, 3),
                }
        print(json.dumps(out))
        return

    ops = count_kernel_ops(cfg, scene)
    stats = march_step_stats(cfg, scene)
    print(f"op counts/elem: {ops}", file=sys.stderr)
    print(f"march stats: {stats}", file=sys.stderr)

    # Forward ray cost: executed march steps × value-path field + Newton
    # polish (1 + (ITERS-1) grad evals… the kernel does 1 bracket-setup eval,
    # 3 refine evals, 1 final shade eval) + shade blend.
    n_grad_evals = 5.0
    fwd_useful = stats["steps_mean"] * ops["value_step"] + n_grad_evals * ops[
        "grad_eval"
    ] + ops["shade"]
    fwd_exec = stats["tile_exec_steps_mean"] * ops["value_step"] + (
        n_grad_evals * ops["grad_eval"] + ops["shade"]
    )
    bwd_exec = ops["bwd_total"]

    on_tpu = jax.default_backend() == "tpu"
    peak = measure_vpu_peak() if on_tpu else None
    if peak:
        print(f"measured VPU f32 peak: {peak / 1e12:.2f} Tops/s", file=sys.stderr)

    out = {
        "metric": "roofline_ops_per_ray",
        "config": f"{args.size}x{args.size}x{args.octaves}oct",
        "ops": {k: round(v, 1) for k, v in ops.items()},
        "march": stats,
        "fwd_ops_per_ray_useful": round(fwd_useful),
        "fwd_ops_per_ray_executed": round(fwd_exec),
        "bwd_ops_per_ray": round(bwd_exec),
        "vpu_peak_tops": round(peak / 1e12, 3) if peak else None,
    }
    # Interpretation: "slot throughput" = measured rays/s x counted jaxpr
    # slots/ray. The slot count is an UPPER bound on real issued ops (no
    # FMA fusion, no CSE, conservative transcendental weights). A ratio vs
    # the empirical independent-FMA peak ABOVE 1.0 therefore proves only
    # that the naive count OVERESTIMATES issued ops — it is CONSISTENT with
    # compute-bound-at-peak, but a memory- or scheduling-limited kernel
    # under an inflated op model shows the same signature (ADVICE r2). For
    # the firmed measurement, count ops from the lowered Mosaic module
    # instead: `python scripts/roofline.py --mosaic-ops` reports vector-op
    # counts parsed from the actual Mosaic vector IR, shrinking the model
    # gap from ~2.5-3x to the real instruction stream.
    if peak and args.mrays_fwd:
        ach = args.mrays_fwd * 1e6 * fwd_exec
        out["fwd_slot_throughput_tops"] = round(ach / 1e12, 3)
        out["fwd_slot_ratio_vs_fma_peak"] = round(ach / peak, 2)
    if peak and args.mrays_fwdbwd:
        ach = args.mrays_fwdbwd * 1e6 * (fwd_exec + bwd_exec)
        out["fwdbwd_slot_throughput_tops"] = round(ach / 1e12, 3)
        out["fwdbwd_slot_ratio_vs_fma_peak"] = round(ach / peak, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
