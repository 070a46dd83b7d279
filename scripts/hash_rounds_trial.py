"""Hash-finalizer round-reduction trial (VERDICT r4 item 5, phase 2).

The march is issue-bound per executed step; after the round-5 exact
transforms (shared corner-hash bases, deferred gradient normalization,
fused rotation×frequency) the biggest remaining op block is the murmur
finalizer: 5 stages (xs16, mul, xs13, mul, xs16) ≈ 8 int ops per corner ×
4 corners × 6 octaves ≈ 190/step. This trial measures a 2-stage variant

    h ^= h >> 16;  h *= C1        (then gradient bits decoded from h >> 16,
                                   where the multiply has mixed every input
                                   bit — the LOW product bits are nearly
                                   the input's and must not be used)

worth ~5 int ops/corner ≈ 120/step (~11%), TOGETHER with its quality
gates, in one run:

* direction-histogram uniformity over 256² lattice cells (all 8 directions
  within 5% of uniform — the suite's isotropy bar);
* second moment E[g gᵀ] = I/2 within 2%;
* adjacent-cell direction correlation (the failure mode of a weak hash:
  neighboring cells agreeing) vs the full mix's own correlation;
* dense-oracle image quality at the bench terrain (the fast hash makes a
  DIFFERENT terrain, so it is compared against its own 1024-step oracle —
  holes / off-pixels at the default-march levels);
* fixed-mode ladder + chunked forward speed, same session as the stock
  numbers printed first.

The patch routes through module globals exactly like grad_norm_trial:
noise2*/noise3* resolve _mix and the _grad*_raw decoders at trace time, so
one patch covers the XLA and Pallas paths consistently.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gpgpuraytrace_tpu.models.scene import RenderConfig, default_scene
from gpgpuraytrace_tpu.ops import noise as noise_mod

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

_lsr = jax.lax.shift_right_logical


# Since round 5 the 2-stage finalizer IS the default (_mix); this trial
# now reconstructs the FULL murmur finalizer + low-bit decode (the
# round-3/4 design, bit-identical to the pre-adoption terrain) as the
# comparison leg. The original adoption measurement ran the other way
# around (fast candidate patched over the full-mix default) and recorded:
# march step 0.1741 -> 0.1526 ns/ray (-12.3%), chunked forward 1.916 ->
# 1.60 ms (+20%, alternating same-process reps), quality gates clean.


def full_mix(h):
    h = h ^ _lsr(h, 16)
    h = h * noise_mod._C1
    h = h ^ _lsr(h, 13)
    h = h * noise_mod._C2
    h = h ^ _lsr(h, 16)
    return h


class patched:
    """Installs the round-3 full-mix/low-bit-decode noise design."""

    def __enter__(self):
        self.saved = (noise_mod._mix, noise_mod._GRAD_SHIFT)
        noise_mod._mix = full_mix
        noise_mod._GRAD_SHIFT = 0
        # kernels/trace.py imports noise2/noise2_value by value, but those
        # functions resolve _mix/_GRAD_SHIFT through the module at TRACE
        # time, so the patch reaches the Pallas kernels too. Callers must
        # jit through FRESH lambdas (jax's tracing cache is keyed on the
        # function object — see oracle_quality).
        return self

    def __exit__(self, *exc):
        noise_mod._mix, noise_mod._GRAD_SHIFT = self.saved


def direction_stats():
    """Uniformity + isotropy + adjacent-cell correlation of the (patched or
    stock) gradient decode over a 256² lattice."""
    ix, iz = jnp.meshgrid(
        jnp.arange(-128, 128), jnp.arange(-128, 128), indexing="ij"
    )
    h = noise_mod._mix(
        ix.astype(jnp.int32) * noise_mod._KX
        + iz.astype(jnp.int32) * noise_mod._KZ
        + jnp.int32(7) * noise_mod._KY
    )
    gx, gz = noise_mod._grad2_raw(h)
    gx = np.asarray(gx) * noise_mod._INV_SQRT5
    gz = np.asarray(gz) * noise_mod._INV_SQRT5
    # 8-direction code: sign bits + axis choice.
    code = (
        (np.asarray(gx) > 0).astype(int)
        + 2 * (np.asarray(gz) > 0).astype(int)
        + 4 * (np.abs(np.asarray(gx)) > np.abs(np.asarray(gz))).astype(int)
    )
    counts = np.bincount(code.ravel(), minlength=8)
    uniform_dev = float(np.abs(counts / counts.mean() - 1.0).max())
    m_xx = float((gx * gx).mean())
    m_zz = float((gz * gz).mean())
    m_xz = float((gx * gz).mean())
    # Adjacent-cell agreement (same direction code as right neighbor):
    # 1/8 = 0.125 for an ideal hash.
    agree_x = float((code[:, :-1] == code[:, 1:]).mean())
    agree_z = float((code[:-1, :] == code[1:, :]).mean())
    return {
        "uniform_max_dev": round(uniform_dev, 4),
        "ggT": [round(m_xx, 4), round(m_zz, 4), round(m_xz, 5)],
        "adjacent_agree": [round(agree_x, 4), round(agree_z, 4)],
    }


def oracle_quality(n=256, octaves=4):
    """Default-march holes/off-pixels vs this terrain's own dense oracle
    (same method as tests/test_quality.py, any backend)."""
    from gpgpuraytrace_tpu.ops.camera import generate_rays
    from gpgpuraytrace_tpu.ops.march import march_with_stats

    scene = default_scene(num_octaves=octaves)
    o, d = generate_rays(scene.camera, n, n)
    base = dict(height=n, width=n, num_octaves=octaves, use_pallas=False)
    # prime_ds=0 both sides: the hash oracle isolates the HASH variable;
    # since priming became the default (round 5) these would auto-prime.
    gt = RenderConfig(**base, max_steps=1024, step_relax=0.35,
                      step_floor_t=0.0, prime_ds=0)

    def fresh_jit():
        # A NEW lambda per call: jax's global tracing cache is keyed on the
        # function object, so jitting march_with_stats directly would reuse
        # the STOCK trace and silently ignore the monkeypatch (caught in
        # this trial's first run: patched and stock oracle counts were
        # bit-identical).
        return jax.jit(lambda c, o, d, ns: march_with_stats(c, o, d, ns),
                       static_argnums=0)

    t_gt, hit_gt, _ = fresh_jit()(gt, o, d, scene.noise)
    cfg = RenderConfig(**base, max_steps=128, prime_ds=0)
    t, hit, _ = fresh_jit()(cfg, o, d, scene.noise)
    t_gt, hit_gt = np.asarray(t_gt), np.asarray(hit_gt)
    t, hit = np.asarray(t), np.asarray(hit)
    both = hit_gt & hit
    return {
        "holes": int((hit_gt & ~hit).sum()),
        "t_off": int((np.abs(t - t_gt)[both] > 0.05).sum()),
        "of_px": n * n,
    }


def speed(size, octaves):
    from scripts.perf_sweep import time_cfg

    base = dict(height=size, width=size, num_octaves=octaves,
                use_pallas=True, tile_h=16)
    f64 = time_cfg(RenderConfig(**base, max_steps=64, march_mode="fixed"))
    f128 = time_cfg(RenderConfig(**base, max_steps=128, march_mode="fixed"))
    ch = time_cfg(RenderConfig(**base, max_steps=128))
    return {
        "fixed64_ms": f64["ms_per_frame"],
        "fixed128_ms": f128["ms_per_frame"],
        "ns_per_ray_per_step": round(
            (f128["ms_per_frame"] - f64["ms_per_frame"]) * 1e6
            / 64.0 / (size * size), 4),
        "chunked_fwd_mrays": ch["mrays_per_sec"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--octaves", type=int, default=6)
    ap.add_argument("--skip-speed", action="store_true")
    args = ap.parse_args()
    on_tpu = jax.default_backend() == "tpu"

    out = {"backend": jax.default_backend()}
    out["fast2_default"] = {"stats": direction_stats(),
                            "oracle": oracle_quality()}
    if on_tpu and not args.skip_speed:
        out["fast2_default"]["speed"] = speed(args.size, args.octaves)
    with patched():
        out["full3_round3"] = {"stats": direction_stats(),
                               "oracle": oracle_quality()}
        if on_tpu and not args.skip_speed:
            out["full3_round3"]["speed"] = speed(args.size, args.octaves)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
