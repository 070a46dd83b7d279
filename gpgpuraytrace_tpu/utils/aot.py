"""AOT executable cache: serialize compiled XLA executables to disk and
restore them in a fresh process, skipping lowering AND compilation.

Why this exists (ARCHITECTURE.md "Cold-start anatomy"): through the remote-
TPU tunnel a cold CLI start pays ~4 s of lowering plus ~1–10 s of
(cache-hit) compile; `scripts/compile_probe.py aot` validated that
`jax.experimental.serialize_executable` round-trips the compiled bench
program (2.6 MB) and a fresh process deserializes + runs it in ~0.1 s,
bit-identical. This module wires that validated path behind an opt-in flag
(VERDICT r3 item 8): `cli render --aot-cache` / `BENCH_AOT=1 bench.py`.

Cache key: jax version + backend + device kind + the static config repr +
the dynamic-argument tree structure/shapes/dtypes. Anything that changes
the compiled program must be in the key; scene VALUES are runtime arguments
and deliberately are not.

Failure policy: best-effort. Any error (stale format after a jax upgrade,
different device, corrupt file) falls back to the normal jit path and
repopulates the cache — the flag can never break a render.
"""

from __future__ import annotations

import hashlib
import os
import pickle

import jax


def _cache_key(static_desc: str, args) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(args)
    shapes = [(jax.numpy.asarray(x).shape, str(jax.numpy.asarray(x).dtype))
              for x in leaves]
    dev = jax.devices()[0]
    raw = "|".join([
        jax.__version__,
        jax.default_backend(),
        getattr(dev, "device_kind", str(dev)),
        static_desc,
        str(treedef),
        str(shapes),
    ])
    return hashlib.sha1(raw.encode()).hexdigest()[:20]


def load_or_compile(jitted, args, static_desc: str, cache_dir: str):
    """Return (compiled_callable, status) for ``jitted`` at ``args``.

    ``jitted`` is a jax.jit-wrapped function; static arguments must be baked
    already (functools.partial / static_argnums closed over) so that
    ``jitted.lower(*args)`` and ``compiled(*args)`` agree on the signature.
    status is "aot-restored" (deserialized from disk, no lower/compile) or
    "compiled+saved" (normal path; the executable was serialized for next
    time) or "compiled (aot failed: …)".
    """
    from jax.experimental import serialize_executable as se

    key = _cache_key(static_desc, args)
    aot_dir = os.path.join(cache_dir, "aot")
    path = os.path.join(aot_dir, f"{key}.bin")
    trees = path + ".trees"
    if os.path.exists(path) and os.path.exists(trees):
        try:
            with open(path, "rb") as f:
                payload = f.read()
            with open(trees, "rb") as f:
                in_tree, out_tree = pickle.load(f)
            return se.deserialize_and_load(payload, in_tree, out_tree), \
                "aot-restored"
        except Exception as e:  # noqa: BLE001 — stale/corrupt → recompile
            note = f"stale aot cache ({type(e).__name__}); recompiling"
        else:  # pragma: no cover
            note = ""
    else:
        note = None
    compiled = jitted.lower(*args).compile()
    try:
        payload, in_tree, out_tree = se.serialize(compiled)
        os.makedirs(aot_dir, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        with open(trees + ".tmp", "wb") as f:
            pickle.dump((in_tree, out_tree), f)
        os.replace(trees + ".tmp", trees)
        status = "compiled+saved"
    except Exception as e:  # noqa: BLE001 — serialization is best-effort
        status = f"compiled (aot save failed: {type(e).__name__})"
    if note:
        status += f" [{note}]"
    return compiled, status
