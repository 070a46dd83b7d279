"""One process of a multi-process SPMD render/fit job (BASELINE.json:11).

Run directly on each host of a pod slice, or locally via
``parallel.launch.launch_local_processes`` (CPU simulation). Asserts that
the sharded render matches the replicated scene on every process and runs
one sharded fit step with the cross-process grad psum.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("JAX_PLATFORMS", "") != "tpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from gpgpuraytrace_tpu.models.scene import RenderConfig, default_scene
from gpgpuraytrace_tpu.ops.fit import partition_scene
from gpgpuraytrace_tpu.parallel.launch import distributed_context
from gpgpuraytrace_tpu.parallel.mesh import make_mesh
from gpgpuraytrace_tpu.parallel.sharded import (
    make_sharded_fit_step,
    shard_target,
    sharded_render,
)


def main():
    with distributed_context(
        coordinator_address=os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
    ):
        n_dev = len(jax.devices())
        mesh = make_mesh()
        cfg = RenderConfig(
            height=8 * n_dev, width=128, max_steps=8, num_octaves=2, use_pallas=False
        )
        scene = default_scene(2)
        img = jax.block_until_ready(sharded_render(scene, cfg, mesh))

        target = shard_target(jnp.zeros((cfg.height, cfg.width, 3), jnp.float32), mesh)
        leaves, merge = partition_scene(scene)
        tx = optax.adam(1e-2)
        step = make_sharded_fit_step(cfg, mesh, merge, tx)
        leaves, _, loss = step(leaves, tx.init(leaves), target)
        jax.block_until_ready(loss)
        # Full-precision loss (hex) so the launcher/test can assert the
        # psum'd loss is IDENTICAL on every process, not just close.
        print(
            f"proc {jax.process_index()}/{jax.process_count()}: "
            f"{n_dev} devices, render {img.shape}, loss {float(loss):.6f} "
            f"losshex={float(loss).hex()}, OK"
        )


if __name__ == "__main__":
    main()
