"""Device mesh setup and sharding helpers.

The reference's only parallelism is single-process nn.DataParallel
(segmentation/utils/unets.py:50-51). The TPU-native story is a
jax.sharding.Mesh over ICI with named axes:

  "data"    — batch data parallelism for training (gradients psum over ICI)
  "spatial" — tile-grid parallelism for whole-slide inference (each chip owns
              a stripe of tiles; see infer/sliding_window.py)

All entry points work on a 1-device mesh unchanged, and the same code runs
on a virtual N-device CPU mesh in tests.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize multi-host JAX (DCN) for multi-host slices (e.g. v5e-16).

    On TPU pods with standard env vars, jax.distributed.initialize() is
    auto-configured; explicit args support manual setups. Safe to call on
    single-host (no-op on failure)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception as e:  # single-host / already initialized
        if num_processes and num_processes > 1:
            raise
        print(f"jax.distributed not initialized (single host): {e}")


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch sharded along its leading dim over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params / opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
