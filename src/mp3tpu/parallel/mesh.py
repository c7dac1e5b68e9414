"""Device mesh + stream-axis sharding (SURVEY.md §2.4 P2/P6).

MP3 streams are mutually independent, so the multi-chip strategy is
pure stream-axis data parallelism over a 1-D mesh: shard every [S, ...]
array on axis 0, let XLA place the per-stream pipelines, and reduce
only metrics/final gathers over ICI. No other collectives exist in the
steady state — by construction, not by accident.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_stream_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)} "
                f"(hint: XLA_FLAGS=--xla_force_host_platform_device_count=N)")
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.asarray(devs), axis_names=("streams",))


def stream_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("streams"))


def shard_batch(mesh: Mesh, arrays):
    """device_put every [S, ...] array sharded on the stream axis."""
    sh = stream_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), arrays)
