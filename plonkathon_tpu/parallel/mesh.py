"""Device mesh helpers for multi-chip execution.

The reference is strictly single-process with no parallelism of any kind
(SURVEY §2: no DP/TP/PP/SP, no comms backend); this subsystem is new,
TPU-native design: a named `jax.sharding.Mesh` over ICI with collectives
(`all_to_all` for NTT stage exchange, `all_gather` for MSM partial sums)
expressed inside `shard_map` partitions.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    """A 1-D mesh over the first `n_devices` local devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices <= len(devices), (
        f"requested {n_devices} devices, only {len(devices)} visible"
    )
    return Mesh(np.array(devices[:n_devices]), (axis,))
