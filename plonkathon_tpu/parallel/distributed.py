"""Multi-host (DCN) execution support.

The reference is strictly single-process (SURVEY §5.8: no comms backend of
any kind).  This subsystem provides the TPU-native multi-host story:

* `init_distributed()` wraps `jax.distributed.initialize` — one call per
  host process, after which `jax.devices()` spans every chip in the slice
  and the collectives inside the sharded prover kernels
  (`parallel/sharded.py`) ride ICI within a host and DCN across hosts.
* `make_global_mesh()` builds the 1-D proving mesh over ALL devices in the
  slice (local + remote), with the device order chosen so that
  neighboring shards sit on the same host where possible — the four-step
  NTT's `all_to_all` then keeps most of its traffic on ICI.
* `make_hybrid_mesh()` builds a 2-D ("dcn", "ici") mesh for workloads that
  want data parallelism across hosts (e.g. BatchProver sharding the batch
  axis over "dcn") and length-sharding within a host (over "ici") — the
  recommended large-scale layout, since the grand-product carry and NTT
  exchanges are latency-sensitive.

Single-host virtual testing: these helpers degrade gracefully when
`jax.distributed` was never initialized (process_count == 1), so the same
code path runs on the CPU-mesh test rig and on a real pod slice.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX distributed runtime (call once per host process).

    With no arguments, defers to environment-based auto-configuration
    (TPU pod slices populate it from the metadata server).  Explicit
    arguments support manual bring-up:
      coordinator_address: "host:port" of process 0
      num_processes / process_id: the usual rank topology
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def process_count() -> int:
    try:
        return jax.process_count()
    except RuntimeError:
        return 1


def make_global_mesh(axis: str = "shard") -> Mesh:
    """1-D mesh over every device in the slice (all hosts).

    Device order groups each host's chips contiguously, so a length-sharded
    polynomial places neighboring shards on one host: the four-step NTT's
    all_to_all moves most bytes over ICI and only the inter-host block over
    DCN.
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (axis,))


def make_hybrid_mesh(dcn_axis: str = "dcn", ici_axis: str = "ici") -> Mesh:
    """2-D (hosts, chips-per-host) mesh for dp-over-DCN x shard-over-ICI.

    BatchProver shards its batch axis over `dcn_axis` (independent proofs,
    zero inter-host traffic) while each proof's length-sharded rounds run
    over `ici_axis` within one host.
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    nproc = process_count()
    per_host = len(devs) // nproc
    grid = np.array(devs).reshape(nproc, per_host)
    return Mesh(grid, (dcn_axis, ici_axis))
