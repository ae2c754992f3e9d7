"""Multi-host helpers (parallel/distributed.py) on the single-host rig.

Real DCN needs real multi-host hardware; these tests pin the parts that
are checkable here: mesh construction over all visible devices, the
host-contiguous device ordering contract, and graceful single-process
degradation (process_count() == 1 without jax.distributed init).
"""

from plonkathon_tpu.parallel.distributed import (
    make_global_mesh,
    make_hybrid_mesh,
    process_count,
)

import jax


def test_process_count_single_host():
    assert process_count() == 1


def test_global_mesh_spans_all_devices():
    mesh = make_global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("shard",)


def test_hybrid_mesh_shape():
    mesh = make_hybrid_mesh()
    assert mesh.axis_names == ("dcn", "ici")
    assert mesh.devices.shape == (1, len(jax.devices()))


def test_global_mesh_runs_sharded_ntt():
    # The global mesh must be a drop-in for make_mesh in the sharded path.
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from plonkathon_tpu.parallel.sharded import sharded_ntt
    from plonkathon_tpu.ops import ntt as _ntt
    from plonkathon_tpu.ops.limbs import fr

    mesh = make_global_mesh()
    n1 = n2 = 16
    rng = np.random.default_rng(3)
    vec = [int(x) for x in rng.integers(0, 1 << 48, n1 * n2)]
    mat = jnp.asarray(fr.to_mont_host_many(vec).reshape(16, n1, n2))
    mat = jax.device_put(mat, NamedSharding(mesh, P(None, None, "shard")))
    out = sharded_ntt(mesh, "shard", mat)
    got = fr.from_mont_host_many(
        fr.canon(jnp.swapaxes(out, 1, 2).reshape(16, n1 * n2))
    )
    want = fr.from_mont_host_many(
        fr.canon(_ntt.ntt(jnp.asarray(fr.to_mont_host_many(vec))))
    )
    assert got == want
