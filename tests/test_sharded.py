"""Multi-device sharding tests on the 8-way virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plonkathon_tpu.fields import FR_MOD
from plonkathon_tpu.ec import G1, pt_mul, msm as host_msm
from plonkathon_tpu.ops.limbs import fr
from plonkathon_tpu.ops import ntt as dntt
from plonkathon_tpu.ops import curve as dcurve
from plonkathon_tpu.parallel.mesh import make_mesh, NamedSharding, P
from plonkathon_tpu.parallel.sharded import (
    sharded_msm,
    sharded_ntt,
    vector_to_host_matrix,
    host_matrix_to_vector,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device mesh"
)


def test_virtual_mesh_present():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("inverse", [False, True])
def test_four_step_ntt_matches_single_chip(rng, inverse):
    mesh = make_mesh(8, axis="shard")
    n1 = n2 = 16
    vec = [rng.randrange(FR_MOD) for _ in range(n1 * n2)]
    mat = jnp.asarray(vector_to_host_matrix(vec, n1, n2))
    mat = jax.device_put(mat, NamedSharding(mesh, P(None, None, "shard")))
    out = sharded_ntt(mesh, "shard", mat, inverse=inverse)
    got = host_matrix_to_vector(np.asarray(out))
    expect = fr.from_mont_host_many(
        dntt.ntt(jnp.asarray(fr.to_mont_host_many(vec)), inverse=inverse)
    )
    assert got == expect


def test_sharded_msm_matches_host(rng):
    mesh = make_mesh(8, axis="shard")
    npts = 8
    pts = [pt_mul(G1, rng.randrange(1, FR_MOD)) for _ in range(npts)]
    scalars = [rng.randrange(FR_MOD) for _ in range(npts)]
    x, y = dcurve.points_to_device(pts)
    pre = dcurve._window_precompute(x, y)
    digits = dcurve._digits_impl(fr.from_mont(jnp.asarray(fr.to_mont_host_many(scalars))))
    pre_sharded = tuple(
        jax.device_put(c, NamedSharding(mesh, P(None, "shard"))) for c in pre
    )
    digits_sharded = jax.device_put(digits, NamedSharding(mesh, P("shard")))
    total = sharded_msm(mesh, "shard", pre_sharded, digits_sharded)
    got = dcurve.jac_to_affine_host(tuple(np.asarray(c) for c in total))
    assert got == host_msm(list(zip(pts, scalars)))


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.shape[0] == 16


def test_graft_entry_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
