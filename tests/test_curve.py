"""Host curve/pairing tests and device Jacobian/MSM vs host oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from plonkathon_tpu.fields import Fr, Fq, FR_MOD
from plonkathon_tpu.ec import (
    G1,
    G2,
    B1,
    B2,
    is_on_curve,
    pt_add,
    pt_double,
    pt_mul,
    pt_neg,
    msm,
)
from plonkathon_tpu.pairing import pairing
from plonkathon_tpu.ops.limbs import fq, fr
from plonkathon_tpu.ops import curve as dcurve


def test_generators_on_curve_and_order():
    assert is_on_curve(G1, B1)
    assert is_on_curve(G2, B2)
    assert pt_mul(G1, FR_MOD) is None
    assert pt_mul(G2, FR_MOD) is None


def test_host_group_laws(rng):
    a, b = rng.randrange(1, FR_MOD), rng.randrange(1, FR_MOD)
    pa, pb = pt_mul(G1, a), pt_mul(G1, b)
    assert pt_add(pa, pb) == pt_mul(G1, (a + b) % FR_MOD)
    assert pt_add(pa, pt_neg(pa)) is None
    assert pt_double(pa) == pt_mul(G1, 2 * a % FR_MOD)
    assert pt_add(pa, None) == pa


def test_host_msm_matches_naive(rng):
    pts = [pt_mul(G1, rng.randrange(1, FR_MOD)) for _ in range(7)]
    cs = [rng.randrange(FR_MOD) for _ in range(7)]
    cs[2] = 0
    expect = None
    for p, c in zip(pts, cs):
        expect = pt_add(expect, pt_mul(p, c))
    assert msm(list(zip(pts, cs))) == expect


@pytest.mark.slow
def test_pairing_bilinearity():
    e = pairing(G2, pt_mul(G1, 7))
    assert e == pairing(pt_mul(G2, 7), G1)
    assert e == pairing(G2, G1) ** 7


def _to_jac(pt):
    x, y = dcurve.points_to_device([pt])
    return dcurve.jac_from_affine(x, y)


def _from_jac(p):
    return dcurve.jac_to_affine_host(tuple(np.asarray(c)[:, 0] for c in p))


def test_device_jacobian_add_double(rng):
    a, b = rng.randrange(1, FR_MOD), rng.randrange(1, FR_MOD)
    pa, pb = pt_mul(G1, a), pt_mul(G1, b)
    ja, jb = _to_jac(pa), _to_jac(pb)
    assert _from_jac(dcurve.jac_add(ja, jb)) == pt_add(pa, pb)
    assert _from_jac(dcurve.jac_double(ja)) == pt_double(pa)
    # Special cases: same point, inverse point, identity.
    assert _from_jac(dcurve.jac_add(ja, ja)) == pt_double(pa)
    jneg = _to_jac(pt_neg(pa))
    assert _from_jac(dcurve.jac_add(ja, jneg)) is None
    ident = dcurve.jac_identity((1,))
    assert _from_jac(dcurve.jac_add(ja, ident)) == pa
    assert _from_jac(dcurve.jac_add(ident, ja)) == pa


def test_device_msm_matches_host(rng):
    n = 8
    pts = [pt_mul(G1, rng.randrange(1, FR_MOD)) for _ in range(n)]
    cs = [rng.randrange(FR_MOD) for _ in range(n)]
    cs[1] = 0
    engine = dcurve.FixedBaseMSM(pts)
    got = engine.commit_mont(jnp.asarray(fr.to_mont_host_many(cs)))
    assert got == msm(list(zip(pts, cs)))
    # Zero polynomial commits to the identity.
    assert engine.commit_mont(jnp.asarray(fr.to_mont_host_many([0] * n))) is None
    # Prefix subset (degree < SRS size).
    got4 = engine.commit_mont(jnp.asarray(fr.to_mont_host_many(cs[:4])))
    assert got4 == msm(list(zip(pts[:4], cs[:4])))
