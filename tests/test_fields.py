"""Unit tests: host field tower and device limb kernels vs bignum oracle."""

import jax
import jax.numpy as jnp
import pytest

from plonkathon_tpu.fields import Fr, Fq, Fq2, Fq12, FQ_MOD, FR_MOD
from plonkathon_tpu.ops.limbs import fr, fq, encode_ints, decode_ints


def test_fr_basics():
    assert Fr(5) + Fr(FR_MOD - 3) == Fr(2)
    assert Fr(7) * Fr(9) == 63
    assert (Fr(3) / Fr(7)) * Fr(7) == Fr(3)
    assert Fr(2) ** 10 == 1024
    assert -Fr(1) == Fr(FR_MOD - 1)
    assert int(Fr(42)) == 42


def test_fr_roots_of_unity():
    # Golden constant from reference test.py:31-33.
    w = Fr.root_of_unity(8)
    assert (
        w.n
        == 19540430494807482326159819597004422086093766032135589407132600596362845576832
    )
    roots = Fr.roots_of_unity(8)
    assert len(roots) == 8
    assert roots[1] ** 8 == 1
    assert roots[3] == roots[1] ** 3


def test_fq2_arithmetic():
    a = Fq2([3, 4])
    b = Fq2([5, 6])
    assert a * b == Fq2([(3 * 5 - 4 * 6) % FQ_MOD, 3 * 6 + 4 * 5])
    assert (a / b) * b == a
    assert a * a == a ** 2


@pytest.mark.parametrize("ops", [fr, fq], ids=["fr", "fq"])
def test_limb_ops_match_bignum(ops, rng):
    p = ops.modulus
    xs = [rng.randrange(p) for _ in range(32)] + [0, 1, p - 1, p - 2]
    ys = [rng.randrange(p) for _ in range(32)] + [p - 1, 0, p - 1, 1]
    ax = jnp.asarray(ops.to_mont_host_many(xs))
    ay = jnp.asarray(ops.to_mont_host_many(ys))
    assert ops.from_mont_host_many(ops.add(ax, ay)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert ops.from_mont_host_many(ops.sub(ax, ay)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert ops.from_mont_host_many(ops.mul(ax, ay)) == [(x * y) % p for x, y in zip(xs, ys)]
    assert ops.from_mont_host_many(ops.neg(ax)) == [(-x) % p for x in xs]


@pytest.mark.parametrize("ops", [fr, fq], ids=["fr", "fq"])
def test_limb_inv(ops, rng):
    p = ops.modulus
    xs = [rng.randrange(1, p) for _ in range(16)]
    ax = jnp.asarray(ops.to_mont_host_many(xs))
    assert ops.from_mont_host_many(jax.jit(ops.inv)(ax)) == [pow(x, -1, p) for x in xs]


def test_limb_mont_roundtrip(rng):
    xs = [rng.randrange(FR_MOD) for _ in range(8)]
    raw = jnp.asarray(encode_ints(xs))
    assert decode_ints(fr.from_mont(fr.to_mont(raw))) == xs


def test_limb_pow_int(rng):
    p = fr.modulus
    xs = [rng.randrange(p) for _ in range(8)]
    ax = jnp.asarray(fr.to_mont_host_many(xs))
    for e in (0, 1, 2, 7, 64):
        got = fr.from_mont_host_many(fr.pow_int(ax, e))
        assert got == [pow(x, e, p) for x in xs]
