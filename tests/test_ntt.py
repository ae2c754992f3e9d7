"""NTT / coset-extension / barycentric kernels vs a naive host DFT oracle."""

import jax.numpy as jnp
import pytest

from plonkathon_tpu.fields import FR_MOD
from plonkathon_tpu.ops.limbs import fr
from plonkathon_tpu.ops import ntt as dntt


def host_dft(coeffs, inverse=False):
    n = len(coeffs)
    w = pow(5, (FR_MOD - 1) // n, FR_MOD)
    if inverse:
        w = pow(w, -1, FR_MOD)
    out = [
        sum(c * pow(w, i * j, FR_MOD) for j, c in enumerate(coeffs)) % FR_MOD
        for i in range(n)
    ]
    if inverse:
        ninv = pow(n, -1, FR_MOD)
        out = [x * ninv % FR_MOD for x in out]
    return out


@pytest.mark.parametrize("n", [8, 64])
def test_ntt_matches_dft(n, rng):
    xs = [rng.randrange(FR_MOD) for _ in range(n)]
    a = jnp.asarray(fr.to_mont_host_many(xs))
    assert fr.from_mont_host_many(dntt.ntt(a)) == host_dft(xs)
    assert fr.from_mont_host_many(dntt.ntt(a, inverse=True)) == host_dft(xs, inverse=True)
    assert fr.from_mont_host_many(dntt.ntt(dntt.ntt(a), inverse=True)) == xs


def test_coset_extend_and_back(rng):
    n = 8
    xs = [rng.randrange(FR_MOD) for _ in range(n)]
    vals = jnp.asarray(fr.to_mont_host_many(xs))
    off = 7919
    offm = jnp.asarray(fr.to_mont_host(off))
    ext = fr.from_mont_host_many(dntt.coset_extend(vals, offm))

    coeffs = host_dft(xs, inverse=True)
    q = pow(5, (FR_MOD - 1) // (4 * n), FR_MOD)
    expect = [
        sum(
            c * pow(off * pow(q, i, FR_MOD) % FR_MOD, k, FR_MOD)
            for k, c in enumerate(coeffs)
        )
        % FR_MOD
        for i in range(4 * n)
    ]
    assert ext == expect

    offinv = jnp.asarray(fr.to_mont_host(pow(off, -1, FR_MOD)))
    back = fr.from_mont_host_many(
        dntt.coset_to_coeffs(jnp.asarray(fr.to_mont_host_many(ext)), offinv)
    )
    assert back[:n] == coeffs
    assert all(v == 0 for v in back[n:])


def test_barycentric_eval(rng):
    n = 8
    xs = [rng.randrange(FR_MOD) for _ in range(n)]
    vals = jnp.asarray(fr.to_mont_host_many(xs))
    coeffs = host_dft(xs, inverse=True)
    x = 123456789
    got = fr.from_mont_host(dntt.barycentric_eval(vals, jnp.asarray(fr.to_mont_host(x))))
    expect = sum(c * pow(x, k, FR_MOD) for k, c in enumerate(coeffs)) % FR_MOD
    assert got == expect


def test_scalar_powers(rng):
    x = rng.randrange(FR_MOD)
    xm = jnp.asarray(fr.to_mont_host(x))
    got = fr.from_mont_host_many(dntt.scalar_powers(xm, 13))
    assert got == [pow(x, i, FR_MOD) for i in range(13)]
