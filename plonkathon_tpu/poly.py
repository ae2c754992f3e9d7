"""Device-backed polynomials over Fr.

The reference keeps polynomials as Python lists of bignum Scalars
(poly.py:10-17); here a polynomial is a limb-major uint32[16, n] JAX array in
Montgomery form, in either basis:

* LAGRANGE — evaluations at the order-n roots-of-unity domain,
* MONOMIAL — coefficients.

Pointwise algebra dispatches to the batched field kernels (ops/limbs.py) and
basis changes to the NTT kernels (ops/ntt.py); everything runs on CPU or TPU
unchanged.  Scalars at the API boundary are host `Fr` values.
"""

from __future__ import annotations

import functools
from enum import Enum

import jax
import jax.numpy as jnp

from .fields import Fr, FR_MOD
from .ops.limbs import fr, NLIMBS
from .ops import ntt as _ntt


class Basis(Enum):
    LAGRANGE = 1
    MONOMIAL = 2


@functools.lru_cache(maxsize=None)
def _jit(name):
    table = {
        "add": fr.add,
        "sub": fr.sub,
        "mul": fr.mul,
        "div": lambda a, b: fr.mul(a, fr.inv(b)),
        "neg": fr.neg,
        "canon": fr.canon,
    }
    return jax.jit(table[name])


def _as_scalar_limbs(v):
    """Fr | int -> uint32[16, 1] Montgomery."""
    return jnp.asarray(fr.to_mont_host(int(v))).reshape(NLIMBS, 1)


class Polynomial:
    __slots__ = ("values", "basis")

    def __init__(self, values, basis: Basis):
        """values: uint32[16, n] Montgomery limbs (device), or a list of
        Fr/int (host), matching the reference constructor's ergonomics."""
        if isinstance(values, (list, tuple)):
            values = jnp.asarray(fr.to_mont_host_many([int(v) for v in values]))
        assert values.ndim == 2 and values.shape[0] == NLIMBS
        self.values = values
        self.basis = basis

    # -- construction -----------------------------------------------------
    @classmethod
    def zeros(cls, n: int, basis: Basis = Basis.LAGRANGE) -> "Polynomial":
        return cls(jnp.zeros((NLIMBS, n), dtype=jnp.uint32), basis)

    def __len__(self) -> int:
        return int(self.values.shape[1])

    def to_ints(self) -> list[int]:
        return fr.from_mont_host_many(self.values)

    def to_scalars(self) -> list[Fr]:
        return [Fr(v) for v in self.to_ints()]

    # -- comparison -------------------------------------------------------
    def __eq__(self, other):
        if not isinstance(other, Polynomial):
            return NotImplemented
        return self.basis == other.basis and bool(
            jnp.array_equal(_jit("canon")(self.values), _jit("canon")(other.values))
        )

    # -- algebra ----------------------------------------------------------
    def _pointwise(self, other, opname):
        if isinstance(other, Polynomial):
            assert self.basis == other.basis
            assert self.values.shape == other.values.shape
            return Polynomial(_jit(opname)(self.values, other.values), self.basis)
        s = _as_scalar_limbs(other)
        if self.basis == Basis.LAGRANGE or opname in ("mul", "div"):
            return Polynomial(_jit(opname)(self.values, s), self.basis)
        # MONOMIAL +/- scalar touches only the constant coefficient.
        head = _jit(opname)(self.values[:, :1], s)
        return Polynomial(
            jnp.concatenate([head, self.values[:, 1:]], axis=1), self.basis
        )

    def __add__(self, other):
        return self._pointwise(other, "add")

    def __sub__(self, other):
        return self._pointwise(other, "sub")

    def __rsub__(self, other):
        return Polynomial(_jit("neg")(self.values), self.basis) + other

    def __mul__(self, other):
        if isinstance(other, Polynomial):
            assert self.basis == Basis.LAGRANGE and other.basis == Basis.LAGRANGE
        return self._pointwise(other, "mul")

    __rmul__ = __mul__
    __radd__ = __add__

    def __truediv__(self, other):
        if isinstance(other, Polynomial):
            assert self.basis == Basis.LAGRANGE and other.basis == Basis.LAGRANGE
            return self._pointwise(other, "div")
        inv = Fr(pow(int(other), -1, FR_MOD))
        return self._pointwise(inv, "mul")

    def __neg__(self):
        return Polynomial(_jit("neg")(self.values), self.basis)

    # -- structure --------------------------------------------------------
    def shift(self, k: int) -> "Polynomial":
        """Cyclic left rotation of Lagrange values: p(x) -> p(omega^k x)."""
        assert self.basis == Basis.LAGRANGE
        return Polynomial(jnp.roll(self.values, -k, axis=1), self.basis)

    # -- basis changes ----------------------------------------------------
    def fft(self, inv: bool = False) -> "Polynomial":
        if inv:
            assert self.basis == Basis.LAGRANGE
            return Polynomial(_ntt.ntt(self.values, inverse=True), Basis.MONOMIAL)
        assert self.basis == Basis.MONOMIAL
        return Polynomial(_ntt.ntt(self.values), Basis.LAGRANGE)

    def ifft(self) -> "Polynomial":
        return self.fft(True)

    def to_coset_extended_lagrange(self, offset) -> "Polynomial":
        """Values on the n domain -> values on the offset*q^i 4n coset
        (reference poly.py:156-163)."""
        assert self.basis == Basis.LAGRANGE
        off = jnp.asarray(fr.to_mont_host(int(offset)))
        return Polynomial(_ntt.coset_extend(self.values, off), Basis.LAGRANGE)

    def coset_extended_lagrange_to_coeffs(self, offset) -> "Polynomial":
        """Inverse direction -> monomial coefficients (reference poly.py:169-177)."""
        assert self.basis == Basis.LAGRANGE
        offinv = jnp.asarray(fr.to_mont_host(pow(int(offset), -1, FR_MOD)))
        return Polynomial(_ntt.coset_to_coeffs(self.values, offinv), Basis.MONOMIAL)

    # -- evaluation -------------------------------------------------------
    def barycentric_eval(self, x) -> Fr:
        """Evaluate Lagrange values at an arbitrary host scalar
        (reference poly.py:181-195)."""
        assert self.basis == Basis.LAGRANGE
        xl = jnp.asarray(fr.to_mont_host(int(x)))
        return Fr(fr.from_mont_host(_ntt.barycentric_eval(self.values, xl)))
