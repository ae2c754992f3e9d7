"""Batched 256-bit prime-field arithmetic for TPU (JAX).

Design (TPU-first, not a port — the reference does all field math on Python
bignums, e.g. curve.py:10-24):

* An element is 16 little-endian limbs of 16 bits each, stored in `uint32`.
* Layout is **limb-major**: arrays are `uint32[16, *batch]`, so the batch
  dimension lands on TPU vector lanes and every limb op is a full-width
  VPU instruction.  A "scalar" is `uint32[16]`.
* Multiplication keeps products in 32-bit lanes by splitting each 16x16
  partial product into lo/hi halves; column accumulations stay < 2^21, far
  from overflow.
* Hot-path values live in Montgomery form (R = 2^256); `mul` is a Montgomery
  product computed as full-product + low-product-by-N' + final add/shift.
* Inversions use Fermat exponentiation driven by `lax.scan` over the
  (static) exponent bits, so traces stay small.

All functions are pure and jittable; they run identically on CPU (tests) and
TPU (bench).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

LIMB_BITS = 16
NLIMBS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
R_BITS = LIMB_BITS * NLIMBS  # 256


def encode_int(n: int) -> np.ndarray:
    """Python int -> uint32[16] little-endian 16-bit limbs."""
    return np.array(
        [(n >> (LIMB_BITS * k)) & LIMB_MASK for k in range(NLIMBS)], dtype=np.uint32
    )


def encode_ints(ns) -> np.ndarray:
    """list[int] -> uint32[16, len(ns)]."""
    out = np.empty((NLIMBS, len(ns)), dtype=np.uint32)
    for j, n in enumerate(ns):
        for k in range(NLIMBS):
            out[k, j] = (n >> (LIMB_BITS * k)) & LIMB_MASK
    return out


def decode_int(arr) -> int:
    a = np.asarray(arr, dtype=np.uint64)
    return sum(int(a[k]) << (LIMB_BITS * k) for k in range(NLIMBS))


def decode_ints(arr) -> list[int]:
    a = np.asarray(arr)
    assert a.shape[0] == NLIMBS
    flat = a.reshape(NLIMBS, -1)
    return [
        sum(int(flat[k, j]) << (LIMB_BITS * k) for k in range(NLIMBS))
        for j in range(flat.shape[1])
    ]


class FieldOps:
    """Modular arithmetic over a fixed prime, on limb-major uint32 arrays."""

    def __init__(self, modulus: int):
        assert modulus < (1 << (R_BITS - 1))
        self.modulus = modulus
        r = 1 << R_BITS
        self.P = encode_int(modulus)
        self.NPRIME = encode_int((-pow(modulus, -1, r)) % r)  # -p^-1 mod 2^256
        self.r_mod_p = r % modulus
        self.R2 = encode_int(pow(r, 2, modulus))
        self.ONE_RAW = encode_int(1)
        self.ONE_MONT = encode_int(self.r_mod_p)
        self.ZERO = encode_int(0)
        # Exponent bits (MSB first) for Fermat inversion a^(p-2).
        self._inv_bits = np.array(
            [int(b) for b in bin(modulus - 2)[2:]], dtype=np.uint32
        )

    # -- host conversion helpers (Montgomery domain) ----------------------
    def to_mont_host(self, n: int) -> np.ndarray:
        return encode_int((int(n) % self.modulus) * self.r_mod_p % self.modulus)

    def to_mont_host_many(self, ns) -> np.ndarray:
        rp, p = self.r_mod_p, self.modulus
        return encode_ints([(int(n) % p) * rp % p for n in ns])

    def from_mont_host(self, arr) -> int:
        rinv = pow(self.r_mod_p, -1, self.modulus)
        return decode_int(arr) * rinv % self.modulus

    def from_mont_host_many(self, arr) -> list[int]:
        rinv = pow(self.r_mod_p, -1, self.modulus)
        p = self.modulus
        return [v * rinv % p for v in decode_ints(arr)]

    # -- carry / borrow chains -------------------------------------------
    @staticmethod
    def _carry(cols):
        """Propagate carries over the leading axis; values must stay < 2^31."""
        n = cols.shape[0]
        out = []
        c = jnp.zeros(cols.shape[1:], dtype=jnp.uint32)
        for k in range(n):
            v = cols[k] + c
            out.append(v & LIMB_MASK)
            c = v >> LIMB_BITS
        return jnp.stack(out), c

    def _sub_borrow(self, a, b):
        """a - b limbwise with borrow chain; returns (diff, borrow_flag)."""
        out = []
        br = jnp.zeros(jnp.broadcast_shapes(a.shape[1:], b.shape[1:]), dtype=jnp.uint32)
        for k in range(NLIMBS):
            t = b[k] + br
            bk = (a[k] < t).astype(jnp.uint32)
            out.append((a[k] - t) & LIMB_MASK)
            br = bk
        return jnp.stack(out), br

    def _cond_sub_p(self, s):
        """Reduce s in [0, 2p) to canonical [0, p)."""
        p = jnp.asarray(self.P)[(...,) + (None,) * (s.ndim - 1)]
        d, borrow = self._sub_borrow(s, p)
        return jnp.where((borrow != 0)[None], s, d)

    # -- add / sub --------------------------------------------------------
    def add(self, a, b):
        s, _ = self._carry(a + b)
        return self._cond_sub_p(s)

    def sub(self, a, b):
        d, br = self._sub_borrow(a, b)
        p = jnp.asarray(self.P)[(...,) + (None,) * (d.ndim - 1)]
        dp, _ = self._carry(d + p)
        return jnp.where((br != 0)[None], dp, d)

    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    # -- multiplication ---------------------------------------------------
    @staticmethod
    def _mul_columns(a, b, ncols):
        """Raw column sums of the product (no carries), length `ncols`.

        a: [16, *A], b: [16, *B] broadcastable; columns < 2^21.
        """
        shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        cols = [jnp.zeros(shape, dtype=jnp.uint32) for _ in range(ncols)]
        for i in range(NLIMBS):
            ai = a[i]
            jmax = min(NLIMBS, ncols - i)
            if jmax <= 0:
                break
            for j in range(jmax):
                p = ai * b[j]
                cols[i + j] = cols[i + j] + (p & LIMB_MASK)
                if i + j + 1 < ncols:
                    cols[i + j + 1] = cols[i + j + 1] + (p >> LIMB_BITS)
        return jnp.stack(cols)

    def _mul_wide(self, a, b):
        """Full 512-bit product, canonical 32 limbs."""
        cols = self._mul_columns(a, b, 2 * NLIMBS)
        limbs, _ = self._carry(cols)
        return limbs

    def _mul_low(self, a, b):
        """(a*b) mod 2^256, canonical 16 limbs."""
        cols = self._mul_columns(a, b, NLIMBS)
        limbs, _ = self._carry(cols)
        return limbs

    def mul(self, a, b):
        """Montgomery product: a*b*R^-1 mod p (canonical, < p)."""
        np_ = jnp.asarray(self.NPRIME).reshape((NLIMBS,) + (1,) * 0)
        p_ = jnp.asarray(self.P)
        t = self._mul_wide(a, b)  # [32, *]
        np_b = np_[(...,) + (None,) * (t.ndim - 1)]
        m = self._mul_low(t[:NLIMBS], np_b)
        p_b = p_[(...,) + (None,) * (m.ndim - 1)]
        mp = self._mul_wide(m, p_b)  # [32, *]
        total, _ = self._carry(t + mp)
        return self._cond_sub_p(total[NLIMBS:])

    def sqr(self, a):
        return self.mul(a, a)

    # -- Montgomery domain ------------------------------------------------
    def to_mont(self, a):
        r2 = jnp.asarray(self.R2)[(...,) + (None,) * (a.ndim - 1)]
        return self.mul(a, r2)

    def from_mont(self, a):
        one = jnp.asarray(self.ONE_RAW)[(...,) + (None,) * (a.ndim - 1)]
        return self.mul(a, one)

    # -- exponentiation / inversion --------------------------------------
    def pow_bits(self, a, bits: np.ndarray):
        """a^e for a static exponent given as MSB-first bit array."""
        bits_dev = jnp.asarray(bits)
        one = jnp.broadcast_to(
            jnp.asarray(self.ONE_MONT)[(...,) + (None,) * (a.ndim - 1)], a.shape
        ).astype(jnp.uint32)

        def body(acc, bit):
            acc = self.mul(acc, acc)
            taken = self.mul(acc, a)
            acc = jnp.where((bit != 0)[None], taken, acc)
            return acc, None

        out, _ = jax.lax.scan(body, one, bits_dev)
        return out

    def inv(self, a):
        """Batched inversion via Fermat (inputs in Montgomery form, nonzero)."""
        return self.pow_bits(a, self._inv_bits)

    def pow_int(self, a, e: int):
        """a^e for small static e, unrolled square-and-multiply."""
        if e == 0:
            shape = a.shape
            return jnp.broadcast_to(
                jnp.asarray(self.ONE_MONT)[(...,) + (None,) * (len(shape) - 1)], shape
            ).astype(jnp.uint32)
        result = None
        base = a
        while e:
            if e & 1:
                result = base if result is None else self.mul(result, base)
            e >>= 1
            if e:
                base = self.mul(base, base)
        return result

    # -- predicates -------------------------------------------------------
    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=0)

    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=0)

    @staticmethod
    def select(mask, a, b):
        """mask: bool[*batch]; picks a where True."""
        return jnp.where(mask[None], a, b)


# The two BN254 fields.
from ..fields import FQ_MOD, FR_MOD  # noqa: E402

fq = FieldOps(FQ_MOD)
fr = FieldOps(FR_MOD)
