"""Batched 256-bit prime-field arithmetic for TPU (JAX).

Design (TPU-first, not a port — the reference does all field math on Python
bignums, e.g. curve.py:10-24):

* An element is 16 little-endian limbs of 16 bits each, stored in `uint32`.
* Layout is **limb-major**: arrays are `uint32[16, *batch]`, so the batch
  dimension lands on TPU vector lanes and every limb op is a full-width
  VPU instruction.  A "scalar" is `uint32[16]`.
* Hot-path values live in Montgomery form (R = 2^256) in the **lazy domain
  [0, 2p)**: `mul` is a Montgomery product whose output stays < 2p without a
  final conditional subtraction; predicates canonicalize internally.
* Schoolbook partial products are split lo/hi so column sums stay < 2^22 in
  32-bit lanes; columns are collected with a single static gather+reduce
  (no per-limb scatter chain), and carries/borrows propagate in log-depth
  via Kogge-Stone generate/propagate prefixes.  This keeps traced graphs
  ~150 HLO ops per field-mul — compile-time and runtime critical.
* Inversions use Fermat exponentiation driven by `lax.scan` over the
  (static) exponent bits.

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
    """list[int] -> uint32[16, len(ns)].

    Bytes-based: one `int.to_bytes` per element + a vectorized reinterpret
    (the per-limb Python loop cost ~5 s for the 786k wire values of a
    2^18-gate circuit; this path is ~50x faster)."""
    if not isinstance(ns, (list, tuple)):
        ns = list(ns)
    buf = b"".join(int(n).to_bytes(32, "little") for n in ns)
    a = np.frombuffer(buf, dtype="<u2").reshape(len(ns), NLIMBS)
    return np.ascontiguousarray(a.T).astype(np.uint32)


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


_PALLAS_MIN_WIDTH = 1024


def _pallas_width_ok(a, b) -> bool:
    """Route to the Pallas multiply kernel? (TPU backend + wide batch.)"""
    import jax

    if jax.default_backend() != "tpu":
        return False
    w = 1
    for d in np.broadcast_shapes(a.shape[1:], b.shape[1:]):
        w *= d
    return w >= _PALLAS_MIN_WIDTH


def _skew_rows(x, shift: int, ncols: int):
    """Diagonal re-indexing: out[i, c] = x[i, c - i - shift] (else 0).

    x: [R, W, *batch].  Row i is shifted right by i (+shift), landing each
    partial-product row on its product column — done with one pad, two
    reshapes, and a slice (a strided re-read of the flattened array), so the
    whole skew is 4 static HLO ops: no per-row pads, no gathers (TPU gathers
    on sublane axes are scalar-slow; this formulation avoids both).
    """
    r, w = x.shape[0], x.shape[1]
    batch_pad = ((0, 0),) * (x.ndim - 2)
    # Pad the column axis to ncols+1: `shift` zeros in front, the rest behind.
    x = jnp.pad(x, ((0, 0), (shift, ncols + 1 - w - shift)) + batch_pad)
    flat = x.reshape((r * (ncols + 1),) + x.shape[2:])
    out = flat[: r * ncols].reshape((r, ncols) + x.shape[2:])
    return out


def _shift_up(x, s: int):
    """Shift limb values toward higher indices by s (zeros enter at bottom)."""
    return jnp.concatenate([jnp.zeros_like(x[:s]), x[:-s]], axis=0)


class FieldOps:
    """Modular arithmetic over a fixed prime, on limb-major uint32 arrays."""

    def __init__(self, modulus: int):
        assert modulus < (1 << (R_BITS - 1))
        self.modulus = modulus
        r = 1 << R_BITS
        self.P = encode_int(modulus)
        self.P2 = encode_int(2 * modulus)
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

    # -- carry / borrow machinery (log-depth) ----------------------------
    @staticmethod
    def _carry_norm(cols):
        """Columns (< 2^22 each) -> canonical 16-bit limbs, mod 2^(16*K).

        One deferred-carry fold, then a Kogge-Stone generate/propagate
        prefix resolves the remaining single-bit ripple.
        """
        k = cols.shape[0]
        s = cols & LIMB_MASK
        c = cols >> LIMB_BITS
        u = s + _shift_up(c, 1)  # < 2^16 + 2^6
        g = u >> LIMB_BITS != 0
        p = (u & LIMB_MASK) == LIMB_MASK
        step = 1
        while step < k:
            g = jnp.logical_or(g, jnp.logical_and(p, _shift_up(g, step)))
            p = jnp.logical_and(p, _shift_up(p, step))
            step *= 2
        carry_in = _shift_up(g, 1).astype(jnp.uint32)
        return (u + carry_in) & LIMB_MASK

    @staticmethod
    def _sub_limbs(a, b):
        """(a - b) mod 2^(16*K) with borrow flag; canonical 16-bit inputs."""
        k = a.shape[0]
        g = a < b
        p = a == b
        gg, pp = g, p
        step = 1
        while step < k:
            gg = jnp.logical_or(gg, jnp.logical_and(pp, _shift_up(gg, step)))
            pp = jnp.logical_and(pp, _shift_up(pp, step))
            step *= 2
        borrow_in = _shift_up(gg, 1).astype(jnp.uint32)
        res = (a - b - borrow_in) & LIMB_MASK
        return res, gg[-1]

    def _cond_sub(self, s, mod_limbs):
        """Subtract `mod_limbs` once if s >= mod_limbs."""
        m = jnp.asarray(mod_limbs)[(...,) + (None,) * (s.ndim - 1)]
        d, borrow = self._sub_limbs(s, jnp.broadcast_to(m, s.shape).astype(jnp.uint32))
        return jnp.where(borrow[None], s, d)

    def canon(self, a):
        """Lazy [0, 2p) -> canonical [0, p)."""
        return self._cond_sub(a, self.P)

    # -- add / sub (lazy domain [0, 2p)) ----------------------------------
    def add(self, a, b):
        s = self._carry_norm(a + b)
        return self._cond_sub(s, self.P2)

    def sub(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        d, borrow = self._sub_limbs(a, b)
        p2 = jnp.asarray(self.P2)[(...,) + (None,) * (d.ndim - 1)]
        addback = jnp.where(borrow[None], p2, 0).astype(jnp.uint32)
        return self._carry_norm(d + addback)

    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)

    # -- multiplication ---------------------------------------------------
    @staticmethod
    def _mul_columns(a, b, ncols):
        """Raw column sums of the product (no carries), length `ncols`.

        a: [16, *A], b: [16, *B] broadcastable; columns < 2^22.  One
        broadcast outer product, a lo/hi split so column sums fit 32-bit
        lanes, then each partial-product row lands on its product column
        i+j via `_skew_rows` (pad + reshape, no gathers) and a single
        reduction over the row axis — ~13 HLO ops per schoolbook, which
        keeps traced round kernels small enough to compile fast.
        """
        full = 2 * NLIMBS
        pp = a[:, None] * b[None, :]  # [16, 16, *batch]
        lo = pp & LIMB_MASK
        hi = pp >> LIMB_BITS
        cols = jnp.sum(
            _skew_rows(lo, 0, full) + _skew_rows(hi, 1, full),
            axis=0,
            dtype=jnp.uint32,
        )
        return cols if ncols == full else cols[:ncols]

    def mul(self, a, b):
        """Montgomery product a*b*R^-1 mod p; lazy in/out domain [0, 2p).

        On a TPU backend, wide batches route to the fused Pallas kernel
        (ops/pallas_mont.py) — the XLA schoolbook below materializes a
        [16, 33, W] skew temp in HBM and is ~50-100x slower at width; it
        remains the CPU-testable bit-identical fallback.
        """
        if _pallas_width_ok(a, b):
            from . import pallas_mont

            return pallas_mont.mont_mul(
                "fq" if self.modulus == pallas_mont.fq.modulus else "fr", a, b
            )
        return self._mul_xla(a, b)

    def _mul_xla(self, a, b):
        tcols = self._mul_columns(a, b, 2 * NLIMBS)  # [32, *]
        tlo = self._carry_norm(tcols[:NLIMBS])
        np_ = jnp.asarray(self.NPRIME)[(...,) + (None,) * (tlo.ndim - 1)]
        m = self._carry_norm(self._mul_columns(tlo, np_, NLIMBS))
        p_ = jnp.asarray(self.P)[(...,) + (None,) * (m.ndim - 1)]
        mpcols = self._mul_columns(m, p_, 2 * NLIMBS)
        total = self._carry_norm(tcols + mpcols)  # low half == 0 by design
        return total[NLIMBS:]

    def sqr(self, a):
        return self.mul(a, a)

    # -- Montgomery domain ------------------------------------------------
    def to_mont(self, a):
        r2 = jnp.asarray(self.R2)[(...,) + (None,) * (a.ndim - 1)]
        return self.mul(a, r2)

    def from_mont(self, a):
        """Montgomery -> canonical integer limbs (< p)."""
        one = jnp.asarray(self.ONE_RAW)[(...,) + (None,) * (a.ndim - 1)]
        return self.canon(self.mul(a, one))

    # -- exponentiation / inversion --------------------------------------
    def pow_bits(self, a, bits: np.ndarray):
        """a^e for a static exponent given as MSB-first bit array."""
        bits_dev = jnp.asarray(bits)
        one = jnp.broadcast_to(
            jnp.asarray(self.ONE_MONT)[(...,) + (None,) * (a.ndim - 1)], a.shape
        ).astype(jnp.uint32)
        # Inherit `a`'s varying-manual-axes type so the scan carry matches
        # the body output under shard_map (JAX 0.9 vma checking).
        one = one + a * jnp.uint32(0)

        def body(acc, bit):
            acc = self.mul(acc, acc)
            taken = self.mul(acc, a)
            acc = jnp.where((bit != 0)[None], taken, acc)
            return acc, None

        out, _ = jax.lax.scan(body, one, bits_dev)
        return out

    def inv(self, a):
        """Batched inversion via Fermat (Montgomery form, nonzero inputs)."""
        return self.pow_bits(a, self._inv_bits)

    def pow_int(self, a, e: int):
        """a^e for small static e, unrolled square-and-multiply."""
        if e == 0:
            return jnp.broadcast_to(
                jnp.asarray(self.ONE_MONT)[(...,) + (None,) * (a.ndim - 1)], a.shape
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

    # -- predicates (canonicalizing) --------------------------------------
    def is_zero(self, a):
        return jnp.all(self.canon(a) == 0, axis=0)

    def eq(self, a, b):
        return jnp.all(self.canon(a) == self.canon(b), axis=0)

    @staticmethod
    def select(mask, a, b):
        """mask: bool[*batch]; picks a where True."""
        return jnp.where(mask[None], a, b)


# The two BN254 fields.
from ..fields import FQ_MOD, FR_MOD  # noqa: E402

fq = FieldOps(FQ_MOD)
fr = FieldOps(FR_MOD)
