"""Number-theoretic transform over Fr for TPU.

Replaces the reference's recursive Python FFT (poly.py:113-148) with an
iterative radix-2 decimation-in-time NTT: a bit-reversal gather followed by
log2(N) fully-vectorized butterfly stages, each one batched Montgomery
multiply + add/sub over limb-major arrays.  Twiddle tables are precomputed
per size and cached.

Also provides the coset-extension transforms (reference poly.py:156-177
semantics) used by the prover's 4n evaluation domain.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import Fr, FR_MOD
from .limbs import fr, NLIMBS


def _bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def _root_host(n: int, inverse: bool) -> int:
    w = pow(5, (FR_MOD - 1) // n, FR_MOD)
    return pow(w, -1, FR_MOD) if inverse else w


def _roots_impl(n: int, inverse: bool = False):
    """Device powers [1, w, ..., w^(n-1)] of the order-n domain generator.

    Traced: the only embedded constant is the 64-byte root itself; the
    table materializes on device via the log-depth doubling construction.
    (A host-precomputed table baked into the HLO is 16 MB at n=2^18 —
    large enough to break remote compilation of the jitted prover.)
    """
    return _powers_kernel(jnp.asarray(fr.to_mont_host(_root_host(n, inverse))), n)


def _ntt_impl(values, n: int, inverse: bool):
    """values: uint32[16, *batch, n] (Montgomery); transforms the last axis.

    Iterative radix-2 DIT as ONE `lax.scan` over the log2(n) stages (a
    stage-uniform body keeps the fused prover kernels compilable — unrolled
    stages cost minutes of XLA compile).  All index/twiddle tables are
    computed on device from `arange` and the [16] root constant: stage s
    needs twiddle w^((n>>s)*k) at lane j (k = j mod 2^(s-1)), a gather from
    the device power table.  Nothing larger than 64 bytes is baked into the
    traced program, so remote compilation stays cheap at any n.
    """
    if n == 1:
        return values
    bits = n.bit_length() - 1
    j = jnp.arange(n, dtype=jnp.int32)
    rev = jnp.zeros_like(j)
    for b in range(bits):
        rev = rev | (((j >> b) & 1) << (bits - 1 - b))
    a = jnp.take(values, rev, axis=-1)
    batch = values.shape[1:-1]
    nb = len(batch)
    tw_all = _roots_impl(n, inverse)  # [16, n] device twiddle powers

    def stage(acc, s):
        half = jnp.left_shift(jnp.int32(1), s - 1)
        pos = j & (2 * half - 1)
        hi = pos >= half
        k = j & (half - 1)
        ei = (j - pos) + k
        oi = ei + half
        tw = jnp.take(tw_all, jnp.right_shift(jnp.int32(n), s) * k, axis=-1)
        ov = jnp.take(acc, oi, axis=-1)
        ev = jnp.take(acc, ei, axis=-1)
        twd = tw.reshape((NLIMBS,) + (1,) * nb + (n,))
        t = fr.mul(ov, twd)
        out = jnp.where(hi, fr.sub(ev, t), fr.add(ev, t))
        return out, None

    a, _ = jax.lax.scan(stage, a, jnp.arange(1, bits + 1, dtype=jnp.int32))
    if inverse:
        n_inv = fr.to_mont_host(pow(n, -1, FR_MOD))
        ninv = jnp.asarray(n_inv).reshape((NLIMBS,) + (1,) * (nb + 1))
        a = fr.mul(a, ninv)
    return a


@functools.lru_cache(maxsize=None)
def _ntt_jit(n: int, inverse: bool):
    return jax.jit(functools.partial(_ntt_impl, n=n, inverse=inverse))


def ntt(values, inverse: bool = False):
    """DFT over the order-n subgroup of Fr (values limb-major, Montgomery).

    Forward: coefficients -> evaluations at [1, w, w^2, ...].
    Inverse: evaluations -> coefficients.
    Matches the reference DFT (poly.py:113-148) exactly as integers.
    """
    n = values.shape[-1]
    return _ntt_jit(n, inverse)(values)


# ---------------------------------------------------------------------------
# Coset-extended domain transforms (prover's 4n evaluation form).
# ---------------------------------------------------------------------------


def _powers_kernel(offset, n: int):
    """[1, offset, offset^2, ..., offset^(n-1)] in Montgomery form.

    offset: uint32[16] (Montgomery).  Log-depth doubling construction.
    """
    pw = jnp.broadcast_to(jnp.asarray(fr.ONE_MONT)[:, None], (NLIMBS, 1)).astype(
        jnp.uint32
    )
    length = 1
    while length < n:
        step = pw[:, length - 1 : length]
        top = fr.mul(step, offset[:, None])  # offset^length
        ext = fr.mul(pw, top)
        pw = jnp.concatenate([pw, ext], axis=1)
        length *= 2
    return pw[:, :n]


# Raw (trace-inlinable) alias used by fused prover kernels.
def scalar_powers_impl(offset, n: int):
    return _powers_kernel(offset, n)


@functools.lru_cache(maxsize=None)
def _powers_jit(n: int):
    return jax.jit(functools.partial(_powers_kernel, n=n))


def scalar_powers(offset, n: int):
    return _powers_jit(n)(offset)


def _coset_extend_impl(values, offset, n: int):
    coeffs = _ntt_impl(values, n, inverse=True)
    scaled = fr.mul(coeffs, _powers_kernel(offset, n))
    padded = jnp.concatenate(
        [scaled, jnp.zeros((NLIMBS, 3 * n), dtype=jnp.uint32)], axis=1
    )
    return _ntt_impl(padded, 4 * n, inverse=False)


@functools.lru_cache(maxsize=None)
def _coset_extend_jit(n: int):
    return jax.jit(functools.partial(_coset_extend_impl, n=n))


def coset_extend(values, offset):
    """Lagrange values on the n-domain -> values on the offset*q^i 4n-coset.

    Semantics of reference poly.py:156-163 (`to_coset_extended_lagrange`).
    values: uint32[16, n] mont; offset: uint32[16] mont.
    """
    n = values.shape[-1]
    return _coset_extend_jit(n)(values, offset)


def _coset_to_coeffs_impl(values, offset_inv, n4: int):
    shifted = _ntt_impl(values, n4, inverse=True)
    return fr.mul(shifted, _powers_kernel(offset_inv, n4))


@functools.lru_cache(maxsize=None)
def _coset_to_coeffs_jit(n4: int):
    return jax.jit(functools.partial(_coset_to_coeffs_impl, n4=n4))


def coset_to_coeffs(values, offset_inv):
    """Values on the 4n coset -> monomial coefficients (length 4n).

    Semantics of reference poly.py:169-177 (`coset_extended_lagrange_to_coeffs`);
    takes offset^-1 (Montgomery) to avoid an in-kernel inversion.
    """
    n4 = values.shape[-1]
    return _coset_to_coeffs_jit(n4)(values, offset_inv)


# ---------------------------------------------------------------------------
# Barycentric evaluation (reference poly.py:181-195 semantics).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _roots_mont(n: int):
    w = pow(5, (FR_MOD - 1) // n, FR_MOD)
    vals = []
    cur = 1
    for _ in range(n):
        vals.append(cur)
        cur = cur * w % FR_MOD
    return fr.to_mont_host_many(vals)


def _treesum(vec):
    """Sum over the batch axis of uint32[16, n] (n a power of two)."""
    n = vec.shape[-1]
    while n > 1:
        half = n // 2
        vec = fr.add(vec[:, :half], vec[:, half : 2 * half])
        n = half
    return vec[:, 0]


def _barycentric_impl(values, x, n: int):
    roots = _roots_impl(n)
    denom = fr.sub(x[:, None], roots)
    inv_denom = fr.inv(denom)
    terms = fr.mul(fr.mul(values, roots), inv_denom)
    total = _treesum(terms)
    xn = fr.pow_int(x, n)
    scale = fr.mul(
        fr.sub(xn, jnp.asarray(fr.ONE_MONT)),
        jnp.asarray(fr.to_mont_host(pow(n, -1, FR_MOD))),
    )
    return fr.mul(total, scale)


@functools.lru_cache(maxsize=None)
def _barycentric_jit(n: int):
    return jax.jit(functools.partial(_barycentric_impl, n=n))


def barycentric_eval(values, x):
    """Evaluate Lagrange-basis values (uint32[16, n] mont) at x (uint32[16] mont).

    Undefined if x is one of the domain points (division by zero), matching the
    reference's behavior.
    """
    n = values.shape[-1]
    return _barycentric_jit(n)(values, x)
