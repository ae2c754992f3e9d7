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


@functools.lru_cache(maxsize=None)
def _domain(n: int, inverse: bool):
    """Per-size constants: bit-reversal index and per-stage twiddles (mont)."""
    assert n & (n - 1) == 0 and n >= 1
    w = pow(5, (FR_MOD - 1) // n, FR_MOD)
    if inverse:
        w = pow(w, -1, FR_MOD)
    stages = []
    bits = n.bit_length() - 1
    for s in range(1, bits + 1):
        m = 1 << s
        half = m // 2
        base = pow(w, n // m, FR_MOD)
        tw = fr.to_mont_host_many([pow(base, j, FR_MOD) for j in range(half)])
        stages.append(tw)  # uint32[16, half]
    rev = _bit_reverse_indices(n)
    n_inv_mont = fr.to_mont_host(pow(n, -1, FR_MOD))
    return rev, stages, n_inv_mont


@functools.lru_cache(maxsize=None)
def _scan_tables(n: int, inverse: bool):
    """Uniform per-position stage tables so the stage loop is a `lax.scan`.

    For every position j of stage s: the odd-operand index, the even-operand
    index, the twiddle at j, and whether j is the subtracting (high) slot.
    This trades 2x the Montgomery multiplies (the product tw*odd is computed
    at both slots of a butterfly) for a stage-uniform body — the whole NTT
    traces as ONE scan body instead of log2(n) unrolled stages, which is
    what keeps the fused prover kernels compilable (a round-1 n=8 prove
    spent ~3 minutes in XLA compilation, dominated by inlined NTT stages).
    """
    rev, stages, n_inv = _domain(n, inverse)
    bits = n.bit_length() - 1
    odd_idx = np.empty((bits, n), dtype=np.int32)
    even_idx = np.empty((bits, n), dtype=np.int32)
    tw_pos = np.empty((bits, NLIMBS, n), dtype=np.uint32)
    is_hi = np.empty((bits, n), dtype=bool)
    for s in range(1, bits + 1):
        half = 1 << (s - 1)
        m = 2 * half
        j = np.arange(n)
        pos_in_block = j % m
        block_base = j - pos_in_block
        hi = pos_in_block >= half
        k = np.where(hi, pos_in_block - half, pos_in_block)
        even_idx[s - 1] = block_base + k
        odd_idx[s - 1] = block_base + k + half
        tw_pos[s - 1] = stages[s - 1][:, k]
        is_hi[s - 1] = hi
    return rev, odd_idx, even_idx, tw_pos, is_hi, n_inv


def _ntt_impl(values, n: int, inverse: bool):
    """values: uint32[16, *batch, n] (Montgomery); transforms the last axis."""
    if n == 1:
        return values
    rev, odd_idx, even_idx, tw_pos, is_hi, n_inv = _scan_tables(n, inverse)
    a = jnp.take(values, jnp.asarray(rev), axis=-1)
    batch = values.shape[1:-1]
    nb = len(batch)

    def stage(acc, tabs):
        oi, ei, tw, hi = tabs
        ov = jnp.take(acc, oi, axis=-1)
        ev = jnp.take(acc, ei, axis=-1)
        twd = tw.reshape((NLIMBS,) + (1,) * nb + (n,))
        t = fr.mul(ov, twd)
        out = jnp.where(hi, fr.sub(ev, t), fr.add(ev, t))
        return out, None

    tabs = (
        jnp.asarray(odd_idx),
        jnp.asarray(even_idx),
        jnp.asarray(tw_pos),
        jnp.asarray(is_hi),
    )
    a, _ = jax.lax.scan(stage, a, tabs)
    if inverse:
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
    roots = jnp.asarray(_roots_mont(n))
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
