"""Fixed-base Pippenger MSM v3 — signed 16-bit windows, wide incomplete-add
run-scan, sparse run-end extraction.

Replaces the msm2 8-bit pipeline as the large-commit path.  Architecture
changes (each validated by on-chip microbenchmarks, see docs/PERF.md):

1. **Signed 16-bit windows**: 16 windows (one per 16-bit limb — digit
   extraction is free) with digits recoded into [-2^15, 2^15]; bucket id is
   |digit| and the base point is negated at gather time when the digit is
   negative.  Halves the insertion count vs 8-bit windows (16n vs 32n) and
   halves the window-table memory.
2. **Wide scan with an incomplete mixed add**: the sorted-run accumulation
   runs as S chained steps of width C = K/S (C up to 2^17 lanes), each one
   fused Pallas kernel doing an 11-mul *incomplete* Jacobian+affine add — no
   infinity or doubling branches.  Safe because every in-run partial sum is
   a subset sum of distinct SRS multiples: a collision (H = 0) or identity
   would be a discrete-log relation on the fixed trusted SRS.  Run starts
   reset the accumulator to the incoming point via a mask select inside the
   kernel.  Measured ~122M adds/s at width 2^17 vs ~26-46M for the complete
   madd — and vs ~11M for the old 1024-lane Pallas grid scan.
3. **Sparse run-end extraction**: with 2^15+1 buckets a dense [NB, C]
   bucket matrix is infeasible, so run ends (<= NB + C of them, a static
   bound) are compacted by a second key sort, merged once more by a short
   Jacobian run-scan, then scattered into a dense [48, 2^15] bucket array
   by a bounded-multiplicity searchsorted gather (J complete adds).  The
   classic sum_b b*B_b reduction is a work-efficient Blelloch suffix scan
   (~2*NB adds) instead of the NB*log(NB) Hillis-Steele version.

Reference semantics anchor: curve.py:38-111 `ec_lincomb` (the reference
computes the same linear combination one Python bignum op at a time).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .limbs import fq, NLIMBS
from . import pallas_mont as PM
from .pallas_mont import KQ, _R, _LANES, _read, _write, _const_limbs
from .msm2 import jadd_stacked, _fold_stacked, jac_to_affine_batch

WBITS = 16
NW = 16                      # 256 / 16 windows == one per 16-bit limb
NBUCKET = (1 << 15) + 1      # |signed digit| in [0, 2^15]
_BIG = 1 << 20               # dead-entry key sentinel (> any bucket id)
_TILE = _R * _LANES


# ---------------------------------------------------------------------------
# Incomplete point-add kernels (fresh-mask reset, no branches).
# ---------------------------------------------------------------------------

def _kern_madd_inc(k, p, q_aff, fresh):
    """Jacobian += affine, 11 muls; fresh lanes restart at (x2, y2, 1).

    Incomplete: assumes p is non-identity and p != +-q on live lanes (see
    module docstring for why that holds for in-run partial sums)."""
    X1, Y1, Z1 = p
    X2, Y2 = q_aff
    Z1Z1 = k.sqr(Z1)
    U2 = k.mul(X2, Z1Z1)
    S2 = k.mul(Y2, k.mul(Z1, Z1Z1))
    H = k.sub(U2, X1)
    R = k.sub(S2, Y1)
    HH = k.sqr(H)
    HHH = k.mul(H, HH)
    V = k.mul(X1, HH)
    X3 = k.sub(k.sub(k.sqr(R), HHH), k.add(V, V))
    Y3 = k.sub(k.mul(R, k.sub(V, X3)), k.mul(Y1, HHH))
    Z3 = k.mul(Z1, H)
    one = _const_limbs(k.c["ONE"], Z1[0])
    X3 = k.select(fresh, X2, X3)
    Y3 = k.select(fresh, Y2, Y3)
    Z3 = k.select(fresh, one, Z3)
    return X3, Y3, Z3


def _kern_jadd_inc(k, p, q, fresh):
    """Jacobian += Jacobian, 12 muls; fresh lanes restart at q."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = k.sqr(Z1)
    Z2Z2 = k.sqr(Z2)
    U1 = k.mul(X1, Z2Z2)
    U2 = k.mul(X2, Z1Z1)
    S1 = k.mul(Y1, k.mul(Z2, Z2Z2))
    S2 = k.mul(Y2, k.mul(Z1, Z1Z1))
    H = k.sub(U2, U1)
    R = k.sub(S2, S1)
    HH = k.sqr(H)
    HHH = k.mul(H, HH)
    V = k.mul(U1, HH)
    X3 = k.sub(k.sub(k.sqr(R), HHH), k.add(V, V))
    Y3 = k.sub(k.mul(R, k.sub(V, X3)), k.mul(S1, HHH))
    Z3 = k.mul(k.mul(Z1, Z2), H)
    X3 = k.select(fresh, X2, X3)
    Y3 = k.select(fresh, Y2, Y3)
    Z3 = k.select(fresh, Z2, Z3)
    return X3, Y3, Z3


def _madd_inc_kernel(a_ref, b_ref, f_ref, o_ref):
    p = (_read(a_ref, 0), _read(a_ref, NLIMBS), _read(a_ref, 2 * NLIMBS))
    q = (_read(b_ref, 0), _read(b_ref, NLIMBS))
    X, Y, Z = _kern_madd_inc(KQ, p, q, f_ref[0] != 0)
    _write(o_ref, 0, X)
    _write(o_ref, NLIMBS, Y)
    _write(o_ref, 2 * NLIMBS, Z)


def _jadd_inc_kernel(a_ref, b_ref, f_ref, o_ref):
    p = (_read(a_ref, 0), _read(a_ref, NLIMBS), _read(a_ref, 2 * NLIMBS))
    q = (_read(b_ref, 0), _read(b_ref, NLIMBS), _read(b_ref, 2 * NLIMBS))
    X, Y, Z = _kern_jadd_inc(KQ, p, q, f_ref[0] != 0)
    _write(o_ref, 0, X)
    _write(o_ref, NLIMBS, Y)
    _write(o_ref, 2 * NLIMBS, Z)


@functools.lru_cache(maxsize=None)
def _inc_call(which, nblocks):
    def spec(rows):
        return pl.BlockSpec((rows, _R, _LANES), lambda i: (0, i, 0))

    qrows = 2 * NLIMBS if which == "madd" else 3 * NLIMBS
    kern = _madd_inc_kernel if which == "madd" else _jadd_inc_kernel
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[spec(3 * NLIMBS), spec(qrows), spec(1)],
        out_specs=spec(3 * NLIMBS),
        out_shape=jax.ShapeDtypeStruct(
            (3 * NLIMBS, nblocks * _R, _LANES), jnp.uint32
        ),
    )


# ---------------------------------------------------------------------------
# Signed-digit recoding (digit w == 16-bit limb w, recoded to [-2^15, 2^15]).
# ---------------------------------------------------------------------------

def signed_digits16(raw, n_table: int):
    """Canonical limbs [16, m] -> (keys [16m] i32, payload [16m] i32).

    keys are bucket ids |digit|; payload packs (table index << 1) | sign
    where table index = w * n_table + i points into the window-major affine
    tables.  Window-major flattening.
    """
    m = raw.shape[1]
    keys = []
    signs = []
    carry = jnp.zeros((m,), jnp.uint32)
    for w in range(NW):
        e = raw[w] + carry  # < 2^16 + 1
        big = e > (1 << 15)
        keys.append(jnp.where(big, (1 << 16) - e, e).astype(jnp.int32))
        signs.append(big)
        carry = big.astype(jnp.uint32)
    # BN254 scalars < 2^254 keep the top limb below 2^14: the final carry
    # cannot escape window 15.
    key = jnp.stack(keys, axis=0).reshape(-1)
    sign = jnp.stack(signs, axis=0).reshape(-1)
    idx = (
        jnp.arange(NW, dtype=jnp.int32)[:, None] * n_table
        + jnp.arange(m, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    payload = (idx << 1) | sign.astype(jnp.int32)
    return key, payload


def build_affine_tables16(x, y):
    """Affine SRS bases [16, n] -> affine tables [16, 16n], window-major.

    Window w holds 2^(16w) * P_i; 16 fused doublings between windows."""
    from .curve import jac_from_affine

    outs_x, outs_y, outs_z = [], [], []
    cur = jac_from_affine(x, y)
    for w in range(NW):
        outs_x.append(cur[0])
        outs_y.append(cur[1])
        outs_z.append(cur[2])
        if w < NW - 1:
            cur = PM.jac_double_n(cur, WBITS)
    X = jnp.concatenate(outs_x, axis=1)
    Y = jnp.concatenate(outs_y, axis=1)
    Z = jnp.concatenate(outs_z, axis=1)
    return jac_to_affine_batch(X, Y, Z)


# ---------------------------------------------------------------------------
# Wide run-scan (sorted keys -> per-run prefix emissions).
# ---------------------------------------------------------------------------

def _run_scan(pts, kc, S, C, which):
    """pts: madd -> [32, C, S] affine; jadd -> [48, C, S] Jacobian.
    kc: [C, S] sorted-within-chunk keys.  Returns ys [S, rows, C] prefixes.
    """
    rows = pts.shape[0]
    fresh = jnp.concatenate(
        [jnp.ones((C, 1), jnp.bool_), kc[:, 1:] != kc[:, :-1]], axis=1
    )
    xs = (
        pts.transpose(2, 0, 1).reshape(S, rows, C // _LANES, _LANES),
        fresh.T.reshape(S, 1, C // _LANES, _LANES).astype(jnp.int32),
    )
    call = _inc_call(which, C // _TILE)

    def body(acc, x):
        pt, fr_ = x
        acc = call(acc, pt, fr_)
        return acc, acc

    init = jnp.zeros((3 * NLIMBS, C // _LANES, _LANES), jnp.uint32)
    _, ys = jax.lax.scan(body, init, xs)
    return ys.reshape(S, 3 * NLIMBS, C)


def _run_ends(kc, S, C):
    """(valid run-end mask, ys-flat positions) for chunked keys [C, S]."""
    ends = jnp.concatenate(
        [kc[:, 1:] != kc[:, :-1], jnp.ones((C, 1), jnp.bool_)], axis=1
    )
    valid = ends & (kc > 0)
    pos = (
        jnp.arange(S, dtype=jnp.int32)[None, :] * C
        + jnp.arange(C, dtype=jnp.int32)[:, None]
    )
    return valid, pos


def _extract_sorted(ysf, kc, S, C, T):
    """Compact the valid run ends of a scan, sorted by key.

    ysf: [48, S*C] flat prefixes; returns (keys [T] ascending with _BIG
    tail, pts [48, T])."""
    valid, pos = _run_ends(kc, S, C)
    ekey = jnp.where(valid, kc, _BIG).reshape(-1)
    sk, sp = jax.lax.sort_key_val(ekey, pos.reshape(-1))
    sk = sk[:T]
    pts = ysf[:, sp[:T]]
    return sk, pts


# ---------------------------------------------------------------------------
# Dense bucket reduction (bounded-multiplicity scatter + Blelloch suffix).
# ---------------------------------------------------------------------------

_J = 8  # max entries per bucket the dense gather folds (checked; fallback)

_NB2 = 1 << 15  # dense bucket array covers b in [1, 2^15]


def _dense_buckets(keys, pts, J: int):
    """keys [T] ascending (<= 2^15 real, _BIG tail), pts [48, T] ->
    (dense [48, 2^15] bucket sums for b = 1..2^15, max multiplicity)."""
    T = keys.shape[0]
    bvec = jnp.arange(1, _NB2 + 1, dtype=jnp.int32)
    start = jnp.searchsorted(keys, bvec)
    stop = jnp.searchsorted(keys, bvec + 1)
    maxmult = jnp.max(stop - start)
    idc = np.concatenate(
        [fq.ONE_MONT, fq.ONE_MONT, np.zeros(NLIMBS, np.uint32)]
    )
    acc = jnp.broadcast_to(
        jnp.asarray(idc)[:, None], (3 * NLIMBS, _NB2)
    ).astype(jnp.uint32)
    for j in range(J):
        idx = start + j
        ok = (idx < stop) & (idx < T)
        gi = jnp.minimum(idx, T - 1)
        pt = pts[:, gi]
        mask = ok.astype(jnp.uint32)[None, :]
        pt = jnp.concatenate(
            [pt[: 2 * NLIMBS], pt[2 * NLIMBS :] * mask], axis=0
        )  # Z=0 -> identity, complete add skips it
        acc = jadd_stacked(acc, pt)
    return acc, maxmult


def _blelloch_suffix_fold(dense):
    """sum_{b=1..2^15} b * B_b for dense [48, 2^15] (index i holds b=i+1).

    Inclusive suffix sums S_t = sum_{b>=t} B_b via a work-efficient Blelloch
    scan (~2*NB complete adds), then sum_b b*B_b = sum_t S_t by a fold."""
    a = dense[:, ::-1]  # prefix scan on reversed = suffix scan
    levels = []
    cur = a
    while cur.shape[1] > 1:
        levels.append(cur)
        cur = jadd_stacked(cur[:, 0::2], cur[:, 1::2])
    idc = np.concatenate(
        [fq.ONE_MONT, fq.ONE_MONT, np.zeros(NLIMBS, np.uint32)]
    )
    ex = jnp.broadcast_to(jnp.asarray(idc)[:, None], (3 * NLIMBS, 1)).astype(
        jnp.uint32
    )
    for lev in reversed(levels):
        w = lev.shape[1]
        left = ex
        right = jadd_stacked(ex, lev[:, 0::2])
        ex = jnp.stack([left, right], axis=2).reshape(3 * NLIMBS, w)
    inc = jadd_stacked(ex, a)  # inclusive prefix of reversed = suffix
    return _fold_stacked(inc[:, ::-1])[:, 0]


# ---------------------------------------------------------------------------
# Full pipeline.
# ---------------------------------------------------------------------------

def _plan(k: int):
    """Choose (S, C, padded K) with C a multiple of the kernel tile."""
    c = max(_TILE, min(1 << 17, k // 32))
    c = 1 << (c.bit_length() - 1)  # pow2 <= c
    s = -(-k // c)
    return s, c, s * c


def _msm16_impl(tabx, taby, key, payload, S, C, T, T2, J):
    k = key.shape[0]
    skey, spay = jax.lax.sort_key_val(key, payload)
    sidx = spay >> 1
    sneg = (spay & 1) == 1
    px = tabx[:, sidx]
    py = taby[:, sidx]
    py = jnp.where(sneg[None], fq.sub(jnp.zeros_like(py), py), py)

    kc = skey.reshape(C, S)
    pts = jnp.concatenate([px, py], axis=0).reshape(2 * NLIMBS, C, S)
    ys = _run_scan(pts, kc, S, C, "madd")
    ysf = ys.transpose(1, 0, 2).reshape(3 * NLIMBS, S * C)
    k2, p2 = _extract_sorted(ysf, kc, S, C, T)

    # One merge round: scan the (sorted) run partials so each bucket's
    # entries collapse to at most a few, then extract again.
    S2 = 16
    C2 = T // S2
    kc2 = k2.reshape(C2, S2)
    ys2 = _run_scan(p2.reshape(3 * NLIMBS, C2, S2), kc2, S2, C2, "jadd")
    ys2f = ys2.transpose(1, 0, 2).reshape(3 * NLIMBS, S2 * C2)
    k3, p3 = _extract_sorted(ys2f, kc2, S2, C2, T2)

    dense, maxmult = _dense_buckets(k3, p3, J)
    return _blelloch_suffix_fold(dense), maxmult


@functools.lru_cache(maxsize=None)
def _msm16_jit(S, C, T, T2, J):
    return jax.jit(
        functools.partial(_msm16_impl, S=S, C=C, T=T, T2=T2, J=J)
    )


def _pow2_at_least(v):
    return 1 << (v - 1).bit_length()


def msm_fixed_affine16(tabx, taby, key, payload):
    """MSM over 16-bit-window affine tables.

    tabx/taby: [16, 16n] window-major; key/payload from `signed_digits16`.
    Returns ([48] Jacobian limbs, max bucket multiplicity at the dense
    stage — caller must fall back to a complete path if it exceeds _J
    (astronomically unlikely for non-adversarial scalar distributions, and
    merely yields an invalid proof, never a soundness issue)."""
    k = key.shape[0]
    S, C, kpad = _plan(k)
    if kpad != k:
        key = jnp.concatenate(
            [key, jnp.zeros(kpad - k, key.dtype)]
        )
        payload = jnp.concatenate(
            [payload, jnp.zeros(kpad - k, payload.dtype)]
        )
    T = _pow2_at_least(NBUCKET + C + 1)
    T2 = _pow2_at_least(NBUCKET + T // 16 + 1)
    res, maxmult = _msm16_jit(S, C, T, T2, _J)(tabx, taby, key, payload)
    return res, maxmult
