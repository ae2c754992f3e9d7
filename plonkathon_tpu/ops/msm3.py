"""Fixed-base Pippenger MSM v3 — signed 16-bit windows, packed wide
incomplete-add run-scan, sparse run-end extraction.

Replaces the msm2 8-bit pipeline as the large-commit path.  Architecture
(each choice validated by on-chip measurement, see docs/PERF.md):

1. **Signed 16-bit windows**: 16 windows (one per 16-bit limb — digit
   extraction is free) with digits recoded into [-2^15, 2^15]; bucket id is
   |digit| and the base point is negated in-kernel when the digit is
   negative.  Halves the insertion count vs 8-bit windows (16n vs 32n).
2. **Packed point layout**: table points are stored as 16 u32 rows packing
   two 16-bit limbs each (x||y = 512 coordinate bits per point).  The
   dominant pipeline cost is the base gather, and TPU gathers are
   element-count-bound (~560M gathered u32/s measured, layout-independent),
   so halving the element count halves the bottleneck: 119 ms vs 276 ms for
   the unpacked layout at K=2^22.  Kernels unpack/repack in VMEM (a few
   shifts — free next to the 254-bit multiplies).  Run prefixes, the scan
   carry, and the merge stage stay packed for the same reason.
3. **Step-major order via index permutation**: the scan consumes chunk c's
   elements one per step, which naively requires a [32, C, S] -> [S, 32, C]
   transpose of the 537 MB point array (~300 ms).  Instead the *index
   vector* is permuted (16 MB, ~6 ms) so the single gather lands the points
   directly in step-major order; every scan step then reads a contiguous
   block.
4. **Wide scan with an incomplete mixed add**: S chained steps of width
   C = K/S (up to 2^17 lanes), each one fused Pallas kernel doing an 11-mul
   *incomplete* Jacobian+affine add — no infinity or doubling branches.
   Safe because every in-run partial sum is a subset sum of distinct SRS
   multiples: a collision (H = 0) or an identity would be a discrete-log
   relation on the fixed trusted SRS.  Run starts reset the accumulator to
   the incoming point via a mask select inside the kernel.  Measured ~122M
   adds/s at width 2^17 vs ~11M for the old 1024-lane grid scan.
5. **Sparse run-end extraction**: with 2^15+1 buckets a dense [NB, C]
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

from .limbs import fq, NLIMBS, LIMB_MASK, LIMB_BITS
from . import pallas_mont as PM
from .pallas_mont import KQ, _R, _LANES, _read, _write, _const_limbs
from .msm2 import jadd_stacked, _fold_stacked, jac_to_affine_batch

WBITS = 16
NW = 16                      # 256 / 16 windows == one per 16-bit limb
NBUCKET = (1 << 15) + 1      # |signed digit| in [0, 2^15]
_BIG = 1 << 20               # dead-entry key sentinel (> any bucket id)
_TILE = _R * _LANES
PACKED_PT = 2 * NLIMBS // 2    # 16 u32 rows per packed affine point
PACKED_JAC = 3 * NLIMBS // 2   # 24 u32 rows per packed Jacobian point


# ---------------------------------------------------------------------------
# Limb packing (2 x 16-bit limbs per u32 lane).
# ---------------------------------------------------------------------------

def _unpack_rows(rows):
    """k packed [..] arrays -> 2k 16-bit limb arrays (in-kernel or XLA)."""
    out = []
    for v in rows:
        out.append(v & LIMB_MASK)
        out.append(v >> LIMB_BITS)
    return out


def _pack_rows(limbs):
    """2k 16-bit limb arrays -> k packed arrays."""
    return [
        limbs[2 * i] | (limbs[2 * i + 1] << LIMB_BITS)
        for i in range(len(limbs) // 2)
    ]


def pack_array(a):
    """[2k*16lims? ...] XLA-level: [2k, *] u32 limb rows -> [k, *] packed."""
    return jnp.stack(_pack_rows([a[i] for i in range(a.shape[0])]), axis=0)


def unpack_array(p):
    """XLA-level inverse of `pack_array`."""
    return jnp.stack(_unpack_rows([p[i] for i in range(p.shape[0])]), axis=0)


# ---------------------------------------------------------------------------
# Incomplete point-add kernels (mask bit 0: fresh reset; bit 1: negate q.y).
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


def _madd_packed_kernel(a_ref, b_ref, m_ref, o_ref):
    acc = _unpack_rows([a_ref[i] for i in range(PACKED_JAC)])
    pq = _unpack_rows([b_ref[i] for i in range(PACKED_PT)])
    x2, y2 = pq[:NLIMBS], pq[NLIMBS:]
    m = m_ref[0]
    fresh = (m & 1) != 0
    neg = (m & 2) != 0
    # -y = 2p - y (lazy domain); affine y is never 0 on prime-order G1.
    zero = [jnp.zeros_like(y2[0])] * NLIMBS
    y2 = KQ.select(neg, KQ.sub(zero, y2), y2)
    X, Y, Z = _kern_madd_inc(
        KQ, (acc[: NLIMBS], acc[NLIMBS : 2 * NLIMBS], acc[2 * NLIMBS :]),
        (x2, y2), fresh,
    )
    packed = _pack_rows(X + Y + Z)
    for i in range(PACKED_JAC):
        o_ref[i] = packed[i]


def _jadd_packed_kernel(a_ref, b_ref, m_ref, o_ref):
    """mask bit 0: fresh (restart at q); bit 2: dead (keep the accumulator —
    used by the dense-bucket stage for lanes past their entry count)."""
    acc = _unpack_rows([a_ref[i] for i in range(PACKED_JAC)])
    q = _unpack_rows([b_ref[i] for i in range(PACKED_JAC)])
    m = m_ref[0]
    fresh = (m & 1) != 0
    dead = (m & 4) != 0
    pa = (acc[: NLIMBS], acc[NLIMBS : 2 * NLIMBS], acc[2 * NLIMBS :])
    X, Y, Z = _kern_jadd_inc(
        KQ, pa,
        (q[: NLIMBS], q[NLIMBS : 2 * NLIMBS], q[2 * NLIMBS :]),
        fresh,
    )
    X = KQ.select(dead, pa[0], X)
    Y = KQ.select(dead, pa[1], Y)
    Z = KQ.select(dead, pa[2], Z)
    packed = _pack_rows(X + Y + Z)
    for i in range(PACKED_JAC):
        o_ref[i] = packed[i]


@functools.lru_cache(maxsize=None)
def _inc_call(which, nblocks):
    def spec(rows):
        return pl.BlockSpec((rows, _R, _LANES), lambda i: (0, i, 0))

    qrows = PACKED_PT if which == "madd" else PACKED_JAC
    kern = _madd_packed_kernel if which == "madd" else _jadd_packed_kernel
    return pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[spec(PACKED_JAC), spec(qrows), spec(1)],
        out_specs=spec(PACKED_JAC),
        out_shape=jax.ShapeDtypeStruct(
            (PACKED_JAC, nblocks * _R, _LANES), jnp.uint32
        ),
    )


# ---------------------------------------------------------------------------
# Signed-digit recoding (digit w == 16-bit limb w, recoded to [-2^15, 2^15]).
# ---------------------------------------------------------------------------

def signed_digits16(raw, n_table: int):
    """Canonical limbs [16, m] -> (keys [16m] i32, payload [16m] i32).

    keys are bucket ids |digit|; payload packs (table index << 1) | sign
    where table index = w * n_table + i points into the window-major packed
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
    """Affine SRS bases [16, n] -> PACKED affine tables [16, 16n].

    Window w (holding 2^(16w) * P_i, 16 fused doublings apart) lands at
    columns [w*n, (w+1)*n); row r packs limbs (2r, 2r+1) of x||y."""
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
    ax, ay = jac_to_affine_batch(X, Y, Z)
    return pack_array(jnp.concatenate([fq.canon(ax), fq.canon(ay)], axis=0))


def rows_from_packed(tabp):
    """Packed window-major table [16, 16n] -> row layout [16n, 128].

    One point per 128-lane row (16 packed u32 + 112 zero lanes); see the
    row-layout branch in `_msm16_impl` for why."""
    return jnp.pad(tabp.T, ((0, 0), (0, _LANES - PACKED_PT)))


# ---------------------------------------------------------------------------
# Wide run-scan (sorted keys -> per-run prefix emissions).
# ---------------------------------------------------------------------------

def _run_scan(pts_sm, mask_sm, S, C, which):
    """pts_sm: [S, rows, C] step-major packed points (madd: 16 rows affine;
    jadd: 24 rows Jacobian); mask_sm: [S, C] i32 (bit0 fresh, bit1 sign).
    Returns ys [S, 24, C] packed prefixes."""
    rows = pts_sm.shape[1]
    xs = (
        pts_sm.reshape(S, rows, C // _LANES, _LANES),
        mask_sm.reshape(S, 1, C // _LANES, _LANES),
    )
    call = _inc_call(which, C // _TILE)

    def body(acc, x):
        pt, mk = x
        acc = call(acc, pt, mk)
        return acc, acc

    init = jnp.zeros((PACKED_JAC, C // _LANES, _LANES), jnp.uint32)
    _, ys = jax.lax.scan(body, init, xs)
    return ys.reshape(S, PACKED_JAC, C)


def _extract_sorted(ys, ksm, S, C, T):
    """Compact the valid run ends of a scan, sorted by key.

    ys: [S, 24, C] packed prefixes; ksm: [S, C] step-major keys.  Returns
    (keys [T] ascending with _BIG tail, packed pts [24, T]).

    NB: a sort-free variant (cumsum compaction + 23-step vectorized binary
    search over the chunk-major order, which is already key-ascending) was
    tried and measured SLOWER on v5e — 193 ms vs 140 ms full-pipeline at
    2^18: the dependent binary-search gather chain costs more than this
    bitonic sort (the whole extract is 12.4 ms of the 140)."""
    ends = jnp.concatenate(
        [ksm[1:] != ksm[:-1], jnp.ones((1, C), jnp.bool_)], axis=0
    )
    valid = ends & (ksm > 0) & (ksm < _BIG)
    ekey = jnp.where(valid, ksm, _BIG).reshape(-1)  # flat (s, c) order
    pos = jnp.arange(S * C, dtype=jnp.int32)
    sk, sp = jax.lax.sort_key_val(ekey, pos)
    sk = sk[:T]
    se = sp[:T] // C
    ce = sp[:T] % C
    pts = ys[se, :, ce].T  # [24, T]
    return sk, pts


def _step_major(flat, S, C):
    """[S*C]-flat chunk-major (chunk c = positions [cS, (c+1)S)) ->
    step-major [S, C]: out[s, c] = flat[c*S + s]."""
    return flat.reshape(C, S).T


# ---------------------------------------------------------------------------
# Dense bucket reduction (bounded-multiplicity scatter + Blelloch suffix).
# ---------------------------------------------------------------------------

_J = 8  # max entries per bucket the dense gather folds (checked; fallback)

_NB2 = 1 << 15  # dense bucket array covers b in [1, 2^15]


def _dense_buckets(keys, pts, J: int):
    """keys [T] ascending (<= 2^15 real, _BIG tail), pts [48, T] unpacked ->
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


def _dense_buckets_pallas(keys, pts_packed, J: int):
    """Pallas variant of `_dense_buckets`: keys [T] ascending, pts_packed
    [24, T] -> (dense [48, 2^15] unpacked bucket sums, max multiplicity).

    The J gather rounds stay in XLA (dynamic indices), but the J bucket
    additions run through the packed incomplete-add kernel (~2 ms for
    J*2^15 adds vs ~55 ms for the XLA complete-add ladder).  Incomplete is
    safe: every accumulator is a distinct-subset sum of SRS multiples (see
    module docstring); dead lanes (entry count <= j) keep their value via
    mask bit 2, so empty buckets hold the initial Z=0 identity."""
    T = keys.shape[0]
    bvec = jnp.arange(1, _NB2 + 1, dtype=jnp.int32)
    start = jnp.searchsorted(keys, bvec)
    stop = jnp.searchsorted(keys, bvec + 1)
    maxmult = jnp.max(stop - start)
    idc = np.concatenate(
        [fq.ONE_MONT, fq.ONE_MONT, np.zeros(NLIMBS, np.uint32)]
    )
    acc = pack_array(
        jnp.broadcast_to(jnp.asarray(idc)[:, None], (3 * NLIMBS, _NB2))
        .astype(jnp.uint32)
    ).reshape(PACKED_JAC, _NB2 // _LANES, _LANES)
    call = _inc_call("jadd", _NB2 // _TILE)
    for j in range(J):
        idx = start + j
        ok = (idx < stop) & (idx < T)
        gi = jnp.minimum(idx, T - 1)
        q = pts_packed[:, gi]  # [24, NB2] packed gather
        mask = jnp.where(ok, 1 if j == 0 else 0, 4).astype(jnp.int32)
        acc = call(
            acc,
            q.reshape(PACKED_JAC, _NB2 // _LANES, _LANES),
            mask.reshape(1, _NB2 // _LANES, _LANES),
        )
    dense = unpack_array(acc.reshape(PACKED_JAC, _NB2))
    return dense, maxmult


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


def _msm16_impl(tabp, key, payload, S, C, T, T2, J):
    skey, spay = jax.lax.sort_key_val(key, payload)
    # Step-major permutation of the small arrays; the single packed gather
    # then produces the scan's layout directly (no big transposes).
    ksm = _step_major(skey, S, C)
    psm = _step_major(spay, S, C)
    sidx = psm >> 1
    if tabp.ndim == 2 and tabp.shape[1] == _LANES:
        # Row layout [16n, 128]: one point per padded 128-lane row.  The
        # sublane-axis `take` of whole rows hits the TPU's row-DMA gather
        # path (~45 ms for 2^22 rows vs ~120 ms for the same data through
        # the element-wise lane-axis gather) at the cost of 8x HBM for the
        # table; the minor [S*C,16] -> [S,16,C] transpose is ~3 ms.
        rows = tabp[sidx.reshape(-1)]  # [S*C, 128]
        pts_sm = (
            rows[:, :PACKED_PT].reshape(S, C, PACKED_PT).transpose(0, 2, 1)
        )
    else:
        pts_sm = tabp[:, sidx.reshape(-1)].reshape(PACKED_PT, S, C)
        pts_sm = pts_sm.transpose(1, 0, 2)  # cheap: metadata + small tiles
    fresh = jnp.concatenate(
        [jnp.ones((1, C), jnp.bool_), ksm[1:] != ksm[:-1]], axis=0
    )
    mask_sm = fresh.astype(jnp.int32) | ((psm & 1) << 1)

    ys = _run_scan(pts_sm, mask_sm, S, C, "madd")
    k2, p2 = _extract_sorted(ys, ksm, S, C, T)

    # One merge round: scan the (sorted) run partials so each bucket's
    # entries collapse to at most a few, then extract again.
    S2 = 16
    C2 = T // S2
    k2sm = _step_major(k2, S2, C2)
    p2sm = _step_major_pts(p2, S2, C2)
    fresh2 = jnp.concatenate(
        [jnp.ones((1, C2), jnp.bool_), k2sm[1:] != k2sm[:-1]], axis=0
    )
    ys2 = _run_scan(p2sm, fresh2.astype(jnp.int32), S2, C2, "jadd")
    k3, p3 = _extract_sorted(ys2, k2sm, S2, C2, T2)

    dense, maxmult = _dense_buckets_pallas(
        jnp.where(k3 >= _BIG, _BIG, k3), p3, J
    )
    return _blelloch_suffix_fold(dense), maxmult


def _step_major_pts(p, S, C):
    """[24, S*C] chunk-major points -> [S, 24, C] step-major (small T)."""
    return p.reshape(PACKED_JAC, C, S).transpose(2, 0, 1)


@functools.lru_cache(maxsize=None)
def _msm16_jit(S, C, T, T2, J):
    return jax.jit(
        functools.partial(_msm16_impl, S=S, C=C, T=T, T2=T2, J=J)
    )


def _pow2_at_least(v):
    return 1 << (v - 1).bit_length()


def msm_fixed_affine16(tabp, key, payload):
    """MSM over packed 16-bit-window affine tables.

    tabp: [16, 16n] packed window-major; key/payload from `signed_digits16`.
    Returns ([48] Jacobian limbs, max bucket multiplicity at the dense
    stage) — caller must fall back to a complete path if it exceeds _J
    (astronomically unlikely for non-adversarial scalar distributions, and
    merely yields an invalid proof, never a soundness issue)."""
    k = key.shape[0]
    S, C, kpad = _plan(k)
    if kpad != k:
        key = jnp.concatenate([key, jnp.zeros(kpad - k, key.dtype)])
        payload = jnp.concatenate(
            [payload, jnp.zeros(kpad - k, payload.dtype)]
        )
    T = min(_pow2_at_least(NBUCKET + C + 1), kpad)
    T2 = min(_pow2_at_least(NBUCKET + T // 16 + 1), T)
    res, maxmult = _msm16_jit(S, C, T, T2, _J)(tabp, key, payload)
    return res, maxmult
