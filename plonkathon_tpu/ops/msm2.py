"""Fixed-base Pippenger MSM v2 — Pallas run-scan bucket accumulation.

Pipeline (replaces ops/curve.py `_msm_kernel`'s 128-step XLA scan, which was
dispatch- and HBM-bound at ~2k points/s; reference semantics anchor is
curve.py:38-111 `ec_lincomb`):

1. 8-bit window digits over pre-shifted affine bases (all 32 windows share
   one 256-bucket problem because base w of point i is 2^(8w) * P_i).
2. `argsort` digits; gather bases into sorted order (XLA sort + gather).
3. **Pallas run-scan kernel**: sorted positions are split into C chunks of
   S steps; grid = (C/1024, S) with a [48, 8, 128] VMEM accumulator that
   persists across the S grid steps — each step is one fused Jacobian+affine
   `madd` on 1024 lanes, and the running prefix is emitted every step.
   All intermediates stay in VMEM; HBM traffic is exactly the sorted points
   in + prefixes out.
4. Dense bucket extraction WITHOUT scatter: within a chunk the digits are
   sorted, so the last prefix of digit b sits at `searchsorted(dc, b+1)-1`
   — a vectorized int computation + one `take_along_axis` gather (TPU
   gathers are fine; scatters are not).
5. Per-chunk buckets fold pairwise (log2 C fused adds), then the classic
   suffix-scan + fold turns bucket sums into sum_b b*B_b.

Bases are AFFINE window tables (x, y only): the scan uses mixed addition
(11 field muls vs 16) and the tables are 2/3 the memory of Jacobian.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import fq, fr, NLIMBS
from . import pallas_mont as PM
from .pallas_mont import KQ, _R, _LANES, _read, _write, _const_limbs

WINDOW_BITS = 8
NWINDOWS = 32
NB = 1 << WINDOW_BITS

_TILE = _R * _LANES  # 1024 chunk-lanes per grid block


# ---------------------------------------------------------------------------
# Run-scan kernel.
# ---------------------------------------------------------------------------

_UNROLL = 16  # sorted-scan steps per grid iteration (fori'd in-kernel)


def _scan_kernel(unroll, d_ref, prev_ref, pt_ref, out_ref, acc_ref):
    """`unroll` steps of the per-chunk run accumulation on a 1024-lane tile.

    d/prev: (U, R, 128) i32 current/previous digit per lane.
    pt:     (U, 32, R, 128) u32 — affine (x, y) limbs of the step points.
    out:    (U, 48, R, 128) u32 — running prefix AFTER each step.
    acc:    [48, R, 128] VMEM scratch, persists across the S/U grid steps.

    The U sub-steps run in an in-kernel fori_loop (body traced once), so
    per-grid-step overhead (block DMA, loop bookkeeping) amortizes over U
    fused mixed-adds — the 1-step variant measured grid-overhead-bound at
    ~100us/step vs ~2us of VPU compute.
    """
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        one = _const_limbs(KQ.c["ONE"], d_ref[0].astype(jnp.uint32))
        for i in range(NLIMBS):
            acc_ref[i] = one[i]
            acc_ref[NLIMBS + i] = one[i]
            acc_ref[2 * NLIMBS + i] = jnp.zeros_like(one[i])

    def step(u, _):
        du = d_ref[pl.ds(u, 1)][0]
        pu = prev_ref[pl.ds(u, 1)][0]
        ptu = pt_ref[pl.ds(u, 1)][0]            # (32, R, 128)
        fresh = du != pu
        one = _const_limbs(KQ.c["ONE"], acc_ref[0])
        zero = [jnp.zeros_like(acc_ref[0])] * NLIMBS
        accX = KQ.select(fresh, one, [acc_ref[i] for i in range(NLIMBS)])
        accY = KQ.select(fresh, one, [acc_ref[NLIMBS + i] for i in range(NLIMBS)])
        accZ = KQ.select(
            fresh, zero, [acc_ref[2 * NLIMBS + i] for i in range(NLIMBS)]
        )
        px = [ptu[i] for i in range(NLIMBS)]
        py = [ptu[NLIMBS + i] for i in range(NLIMBS)]
        X, Y, Z = PM._kern_madd(KQ, (accX, accY, accZ), (px, py))
        for i in range(NLIMBS):
            acc_ref[i] = X[i]
            acc_ref[NLIMBS + i] = Y[i]
            acc_ref[2 * NLIMBS + i] = Z[i]
        out_ref[pl.ds(u, 1)] = jnp.stack(X + Y + Z, axis=0)[None]
        return 0

    jax.lax.fori_loop(0, unroll, step, 0)


@functools.lru_cache(maxsize=None)
def _scan_call(ctiles, steps):
    u = min(_UNROLL, steps)
    assert steps % u == 0
    ispec = pl.BlockSpec((u, _R, _LANES), lambda c, s: (s, c, 0))
    ptspec = pl.BlockSpec((u, 2 * NLIMBS, _R, _LANES), lambda c, s: (s, 0, c, 0))
    ospec = pl.BlockSpec((u, 3 * NLIMBS, _R, _LANES), lambda c, s: (s, 0, c, 0))
    return pl.pallas_call(
        functools.partial(_scan_kernel, u),
        grid=(ctiles, steps // u),
        in_specs=[ispec, ispec, ptspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct(
            (steps, 3 * NLIMBS, ctiles * _R, _LANES), jnp.uint32
        ),
        scratch_shapes=[pltpu.VMEM((3 * NLIMBS, _R, _LANES), jnp.uint32)],
    )


# ---------------------------------------------------------------------------
# Stacked-layout fused point adds (coords as one [48, W] array).
# ---------------------------------------------------------------------------

def _jadd_stacked_kernel(a_ref, b_ref, o_ref):
    p = (_read(a_ref, 0), _read(a_ref, NLIMBS), _read(a_ref, 2 * NLIMBS))
    q = (_read(b_ref, 0), _read(b_ref, NLIMBS), _read(b_ref, 2 * NLIMBS))
    X, Y, Z = PM._kern_add(KQ, p, q)
    _write(o_ref, 0, X)
    _write(o_ref, NLIMBS, Y)
    _write(o_ref, 2 * NLIMBS, Z)


@functools.lru_cache(maxsize=None)
def _jadd_stacked_call(nblocks):
    spec = pl.BlockSpec((3 * NLIMBS, _R, _LANES), lambda i: (0, i, 0))
    return pl.pallas_call(
        _jadd_stacked_kernel,
        grid=(nblocks,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(
            (3 * NLIMBS, nblocks * _R, _LANES), jnp.uint32
        ),
    )


def _pad_blocks48(x, w):
    pad = (-w) % (_R * _LANES)
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((3 * NLIMBS, pad), dtype=jnp.uint32)], axis=1
        )
    return x.reshape(3 * NLIMBS, -1, _LANES)


def jadd_stacked(a, b):
    """Fused Jacobian add on stacked [48, W] coordinate arrays."""
    w = a.shape[-1]
    a2 = _pad_blocks48(a.reshape(3 * NLIMBS, w), w)
    b2 = _pad_blocks48(b.reshape(3 * NLIMBS, w), w)
    out = _jadd_stacked_call(a2.shape[1] // _R)(a2, b2)
    return out.reshape(3 * NLIMBS, -1)[:, :w]


def _fold_stacked(arr):
    """[48, W] -> [48, W/2] ... -> [48, 1] by pairwise fused adds."""
    w = arr.shape[-1]
    m = 1 << (w - 1).bit_length()
    if m != w:
        # identity pad: X=1, Y=1, Z=0 (mont)
        idc = np.concatenate([fq.ONE_MONT, fq.ONE_MONT, np.zeros(16, np.uint32)])
        pad = jnp.broadcast_to(
            jnp.asarray(idc)[:, None], (3 * NLIMBS, m - w)
        ).astype(jnp.uint32)
        arr = jnp.concatenate([arr, pad], axis=1)
    while m > 1:
        half = m // 2
        arr = jadd_stacked(arr[:, :half], arr[:, half:m])
        m = half
    return arr  # [48, 1]


def _suffix_scan_stacked(arr):
    """Inclusive suffix sums over the last axis: C_t = sum_{d>=t} B_d."""
    w = arr.shape[-1]
    steps = max((w - 1).bit_length(), 1)
    pos = jnp.arange(w)
    for j in range(steps):
        shift = 1 << j
        valid = pos < w - shift
        rolled = jnp.roll(arr, -shift, axis=-1)
        rolled = rolled.at[2 * NLIMBS :].multiply(valid[None].astype(jnp.uint32))
        arr = jadd_stacked(rolled, arr)
    return arr


# ---------------------------------------------------------------------------
# Full MSM.
# ---------------------------------------------------------------------------

def _choose_chunks(k):
    """Chunk count C: fixed at 1024 (one full kernel tile).

    Measured on a v5e (round 3): the run-scan's time is INVARIANT in C
    (c=1024/4096/8192 all ~191 ms at K=2M — the kernel is VPU-throughput
    bound, not depth bound), while the dense bucket fold costs NB*C adds
    and more than doubles the end-to-end time by c=8192.  So the minimum
    tile width always wins: 101k pts/s at c=8192 vs 262k at c=1024.
    """
    assert k >= 8192, "msm2 requires at least 8192 digit entries"
    return min(1024, k // 8)


def _msm_impl(tabx, taby, digits, c, s):
    """tabx/taby: [16, K] affine bases; digits: [K] i32; K = c*s."""
    order = jnp.argsort(digits)
    d = digits[order]
    xs = tabx[:, order]
    ys = taby[:, order]

    dc = d.reshape(c, s)
    # step-major [S, C] digit planes for the kernel
    dsm = dc.T.reshape(s, c // _LANES, _LANES)
    # lane-chunk tiling: chunk index = row-major over (c//128? ) — keep
    # simple: lane layout [c] split as (c/128 rows, 128 lanes); tiles of 8
    # rows = 1024 chunks per grid block.
    prev = jnp.concatenate([dc[:, :1], dc[:, :-1]], axis=1)  # prev along s
    psm = prev.T.reshape(s, c // _LANES, _LANES)

    pts = jnp.concatenate([xs, ys], axis=0)  # [32, K]
    # [32, C, S] -> [S, 32, C(rows), 128]
    pts = pts.reshape(2 * NLIMBS, c, s).transpose(2, 0, 1)
    pts = pts.reshape(s, 2 * NLIMBS, c // _LANES, _LANES)

    prefix = _scan_call(c // _TILE, s)(dsm, psm, pts)
    # prefix: [S, 48, C/128, 128] -> gather per (bucket, chunk)
    prefix = prefix.reshape(s, 3 * NLIMBS, c)

    bvec = jnp.arange(NB, dtype=digits.dtype)
    idx = jax.vmap(lambda row: jnp.searchsorted(row, bvec, side="right"))(dc) - 1
    # idx: [C, NB]; valid if in-range and digit matches and b > 0
    valid = (idx >= 0) & (jnp.take_along_axis(dc, jnp.maximum(idx, 0), axis=1) == bvec[None, :])
    valid = valid & (bvec[None, :] > 0)

    gidx = jnp.maximum(idx, 0).T  # [NB, C]
    # bucket[l, b, ch] = prefix[gidx[b,ch], l, ch]
    buckets = jnp.take_along_axis(
        prefix, gidx[:, None, :], axis=0
    )  # [NB, 48, C]
    vmask = valid.T[:, None, :].astype(jnp.uint32)  # [NB, 1, C]
    zpart = buckets[:, 2 * NLIMBS :, :] * vmask
    buckets = jnp.concatenate([buckets[:, : 2 * NLIMBS, :], zpart], axis=1)
    buckets = buckets.transpose(1, 0, 2)  # [48, NB, C]

    # fold over chunks
    m = c
    while m > 1:
        half = m // 2
        a = buckets[:, :, :half].reshape(3 * NLIMBS, -1)
        b = buckets[:, :, half:m].reshape(3 * NLIMBS, -1)
        buckets = jadd_stacked(a, b).reshape(3 * NLIMBS, NB, half)
        m = half
    buckets = buckets[:, 1:, 0]  # [48, NB-1] (drop bucket 0)

    suffix = _suffix_scan_stacked(buckets)
    return _fold_stacked(suffix)[:, 0]  # [48]


@functools.lru_cache(maxsize=None)
def _msm_jit2(c, s):
    return jax.jit(functools.partial(_msm_impl, c=c, s=s))


def msm_fixed_affine(tabx, taby, digits):
    """MSM over pre-shifted affine window tables; returns [48] Jacobian limbs."""
    k = digits.shape[0]
    c = _choose_chunks(k)
    # Steps per chunk must divide by the kernel unroll once above it
    # (non-power-of-two polynomial lengths otherwise crash `_scan_call`'s
    # steps % u == 0 requirement — e.g. m=544 gives s=17).
    s = -(-k // c)
    if s > _UNROLL:
        s = -(-s // _UNROLL) * _UNROLL
    ktarget = c * s
    if ktarget != k:
        padk = ktarget - k
        # digit-0 pads never contribute; any valid base works — reuse the
        # first table entry to avoid inventing off-curve points.
        digits = jnp.concatenate([digits, jnp.zeros(padk, digits.dtype)])
        tabx = jnp.concatenate([tabx, jnp.broadcast_to(tabx[:, :1], (NLIMBS, padk))], axis=1)
        taby = jnp.concatenate([taby, jnp.broadcast_to(taby[:, :1], (NLIMBS, padk))], axis=1)
    return _msm_jit2(c, s)(tabx, taby, digits)


# ---------------------------------------------------------------------------
# Batched inversion + Jacobian -> affine (for window-table construction).
# ---------------------------------------------------------------------------

def _shifted_fill_one(x, shift, forward=True):
    ops = fq
    one = jnp.broadcast_to(
        jnp.asarray(ops.ONE_MONT)[:, None], (NLIMBS, shift)
    ).astype(jnp.uint32)
    if forward:
        return jnp.concatenate([one, x[:, :-shift]], axis=1)
    return jnp.concatenate([x[:, shift:], one], axis=1)


def batch_inv_mont(field, a):
    """Batched modular inverse of nonzero [16, W] Montgomery elements.

    Log-depth Hillis-Steele prefix AND suffix products (fused Pallas muls),
    one scalar inversion on the host, then inv_i = P_{i-1} * S_{i+1} * T^-1.
    ~2*log2(W)+3 wide multiplies total — vastly cheaper than per-element
    Fermat exponentiation (254 squarings each).
    """
    ops = fq if field == "fq" else fr
    w = a.shape[-1]
    pre, suf = a, a
    shift = 1
    while shift < w:
        pre = PM.mont_mul(field, pre, _shifted_fill_one(pre, shift, True))
        suf = PM.mont_mul(field, suf, _shifted_fill_one(suf, shift, False))
        shift *= 2
    total = np.asarray(pre[:, -1])
    tinv = ops.to_mont_host(pow(ops.from_mont_host(total), -1, ops.modulus))
    pm1 = _shifted_fill_one(pre, 1, True)
    sp1 = _shifted_fill_one(suf, 1, False)
    out = PM.mont_mul(field, PM.mont_mul(field, pm1, sp1), jnp.asarray(tinv)[:, None])
    return out


def jac_to_affine_batch(X, Y, Z):
    """Batched Jacobian -> affine (Z must be nonzero everywhere)."""
    zi = batch_inv_mont("fq", Z)
    zi2 = PM.mont_mul("fq", zi, zi)
    zi3 = PM.mont_mul("fq", zi2, zi)
    return PM.mont_mul("fq", X, zi2), PM.mont_mul("fq", Y, zi3)


def affine_from_jacobian(X, Y, Z):
    """Backend-dispatching batched Jacobian -> affine.

    TPU: Pallas log-depth batch inversion; CPU: XLA Fermat inversion (the
    bit-identical fallback used by tests and virtual meshes).
    """
    shape = X.shape
    X, Y, Z = (c.reshape(NLIMBS, -1) for c in (X, Y, Z))
    if jax.default_backend() == "tpu":
        ax, ay = jac_to_affine_batch(X, Y, Z)
    else:
        zi = fq.inv(Z)
        zi2 = fq.mul(zi, zi)
        zi3 = fq.mul(zi2, zi)
        ax, ay = fq.mul(X, zi2), fq.mul(Y, zi3)
    return ax.reshape(shape), ay.reshape(shape)


def build_affine_tables(x, y):
    """Affine SRS bases [16, n] -> affine window tables [16, 32n].

    Window w holds 2^(8w) * P_i (window-major), the same layout as
    curve._window_precompute but converted to affine so the MSM scan can use
    mixed adds.  Doubling ladder runs as fused Pallas kernels.
    """
    from .curve import jac_from_affine

    outs_x, outs_y, outs_z = [], [], []
    cur = jac_from_affine(x, y)
    for w in range(NWINDOWS):
        outs_x.append(cur[0])
        outs_y.append(cur[1])
        outs_z.append(cur[2])
        if w < NWINDOWS - 1:
            cur = PM.jac_double_n(cur, WINDOW_BITS)
    X = jnp.concatenate(outs_x, axis=1)
    Y = jnp.concatenate(outs_y, axis=1)
    Z = jnp.concatenate(outs_z, axis=1)
    return jac_to_affine_batch(X, Y, Z)
