"""Multi-chip kernels: sharded MSM and the four-step distributed NTT.

New TPU-native design (the reference has no distributed execution at all):

* **Sharded MSM** — bases and digits are sharded over the mesh axis; each
  device runs the single-chip bucket MSM on its shard, partial results are
  `all_gather`ed (3 limb vectors per device — negligible traffic on ICI) and
  folded identically on every device.
* **Four-step NTT** — DFT_N with N = n1*n2 viewed as an [n1, n2] matrix,
  column-sharded: local column NTTs (size n1), pointwise twiddles
  w_N^(j2*k1), one `all_to_all` to re-shard rows, local row NTTs (size n2).
  The single collective rides ICI; everything else is local compute.
  Input: x[j1*n2 + j2] = mat[j1, j2] (row-major), sharded on j2.
  Output: X[k1 + n1*k2] = out[k1, k2], sharded on k1.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..fields import FR_MOD
from ..ops.limbs import fr, NLIMBS
from ..ops.ntt import _ntt_impl
from ..ops.curve import _msm_kernel, jac_fold_sum


# ---------------------------------------------------------------------------
# Sharded MSM.
# ---------------------------------------------------------------------------

def sharded_msm(mesh: Mesh, axis: str, bases, digits):
    """MSM over bases/digits sharded along the mesh axis.

    bases: (X, Y, Z) uint32[16, K] Jacobian (Montgomery); digits: int32[K].
    K must divide evenly by the axis size.  Returns a replicated Jacobian
    point ([16] coords).
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis), P(axis)),
        out_specs=(P(None, axis), P(None, axis), P(None, axis)),
    )
    def kernel(x, y, z, d):
        # Per-device partial MSM; the cross-device fold happens outside the
        # shard_map (D points — negligible), which keeps the output types
        # honest under JAX 0.9 vma checking (a folded all_gather result is
        # value-replicated but still *typed* as device-varying).
        lx, ly, lz = _msm_kernel(x, y, z, d)
        return lx[:, None], ly[:, None], lz[:, None]

    x, y, z = bases
    partials = jax.jit(kernel)(x, y, z, digits)  # each [16, D]
    return jax.jit(jac_fold_sum)(partials)


# ---------------------------------------------------------------------------
# Four-step distributed NTT.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _twiddle_matrix(n1: int, n2: int, inverse: bool) -> np.ndarray:
    """w_N^(j2*k1) (or inverse) as mont limbs [16, n1, n2]."""
    n = n1 * n2
    w = pow(5, (FR_MOD - 1) // n, FR_MOD)
    if inverse:
        w = pow(w, -1, FR_MOD)
    rows = []
    for k1 in range(n1):
        base = pow(w, k1, FR_MOD)
        cur = 1
        row = []
        for _ in range(n2):
            row.append(cur)
            cur = cur * base % FR_MOD
        rows.append(row)
    flat = [v for row in rows for v in row]
    return fr.to_mont_host_many(flat).reshape(NLIMBS, n1, n2)


def sharded_ntt(mesh: Mesh, axis: str, mat, inverse: bool = False):
    """Distributed DFT over Fr via the four-step algorithm.

    mat: uint32[16, n1, n2] mont, sharded P(None, None, axis) (columns).
    Returns [16, n1, n2] with out[:, k1, k2] = X[k1 + n1*k2], sharded
    P(None, axis, None) (rows).
    """
    _, n1, n2 = mat.shape
    ndev = mesh.shape[axis]
    assert n1 % ndev == 0 and n2 % ndev == 0
    tw = jnp.asarray(_twiddle_matrix(n1, n2, inverse))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, None, axis)),
        out_specs=P(None, axis, None),
    )
    def kernel(x, twl):
        # x: [16, n1, n2/D] — transform columns (axis 1 = size n1).
        y = jnp.swapaxes(
            _ntt_impl(jnp.swapaxes(x, 1, 2), n1, inverse), 1, 2
        )
        y = fr.mul(y, twl)
        # Re-shard: split rows, gather all columns.
        y = jax.lax.all_to_all(y, axis, split_axis=1, concat_axis=2, tiled=True)
        # y: [16, n1/D, n2] — transform rows (axis 2 = size n2).
        return _ntt_impl(y, n2, inverse)

    # (inverse mode: _ntt_impl applies 1/n1 and 1/n2, composing to 1/N.)
    return jax.jit(kernel)(mat, tw)


# ---------------------------------------------------------------------------
# Sharded PLONK round 3: the full coset-extend -> quotient -> coefficients
# chain of one proof, length-sharded across the mesh.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _perm_tables(n1: int, n2: int):
    """Host tables for the permuted 4n layout [k1' (4*n2 rows), k2' (n1 cols)].

    Array position (k1', k2') of the forward four-step output holds the
    evaluation at domain index k' = k1' + 4*n2*k2'; the quotient constants
    q^k' and w4^k' are laid out to match.
    """
    from ..prover import _coset_x_consts

    n = n1 * n2
    qroots, w4p = _coset_x_consts(n)  # [16, 4n] natural order
    k1 = np.arange(4 * n2)[:, None]
    k2 = np.arange(n1)[None, :]
    kk = (k1 + 4 * n2 * k2).reshape(-1)
    qperm = np.asarray(qroots)[:, kk].reshape(NLIMBS, 4 * n2, n1)
    wperm = np.asarray(w4p)[:, kk].reshape(NLIMBS, 4 * n2, n1)
    return jnp.asarray(qperm), jnp.asarray(wperm)


def _factor(n: int, ndev: int):
    """n = n1*n2 with n1, n2, 4*n2 all divisible by ndev (n1 >= n2).

    Raises ValueError (not assert — `python -O` must not silently let an
    unshardable size into the sharded path).
    """
    n1 = 1 << ((n.bit_length() - 1 + 1) // 2)
    n2 = n // n1
    if n1 % ndev != 0 or n2 % ndev != 0:
        raise ValueError(f"group order {n} too small to shard {ndev} ways")
    return n1, n2


@functools.lru_cache(maxsize=None)
def _round3_jit(mesh: Mesh, axis: str, n1: int, n2: int, npoly: int):
    """Compiled sharded round-3 chain for a (mesh, n1, n2) configuration.

    All per-proof values (polys, challenge scalars, offset power tables) are
    explicit arguments so one executable serves every proof of this size.
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None, None, axis),   # values, column (j2) sharded
            P(None, None, axis),         # twA [16, n1, n2/D]
            P(None, axis),               # w1 (k1-sharded off^{k1})
            P(None,),                    # w2 replicated
            P(None, None, axis),         # twB [16, 4n2, n1/D] (j2'=k1 shard)
            P(None, axis, None),         # qperm rows (k1') sharded
            P(None, axis, None),         # wperm rows sharded
            P(None, None, axis),         # twC [16, n1, 4n2/D]
            P(None, axis),               # v1 (k1''-sharded off^{-k1''})
            P(None,),                    # v2 replicated
            P(None,), P(None,), P(None,), P(None,), P(None,),  # scalars
        ),
        out_specs=(
            P(None, None, axis, None),   # bigs permuted [16,15,4n2/D,n1]
            P(None, axis, None),         # quot permuted
            # qcoeffs: the final all_to_all(split_axis=1, concat_axis=2)
            # leaves each device with an n1/D ROW block spanning all 4n2
            # columns, so the global [16, n1, 4n2] array is sharded on
            # axis 1 (rows) — NOT axis 2.
            P(None, axis, None),         # qcoeffs permuted [16, n1, 4n2]
            P(None, axis, None),         # xvals permuted
        ),
    )
    def kernel(x, twa, w1l, w2l, twb, qp, wp, twc, v1l, v2l,
               beta, gamma, alpha, offl, offn):
        from ..prover import _quotient_impl

        # A: column iNTTs (size n1) + twiddle, then all_to_all to rows.
        y = jnp.swapaxes(_ntt_impl(jnp.swapaxes(x, 2, 3), n1, True), 2, 3)
        y = fr.mul(y, twa[:, None])
        y = jax.lax.all_to_all(y, axis, split_axis=2, concat_axis=3, tiled=True)
        c = _ntt_impl(y, n2, True)                 # [16,15,n1/D,n2] coeffs
        # Scale by offset^k  (k = k1 + n1*k2).
        c = fr.mul(fr.mul(c, w1l[:, None, :, None]), w2l[:, None, None, :])
        # Local transpose to [4n2, n1]-matrix columns; zero-pad rows.
        m = jnp.swapaxes(c, 2, 3)                  # [16,15,n2,n1/D]
        m = jnp.concatenate(
            [m, jnp.zeros(m.shape[:2] + (3 * n2,) + m.shape[3:], jnp.uint32)],
            axis=2,
        )
        # Forward four-step of size 4n on [4n2, n1].
        z = jnp.swapaxes(_ntt_impl(jnp.swapaxes(m, 2, 3), 4 * n2, False), 2, 3)
        z = fr.mul(z, twb[:, None])
        z = jax.lax.all_to_all(z, axis, split_axis=2, concat_axis=3, tiled=True)
        bigs = _ntt_impl(z, n1, False)             # [16,15,4n2/D,n1] permuted
        # Quotient, elementwise in the permuted layout.
        sh = bigs.shape[2] * bigs.shape[3]
        flat = [bigs[:, i].reshape(NLIMBS, sh) for i in range(npoly)]
        xv = fr.mul(offl[:, None], qp.reshape(NLIMBS, sh))
        zh = fr.sub(
            fr.mul(offn[:, None], wp.reshape(NLIMBS, sh)),
            jnp.asarray(fr.ONE_MONT)[:, None],
        )
        quot = _quotient_impl(*flat, xv, fr.inv(zh), beta, gamma, alpha)
        quotm = quot.reshape(NLIMBS, bigs.shape[2], bigs.shape[3])
        # Inverse four-step back to coefficients + unscale.
        g = jnp.swapaxes(quotm, 1, 2)              # [16, n1, 4n2/D] cols
        g = jnp.swapaxes(_ntt_impl(jnp.swapaxes(g, 1, 2), n1, True), 1, 2)
        g = fr.mul(g, twc)
        g = jax.lax.all_to_all(g, axis, split_axis=1, concat_axis=2, tiled=True)
        qc = _ntt_impl(g, 4 * n2, True)            # [16, n1/D, 4n2]
        qc = fr.mul(fr.mul(qc, v1l[:, :, None]), v2l[:, None, :])
        return bigs, quotm, qc, xv.reshape(quotm.shape)

    return jax.jit(kernel)


def sharded_round3(mesh: Mesh, axis: str, polys, beta, gamma, alpha, offset):
    """Round 3 of one proof with every NTT length-sharded over the mesh.

    polys: uint32[16, 15, n] Lagrange stack (a,b,c,pi,ql,qr,qm,qo,qc,z,
    zshift,s1,s2,s3,l0), replicated.  offset: host Fr (the fft cofactor);
    beta/gamma/alpha: [16] mont limbs.  Returns (bigs [16,15,4n],
    xvals [16,4n], quot [16,4n], qcoeffs [16,4n]) in NATURAL order.

    Chain (one shard_map, three all_to_alls, zero gathers):
      column-sharded iNTT (four-step, n = n1 x n2)
      -> scale by offset^k (sharded powers)
      -> LOCAL transpose + zero-pad            # [4*n2, n1] column-sharded
      -> forward four-step (size 4n)
      -> elementwise quotient in permuted layout (constants pre-permuted)
      -> LOCAL transpose
      -> inverse four-step (size 4n) + offset^-k unscale
    The local transposes exploit that a four-step's output row sharding is
    exactly the next four-step's input column sharding, so the only
    communication is the all_to_all inside each four-step.
    """
    from ..ops.ntt import scalar_powers
    from ..fields import Fr as _Fr

    ndev = mesh.shape[axis]
    nlimb, npoly, n = polys.shape
    n1, n2 = _factor(n, ndev)
    qperm, wperm = _perm_tables(n1, n2)

    off = int(offset)
    offl = jnp.asarray(fr.to_mont_host(off))
    offn = jnp.asarray(fr.to_mont_host(pow(off, n, FR_MOD)))
    offinv = int(_Fr(1) / _Fr(off))
    w1 = scalar_powers(offl, n1)
    w2 = scalar_powers(jnp.asarray(fr.to_mont_host(pow(off, n1, FR_MOD))), n2)
    v1 = scalar_powers(jnp.asarray(fr.to_mont_host(offinv)), n1)
    v2 = scalar_powers(
        jnp.asarray(fr.to_mont_host(pow(offinv, n1, FR_MOD))), 4 * n2
    )

    twA = jnp.asarray(_twiddle_matrix(n1, n2, True))           # [16, n1, n2]
    twB = jnp.asarray(_twiddle_matrix(4 * n2, n1, False))      # [16, 4n2, n1]
    twC = jnp.asarray(_twiddle_matrix(n1, 4 * n2, True))       # [16, n1, 4n2]

    mat = polys.reshape(nlimb, npoly, n1, n2)
    bigs_p, quot_p, qcoef_p, xvals_p = _round3_jit(mesh, axis, n1, n2, npoly)(
        mat, twA, w1, w2, twB, qperm, wperm, twC, v1, v2,
        beta, gamma, alpha, offl, offn,
    )

    # Permuted -> natural order (replicated device reshapes).
    def nat(arr):  # [..., R, C] position (r, c) holds index r + R*c
        return jnp.swapaxes(arr, -1, -2).reshape(arr.shape[:-2] + (4 * n,))

    return nat(bigs_p), nat(xvals_p), nat(quot_p), nat(qcoef_p)


def host_matrix_to_vector(mat: np.ndarray) -> list[int]:
    """Gathered four-step output [16, n1, n2] -> X[k] vector of ints."""
    n1, n2 = mat.shape[1], mat.shape[2]
    vals = fr.from_mont_host_many(np.transpose(np.asarray(mat), (0, 2, 1)))
    # vals is flattened over (k2, k1) -> index k2*n1 + k1 = k. ✓
    return vals


def vector_to_host_matrix(vec: list[int], n1: int, n2: int) -> np.ndarray:
    """x[j] -> [16, n1, n2] row-major matrix (j = j1*n2 + j2) in mont form."""
    return fr.to_mont_host_many(vec).reshape(NLIMBS, n1, n2)
