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


def host_matrix_to_vector(mat: np.ndarray) -> list[int]:
    """Gathered four-step output [16, n1, n2] -> X[k] vector of ints."""
    n1, n2 = mat.shape[1], mat.shape[2]
    vals = fr.from_mont_host_many(np.transpose(np.asarray(mat), (0, 2, 1)))
    # vals is flattened over (k2, k1) -> index k2*n1 + k1 = k. ✓
    return vals


def vector_to_host_matrix(vec: list[int], n1: int, n2: int) -> np.ndarray:
    """x[j] -> [16, n1, n2] row-major matrix (j = j1*n2 + j2) in mont form."""
    return fr.to_mont_host_many(vec).reshape(NLIMBS, n1, n2)
