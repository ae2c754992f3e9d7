"""Batched G1 Jacobian arithmetic and Pippenger MSM for TPU.

Replaces the reference's per-point Python group ops and multicomb lincomb
(curve.py:30-111) with a TPU-native design:

* Points are structure-of-arrays Jacobian coordinates over Fq limb tensors
  (uint32[16, *batch], Montgomery form); the identity is Z == 0.
* Fixed-base MSM (the KZG commit hot path) precomputes 2^(8w)-shifted copies
  of the SRS once, turning the MSM into a single-window bucket problem:
  digits are 8-bit, bucket accumulation is a sort + segmented inclusive scan,
  bucket reduction is a suffix scan + tree fold — everything maps to
  vectorized lanes instead of scatter loops.
* Every reduction is expressed as a `fori_loop` whose body contains exactly
  one batched point-add (shapes held fixed by identity padding), so traced
  graphs stay small and compile fast while the runtime work is log-depth.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import FQ_MOD
from .limbs import fq, fr, NLIMBS

WINDOW_BITS = 8
NWINDOWS = 32  # 256 bits / 8


# ---------------------------------------------------------------------------
# Jacobian point ops (X, Y, Z limb-major tuples; Montgomery domain).
# ---------------------------------------------------------------------------

def jac_identity(batch_shape=()):
    zero = jnp.zeros((NLIMBS,) + batch_shape, dtype=jnp.uint32)
    one = jnp.broadcast_to(
        jnp.asarray(fq.ONE_MONT).reshape((NLIMBS,) + (1,) * len(batch_shape)),
        (NLIMBS,) + batch_shape,
    ).astype(jnp.uint32)
    return (one, one, zero)


def jac_from_affine(x, y):
    """Affine (mont limbs) -> Jacobian with Z=1."""
    one = jnp.broadcast_to(
        jnp.asarray(fq.ONE_MONT).reshape((NLIMBS,) + (1,) * (x.ndim - 1)), x.shape
    ).astype(jnp.uint32)
    return (x, y, one)


def jac_double(p):
    """Jacobian doubling for y^2 = x^3 + b (a = 0).  Identity-safe (Z3=0)."""
    X, Y, Z = p
    A = fq.sqr(X)
    B = fq.sqr(Y)
    C = fq.sqr(B)
    D = fq.sub(fq.sqr(fq.add(X, B)), fq.add(A, C))
    D = fq.add(D, D)
    E = fq.add(fq.add(A, A), A)
    F = fq.sqr(E)
    X3 = fq.sub(F, fq.add(D, D))
    C2 = fq.add(C, C)
    C8 = fq.add(fq.add(C2, C2), fq.add(C2, C2))
    Y3 = fq.sub(fq.mul(E, fq.sub(D, X3)), C8)
    Z3 = fq.mul(fq.add(Y, Y), Z)
    return (X3, Y3, Z3)


def jac_add(p, q):
    """Complete Jacobian addition (handles identity, equal, and inverse pairs)."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = fq.sqr(Z1)
    Z2Z2 = fq.sqr(Z2)
    U1 = fq.mul(X1, Z2Z2)
    U2 = fq.mul(X2, Z1Z1)
    S1 = fq.mul(Y1, fq.mul(Z2, Z2Z2))
    S2 = fq.mul(Y2, fq.mul(Z1, Z1Z1))
    H = fq.sub(U2, U1)
    R = fq.sub(S2, S1)

    HH = fq.sqr(H)
    HHH = fq.mul(H, HH)
    V = fq.mul(U1, HH)
    X3 = fq.sub(fq.sub(fq.sqr(R), HHH), fq.add(V, V))
    Y3 = fq.sub(fq.mul(R, fq.sub(V, X3)), fq.mul(S1, HHH))
    Z3 = fq.mul(fq.mul(Z1, Z2), H)

    p_inf = fq.is_zero(Z1)
    q_inf = fq.is_zero(Z2)
    either_inf = jnp.logical_or(p_inf, q_inf)
    h_zero = jnp.logical_and(fq.is_zero(H), jnp.logical_not(either_inf))
    same = jnp.logical_and(h_zero, fq.is_zero(R))  # p == q -> double
    cancel = jnp.logical_and(h_zero, jnp.logical_not(fq.is_zero(R)))  # p == -q

    dX, dY, dZ = jac_double(p)

    X3 = fq.select(same, dX, X3)
    Y3 = fq.select(same, dY, Y3)
    Z3 = fq.select(same, dZ, Z3)
    Z3 = fq.select(cancel, jnp.zeros_like(Z3), Z3)
    X3 = fq.select(q_inf, X1, fq.select(p_inf, X2, X3))
    Y3 = fq.select(q_inf, Y1, fq.select(p_inf, Y2, Y3))
    Z3 = fq.select(q_inf, Z1, fq.select(p_inf, Z2, Z3))
    return (X3, Y3, Z3)


def jac_fold_sum(p):
    """Sum a Jacobian point batch over its last axis (any size).

    Fixed-shape halving fold: each fori iteration adds even/odd lanes and
    pads the tail with identities, so the loop body traces one point-add.
    """
    X, Y, Z = p
    n = X.shape[-1]
    m = 1
    while m < n:
        m *= 2
    if m != n:
        iX, iY, iZ = jac_identity(X.shape[1:-1] + (m - n,))
        X = jnp.concatenate([X, iX], axis=-1)
        Y = jnp.concatenate([Y, iY], axis=-1)
        Z = jnp.concatenate([Z, iZ], axis=-1)
    steps = m.bit_length() - 1
    if steps == 0:
        return (X[..., 0], Y[..., 0], Z[..., 0])
    half = m // 2
    iX, iY, iZ = jac_identity(X.shape[1:-1] + (half,))

    def body(_, arr):
        aX, aY, aZ = arr
        sX, sY, sZ = jac_add(
            (aX[..., 0::2], aY[..., 0::2], aZ[..., 0::2]),
            (aX[..., 1::2], aY[..., 1::2], aZ[..., 1::2]),
        )
        return (
            jnp.concatenate([sX, iX], axis=-1),
            jnp.concatenate([sY, iY], axis=-1),
            jnp.concatenate([sZ, iZ], axis=-1),
        )

    X, Y, Z = jax.lax.fori_loop(0, steps, body, (X, Y, Z))
    return (X[..., 0], Y[..., 0], Z[..., 0])


# ---------------------------------------------------------------------------
# Host <-> device point conversion.
# ---------------------------------------------------------------------------

def points_to_device(points) -> tuple:
    """List of host affine G1 points (Fq pairs, no identities) -> mont limbs."""
    xs = fq.to_mont_host_many([int(p[0]) for p in points])
    ys = fq.to_mont_host_many([int(p[1]) for p in points])
    return jnp.asarray(xs), jnp.asarray(ys)


def jac_to_affine_host(p):
    """Single Jacobian device point -> host affine (Fq, Fq) or None."""
    from ..fields import Fq as HostFq

    X, Y, Z = (np.asarray(c).reshape(NLIMBS) for c in p)
    z = fq.from_mont_host(Z)
    if z == 0:
        return None
    x = fq.from_mont_host(X)
    y = fq.from_mont_host(Y)
    zinv = pow(z, -1, FQ_MOD)
    return (HostFq(x * zinv * zinv), HostFq(y * zinv * zinv * zinv))


# ---------------------------------------------------------------------------
# Fixed-base MSM.
# ---------------------------------------------------------------------------

def _srs_digest(points) -> str:
    """Content digest of an SRS point list, for keying window-table caches.

    A count-only check silently accepts stale tables from a *different* SRS
    of the same size (e.g. a regenerated synthetic setup with another tau),
    which yields wrong commitments for every subsequent proof.  Hashes n
    plus a deterministic sample of <= 4096 points — any tau change alters
    every non-generator point, so sampling catches a mismatch with
    certainty while staying O(1)-ish for multi-million-point setups.
    """
    import hashlib

    n = len(points)
    h = hashlib.sha256()
    h.update(str(n).encode())
    step = max(1, n // 4096)
    for i in range(0, n, step):
        p = points[i]
        h.update(int(p[0]).to_bytes(32, "little"))
        h.update(int(p[1]).to_bytes(32, "little"))
    p = points[-1]
    h.update(int(p[0]).to_bytes(32, "little"))
    h.update(int(p[1]).to_bytes(32, "little"))
    return h.hexdigest()

def _window_precompute_impl(x, y):
    """Affine bases [16, n] -> Jacobian windowed bases [16, NWINDOWS * n].

    Window w holds 2^(8w) * P_i for every base point; window-major layout.
    """
    first = jac_from_affine(x, y)

    def step(cur, _):
        nxt = jax.lax.fori_loop(0, WINDOW_BITS, lambda i, c: jac_double(c), cur)
        return nxt, cur

    _, outs = jax.lax.scan(step, first, None, length=NWINDOWS)
    X = outs[0].transpose(1, 0, 2).reshape(NLIMBS, -1)
    Y = outs[1].transpose(1, 0, 2).reshape(NLIMBS, -1)
    Z = outs[2].transpose(1, 0, 2).reshape(NLIMBS, -1)
    return X, Y, Z


_window_precompute = jax.jit(_window_precompute_impl)


def _digits_impl(raw_scalars):
    """Canonical limbs [16, n] -> window-major flattened 8-bit digits [32n]."""
    lo = (raw_scalars & 0xFF).astype(jnp.int32)
    hi = (raw_scalars >> 8).astype(jnp.int32)
    d = jnp.stack([lo, hi], axis=1).reshape(NWINDOWS, -1)  # [32, n] window-major
    return d.reshape(-1)


_digits_jit = jax.jit(_digits_impl)

# Montgomery coeffs -> flattened window digits, fused into one dispatch.
_coeff_digits = jax.jit(lambda c: _digits_impl(fr.from_mont(c)))


_CHUNK_STEPS = 128  # scan length per chunk of the bucket accumulation


def _suffix_scan(points):
    """Inclusive suffix sums over the last axis (C_t = sum_{d>=t} B_d)."""
    X, Y, Z = points
    k = X.shape[-1]
    steps = max((k - 1).bit_length(), 1)
    pos = jnp.arange(k)

    def body(j, arr):
        cX, cY, cZ = arr
        shift = jnp.left_shift(1, j)
        valid = pos < k - shift
        inX = jnp.roll(cX, -shift, axis=-1)
        inY = jnp.roll(cY, -shift, axis=-1)
        inZ = jnp.where(valid[None], jnp.roll(cZ, -shift, axis=-1), 0)
        return jac_add((inX, inY, inZ), (cX, cY, cZ))

    return jax.lax.fori_loop(0, steps, body, (X, Y, Z))


def _msm_kernel(preX, preY, preZ, digits):
    """Bucket-method MSM over a single 8-bit-window problem.

    pre*: [16, K] Jacobian bases; digits: [K] int32 in [0, 256).
    Returns a single Jacobian point ([16] coords).

    Sorted chunked run-scan: digits are sorted once, split into C contiguous
    chunks, and scanned position-by-position (`lax.scan`, one batched
    point-add per step) with a tiny [16, C] running-accumulator carry —
    the accumulator resets whenever the digit changes, so the emitted
    prefix at each run's last position is that run's bucket sum.  One bulk
    scatter lands run sums in per-chunk bucket arrays (unique slots within
    a chunk), which fold pairwise (log C batched adds); the bucket
    weighting sum_d d*B_d reduces to a suffix scan + fold.  Total group
    work ~= K + 256*C + 512 adds, all in wide batches, with no per-step
    gather/scatter.
    """
    k = digits.shape[0]
    steps = min(_CHUNK_STEPS, k)
    pad = (-k) % steps
    if pad:
        # Digit-0 pads never contribute (bucket 0 is dropped); reuse the
        # first base to avoid inventing off-curve points.  Needed for
        # non-multiple-of-128 coefficient counts (e.g. blinded Z', n+3).
        digits = jnp.concatenate([digits, jnp.zeros(pad, digits.dtype)])
        preX = jnp.concatenate(
            [preX, jnp.broadcast_to(preX[:, :1], (NLIMBS, pad))], axis=1
        )
        preY = jnp.concatenate(
            [preY, jnp.broadcast_to(preY[:, :1], (NLIMBS, pad))], axis=1
        )
        preZ = jnp.concatenate(
            [preZ, jnp.broadcast_to(preZ[:, :1], (NLIMBS, pad))], axis=1
        )
        k += pad
    nchunks = k // steps
    nb = 1 << WINDOW_BITS

    order = jnp.argsort(digits)
    d = digits[order]
    Xs = preX[:, order].reshape(NLIMBS, nchunks, steps)
    Ys = preY[:, order].reshape(NLIMBS, nchunks, steps)
    Zs = preZ[:, order].reshape(NLIMBS, nchunks, steps)
    dc = d.reshape(nchunks, steps)
    prev = jnp.concatenate(
        [jnp.full((nchunks, 1), -1, dtype=dc.dtype), dc[:, :-1]], axis=1
    )

    xs = (
        dc.T,
        prev.T,
        Xs.transpose(2, 0, 1),  # [steps, 16, C]
        Ys.transpose(2, 0, 1),
        Zs.transpose(2, 0, 1),
    )

    def body(carry, x):
        aX, aY, aZ = carry
        dt, pv, px, py, pz = x
        sX, sY, sZ = jac_add((aX, aY, aZ), (px, py, pz))
        fresh = dt != pv  # new run starts here: accumulator restarts at P
        nX = fq.select(fresh, px, sX)
        nY = fq.select(fresh, py, sY)
        nZ = fq.select(fresh, pz, sZ)
        return (nX, nY, nZ), (nX, nY, nZ)

    # Seed the carry from the (possibly shard-varying) inputs so its type
    # matches the body output under shard_map (JAX 0.9 vma checking): a
    # constant-seeded carry is "unvarying" and scan rejects the mismatch.
    anchor = Zs[:, :, 0] * jnp.uint32(0)
    init = tuple(c + anchor for c in jac_identity((nchunks,)))
    _, (pX, pY, pZ) = jax.lax.scan(body, init, xs)

    # Run ends (within each chunk) -> one bulk scatter into chunk buckets.
    ends = jnp.concatenate(
        [dc[:, 1:] != dc[:, :-1], jnp.ones((nchunks, 1), dtype=jnp.bool_)], axis=1
    )
    slot = jnp.where(ends, dc, nb)  # [C, steps]; non-ends go to dump slot
    rows = jnp.arange(nchunks)[:, None]
    bX, bY, bZ = jac_identity((nchunks, nb + 1))
    bX = bX.at[:, rows, slot].set(pX.transpose(1, 2, 0))
    bY = bY.at[:, rows, slot].set(pY.transpose(1, 2, 0))
    bZ = bZ.at[:, rows, slot].set(pZ.transpose(1, 2, 0))

    # Fold chunk bucket arrays pairwise -> [16, nb-1] (drop buckets 0, dump).
    folded = jac_fold_sum(
        (
            bX[:, :, 1:nb].transpose(0, 2, 1),
            bY[:, :, 1:nb].transpose(0, 2, 1),
            bZ[:, :, 1:nb].transpose(0, 2, 1),
        )
    )

    # total = sum_d d * B_d = sum_t (sum_{d >= t} B_d): suffix scan + fold.
    suffixes = _suffix_scan(folded)
    return jac_fold_sum(suffixes)


_msm_jit = jax.jit(_msm_kernel)


@functools.lru_cache(maxsize=None)
def _digits16_jit(n_table: int):
    """Montgomery coeffs [16, m] -> msm3 signed keys/payloads, one dispatch."""
    from . import msm3

    return jax.jit(
        lambda c: msm3.signed_digits16(fr.from_mont(c), n_table)
    )

# Batched MSM: many digit vectors over one shared base table, one dispatch.
_msm_many_jit = jax.jit(
    jax.vmap(
        lambda x, y, z, d: jnp.stack(_msm_kernel(x, y, z, d), axis=0),
        in_axes=(None, None, None, 0),
        out_axes=2,
    )
)


class FixedBaseMSM:
    """Fixed-base MSM context over the SRS G1 powers (the KZG commit engine).

    Precomputes shifted window bases once per setup; each commit is then one
    sort plus a Pallas bucket run-scan on device.  Plays the role of
    reference setup.py:66-72's `commit` linear combination.

    Two execution paths, chosen by backend at construction:
    * TPU: affine window tables + ops/msm2 Pallas pipeline (fast path).
    * CPU (tests / virtual meshes): Jacobian tables + the XLA sorted
      run-scan `_msm_kernel` (bit-identical results, no Mosaic dependency).
    """

    def __init__(self, points, cache_path: str | None = None):
        """points: list of host affine G1 points (the SRS powers of x).

        `cache_path`: optional .npz path caching the window tables in
        device-friendly limb layout (the framework's SRS checkpoint format —
        precompute is ~256 point doublings per base otherwise).
        """
        self.n = len(points)
        self._points = points
        self.cache_path = cache_path
        self._digest = _srs_digest(points)
        self.use_pallas = jax.default_backend() == "tpu"
        self.precomp = None       # Jacobian tables (XLA path)
        self.affine_tab = None    # 8-bit affine tables (msm2 Pallas path)
        self.affine16_tab = None  # packed 16-bit tables (msm3 Pallas path)
        if not self.use_pallas:
            self._build_jacobian()

    def _build_jacobian(self):
        if self.precomp is not None:
            return
        cache = (
            f"{self.cache_path}.jac{self.n}.npz" if self.cache_path else None
        )
        if cache is not None:
            try:
                data = np.load(cache)
                if (
                    int(data["n"]) == self.n
                    and "Z" in data
                    and str(data.get("digest")) == self._digest
                ):
                    self.precomp = tuple(
                        jax.device_put(jnp.asarray(data[k])) for k in ("X", "Y", "Z")
                    )
                    return
            except (OSError, KeyError, ValueError):
                pass
        x, y = points_to_device(self._points)
        self.precomp = tuple(
            jax.device_put(c) for c in _window_precompute(x, y)
        )
        if cache is not None:
            try:
                X, Y, Z = (np.asarray(c) for c in self.precomp)
                np.savez(cache, n=self.n, digest=self._digest, X=X, Y=Y, Z=Z)
            except OSError:
                pass

    def _build_affine(self):
        if self.affine_tab is not None:
            return
        from . import msm2

        # n in the filename: one srs_cache prefix serves several setup sizes
        # without the caches evicting each other on every alternation.
        cache = (
            f"{self.cache_path}.affine{self.n}.npz" if self.cache_path else None
        )
        if cache is not None:
            try:
                data = np.load(cache)
                if (
                    int(data["n"]) == self.n
                    and str(data.get("digest")) == self._digest
                ):
                    self.affine_tab = tuple(
                        jax.device_put(jnp.asarray(data[k])) for k in ("AX", "AY")
                    )
                    return
            except (OSError, KeyError, ValueError):
                pass
        x, y = points_to_device(self._points)
        self.affine_tab = tuple(
            jax.device_put(c) for c in msm2.build_affine_tables(x, y)
        )
        if cache is not None:
            try:
                ax, ay = (np.asarray(c) for c in self.affine_tab)
                np.savez(cache, n=self.n, digest=self._digest, AX=ax, AY=ay)
            except OSError:
                pass

    def _build_affine16(self):
        if self.affine16_tab is not None:
            return
        from . import msm3

        cache = (
            f"{self.cache_path}.affine16p_{self.n}.npz" if self.cache_path else None
        )
        packed = None
        if cache is not None:
            try:
                data = np.load(cache)
                if (
                    int(data["n"]) == self.n
                    and str(data.get("digest")) == self._digest
                ):
                    packed = jax.device_put(jnp.asarray(data["P"]))
            except (OSError, KeyError, ValueError):
                pass
        if packed is None:
            x, y = points_to_device(self._points)
            packed = jax.device_put(msm3.build_affine_tables16(x, y))
            if cache is not None:
                try:
                    np.savez(
                        cache, n=self.n, digest=self._digest,
                        P=np.asarray(packed),
                    )
                except OSError:
                    pass
        # Row layout trades 8x table HBM for a ~2.5x faster base gather
        # (the pipeline's wall); fall back to the compact lane layout when
        # the padded table would crowd out the rest of the prover state.
        rows_bytes = 16 * self.n * 512
        if rows_bytes <= self._ROWS_MAX_BYTES:
            self.affine16_tab = jax.jit(msm3.rows_from_packed)(packed)
            self.affine16_tab.block_until_ready()
        else:
            self.affine16_tab = packed

    def precomp_for(self, m: int):
        """Jacobian window tables restricted to the first m bases."""
        self._build_jacobian()
        return self._bases_for(m)

    def _slice_idx(self, m: int):
        return jnp.asarray(
            (
                np.arange(NWINDOWS)[:, None] * self.n + np.arange(m)[None, :]
            ).reshape(-1)
        )

    def _bases_for(self, m: int):
        if m == self.n:
            return self.precomp
        X, Y, Z = self.precomp
        idx = self._slice_idx(m)
        return (X[:, idx], Y[:, idx], Z[:, idx])

    _MSM3_MIN = 8192  # smallest m routed to the 16-bit-window pipeline
    # 16 GB HBM on v5e: cap the padded row-layout table at 6 GB (n <= 2^19)
    # so SRS + NTT tables + prover state still fit alongside it.
    _ROWS_MAX_BYTES = 6 << 30

    def msm_mont(self, coeffs_mont):
        """MSM with coefficients given in Montgomery limb form [16, m], m <= n."""
        m = coeffs_mont.shape[-1]
        assert m <= self.n, "polynomial degree exceeds SRS size"
        if self.use_pallas and m >= self._MSM3_MIN:
            from . import msm3

            self._build_affine16()
            key, payload = _digits16_jit(self.n)(coeffs_mont)
            res, maxmult = msm3.msm_fixed_affine16(
                self.affine16_tab, key, payload
            )
            if int(maxmult) <= msm3._J:
                return (
                    res[:NLIMBS], res[NLIMBS : 2 * NLIMBS], res[2 * NLIMBS :],
                )
            # Pathological digit concentration (more same-bucket runs than
            # the dense gather folds): fall through to the 8-bit pipeline.
        digits = _coeff_digits(coeffs_mont)  # [32 * m] window-major
        if self.use_pallas and 32 * m >= 8192:
            from . import msm2

            self._build_affine()
            tabx, taby = self.affine_tab
            if m != self.n:
                idx = self._slice_idx(m)
                tabx, taby = tabx[:, idx], taby[:, idx]
            res = msm2.msm_fixed_affine(tabx, taby, digits)
            return (res[:NLIMBS], res[NLIMBS : 2 * NLIMBS], res[2 * NLIMBS :])
        self._build_jacobian()
        preX, preY, preZ = self._bases_for(m)
        return _msm_jit(preX, preY, preZ, digits)

    def commit_mont(self, coeffs_mont):
        """MSM -> host affine point (or None for the zero polynomial)."""
        return jac_to_affine_host(self.msm_mont(coeffs_mont))

    def msm_mont_deferred(self, coeffs_mont):
        """Device-side MSM: ([48] Jacobian limbs, maxmult or None).

        Like `msm_mont` but without any host synchronization — the msm3
        multiplicity check is returned for the caller to batch-fetch.
        Used by `commit_batch` to amortize the per-fetch tunnel latency
        (~30-50 ms each) across all commitments of a prover round."""
        m = coeffs_mont.shape[-1]
        assert m <= self.n, "polynomial degree exceeds SRS size"
        if self.use_pallas and m >= self._MSM3_MIN:
            from . import msm3

            self._build_affine16()
            key, payload = _digits16_jit(self.n)(coeffs_mont)
            res, maxmult = msm3.msm_fixed_affine16(
                self.affine16_tab, key, payload
            )
            return res, maxmult
        X, Y, Z = self.msm_mont(coeffs_mont)
        return jnp.concatenate([X, Y, Z], axis=0), None

    def commit_batch(self, coeff_list):
        """Commit several polynomials with ONE host round trip.

        coeff_list: list of [16, m_i] Montgomery coefficient arrays.
        Returns host affine points.  Rare msm3 multiplicity overflows are
        recommitted through the 8-bit pipeline after the batched fetch."""
        outs = [self.msm_mont_deferred(c) for c in coeff_list]
        stack = np.asarray(jnp.stack([r for r, _ in outs], axis=0))  # [N, 48]
        mms = [None if mm is None else int(mm) for _, mm in outs]
        pts = []
        for i, (row, mm) in enumerate(zip(stack, mms)):
            if mm is not None:
                from . import msm3

                if mm > msm3._J:
                    pts.append(self._commit_msm2(coeff_list[i]))
                    continue
            pts.append(
                jac_to_affine_host((row[:NLIMBS], row[NLIMBS : 2 * NLIMBS],
                                    row[2 * NLIMBS :]))
            )
        return pts

    def _commit_msm2(self, coeffs_mont):
        """Commit through the 8-bit Pallas pipeline (msm3 fallback)."""
        from . import msm2

        m = coeffs_mont.shape[-1]
        digits = _coeff_digits(coeffs_mont)
        self._build_affine()
        tabx, taby = self.affine_tab
        if m != self.n:
            idx = self._slice_idx(m)
            tabx, taby = tabx[:, idx], taby[:, idx]
        res = msm2.msm_fixed_affine(tabx, taby, digits)
        return jac_to_affine_host(
            (res[:NLIMBS], res[NLIMBS : 2 * NLIMBS], res[2 * NLIMBS :])
        )

    def commit_many_mont(self, coeffs_mont):
        """Batched commits: [16, M, n] Montgomery coeffs -> M affine points.

        XLA path: ONE vmapped MSM dispatch for all M commitments (the
        BatchProver's per-instance Python loop was M x 9 sequential
        dispatches).  Pallas path: the run-scan kernel is single-problem,
        so it loops — digits still batch into one dispatch.
        """
        m = coeffs_mont.shape[-1]
        count = coeffs_mont.shape[1]
        assert m <= self.n, "polynomial degree exceeds SRS size"
        if self.use_pallas and 32 * m >= 8192:
            return [
                self.commit_mont(coeffs_mont[:, i, :]) for i in range(count)
            ]
        self._build_jacobian()
        preX, preY, preZ = self._bases_for(m)
        digits = jax.vmap(_coeff_digits, in_axes=1)(coeffs_mont)  # [M, 32m]
        X, Y, Z = _msm_many_jit(preX, preY, preZ, digits)  # each [16, M]
        Xh, Yh, Zh = (np.asarray(c) for c in (X, Y, Z))
        return [
            jac_to_affine_host((Xh[:, i], Yh[:, i], Zh[:, i]))
            for i in range(count)
        ]


def msm_variable_base(points, scalars_mont):
    """Variable-base device MSM (no cached precompute).

    points: (x, y) affine mont limbs [16, n]; scalars_mont: [16, n].
    """
    x, y = points
    preX, preY, preZ = _window_precompute(x, y)
    digits = _coeff_digits(scalars_mont)
    return _msm_jit(preX, preY, preZ, digits)
