"""The 5-round PLONK prover, device-first.

Round structure and all algebra match the reference specification
(prover.py:51-315 stub comments + sanity asserts, README protocol spec):

  1. wire polynomials A, B, C + commitments
  2. permutation grand product Z + commitment
  3. quotient polynomial on the 4n coset, split T1/T2/T3 + commitments
  4. openings at zeta / zeta*omega
  5. linearization R, opening proofs W_z, W_zw + commitments

TPU-native realization: **each round is one fused XLA program** — wire/grand
product/quotient/opening algebra, the NTT pipeline, digit decomposition, and
(vmapped) bucket MSMs all execute in a single dispatch per round; only the
Fiat-Shamir transcript crosses to the host between rounds (a protocol-
mandated boundary).  The grand product is a log-depth prefix-product scan
(not a Python loop, cf. reference prover.py:134-146).

`debug=True` enables the reference's internal invariant checks
(gate constraint, Z product closure, quotient degree, T split, R(zeta)=0,
W degrees).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .fields import Fr, FR_MOD
from .frontend import Program, CommonPreprocessedInput
from .kzg import Setup
from .ops.limbs import fr, NLIMBS, encode_ints
from .ops import ntt as _ntt
from .ops.ntt import _ntt_impl, _coset_to_coeffs_impl
from .ops.curve import _msm_kernel, _digits_impl, jac_to_affine_host
from .poly import Polynomial, Basis
from .transcript import (
    Transcript,
    Message1,
    Message2,
    Message3,
    Message4,
    Message5,
)


@dataclass
class Proof:
    msg_1: Message1
    msg_2: Message2
    msg_3: Message3
    msg_4: Message4
    msg_5: Message5

    def flatten(self) -> dict:
        proof = {}
        proof["a_1"] = self.msg_1.a_1
        proof["b_1"] = self.msg_1.b_1
        proof["c_1"] = self.msg_1.c_1
        proof["z_1"] = self.msg_2.z_1
        proof["t_lo_1"] = self.msg_3.t_lo_1
        proof["t_mid_1"] = self.msg_3.t_mid_1
        proof["t_hi_1"] = self.msg_3.t_hi_1
        proof["a_eval"] = self.msg_4.a_eval
        proof["b_eval"] = self.msg_4.b_eval
        proof["c_eval"] = self.msg_4.c_eval
        proof["s1_eval"] = self.msg_4.s1_eval
        proof["s2_eval"] = self.msg_4.s2_eval
        proof["z_shifted_eval"] = self.msg_4.z_shifted_eval
        proof["W_z_1"] = self.msg_5.W_z_1
        proof["W_zw_1"] = self.msg_5.W_zw_1
        if self.msg_1.f_1 is not None:
            # PlonKup extension fields (plonkup.py).
            proof["f_1"] = self.msg_1.f_1
            proof["h1_1"] = self.msg_1.h1_1
            proof["h2_1"] = self.msg_1.h2_1
            proof["z2_1"] = self.msg_2.z2_1
            for k, val in self.msg_4.lookup_evals.items():
                proof[f"lk_{k}_eval"] = val
        return proof


# ---------------------------------------------------------------------------
# Shared sub-kernels.
# ---------------------------------------------------------------------------

def _commit_many(pre, lagrange_or_coeffs, n: int, from_lagrange: bool):
    """Batched KZG commitments: values [16, B, n] -> Jacobian points [B, 16]^3.

    iNTT (when Lagrange), canonical digit decomposition, and a vmapped bucket
    MSM over the shared SRS window tables.

    When `pre` is None (TPU fast path), the MSM is NOT traced here: the
    monomial coefficient stack is returned instead and the Prover commits
    outside the fused jit through the Pallas MSM pipeline (ops/msm2.py).
    """
    vals = lagrange_or_coeffs
    if from_lagrange:
        vals = _ntt_impl(vals, n, inverse=True)
    if pre is None:
        return vals
    raw = fr.from_mont(vals)
    digits = jax.vmap(_digits_impl, in_axes=1)(raw)  # [B, 32n]
    return jax.vmap(_msm_kernel, in_axes=(None, None, None, 0))(
        pre[0], pre[1], pre[2], digits
    )


def _rlc(x, y, beta, gamma):
    return fr.add(fr.add(x, fr.mul(beta, y)), gamma)


def _prefix_product(f, g):
    """Z[0]=1; Z[i] = prod_{j<i} f[j]/g[j]; also returns the closing value."""
    n = f.shape[-1]
    steps = max((n - 1).bit_length(), 1)
    pos = jnp.arange(n)
    one = jnp.asarray(fr.ONE_MONT)

    def body(j, carry):
        cf, cg = carry
        shift = jnp.left_shift(1, j)
        valid = (pos >= shift)[None]
        inf = jnp.where(valid, jnp.roll(cf, shift, axis=-1), one[:, None])
        ing = jnp.where(valid, jnp.roll(cg, shift, axis=-1), one[:, None])
        return (fr.mul(inf, cf), fr.mul(ing, cg))

    pf, pg = jax.lax.fori_loop(0, steps, body, (f, g))
    z_all = fr.mul(pf, fr.inv(pg))
    z_last = z_all[:, -1]
    ones = jnp.broadcast_to(one[:, None], (NLIMBS, 1)).astype(jnp.uint32)
    z = jnp.concatenate([ones, z_all[:, :-1]], axis=-1)
    return z, z_last


@functools.lru_cache(maxsize=None)
def _coset_x_consts(n: int):
    """HOST constants for X and Z_H on the 4n coset: X(i) = offset * q^i and
    Z_H(i) = offset^n * w4^i - 1 where w4 = q^n has order 4.

    Only for host-side table construction (e.g. the sharded prover's
    permuted layout tables, passed to jits as operands).  Traced code must
    use `_coset_x_consts_impl` instead — baking these [16, 4n] arrays into
    an HLO costs 64 MB of program constants at n=2^18.
    """
    q = pow(5, (FR_MOD - 1) // (4 * n), FR_MOD)
    qr = []
    cur = 1
    for _ in range(4 * n):
        qr.append(cur)
        cur = cur * q % FR_MOD
    w4 = pow(q, n, FR_MOD)
    w4p = [pow(w4, i % 4, FR_MOD) for i in range(4 * n)]
    return (
        fr.to_mont_host_many(qr),
        fr.to_mont_host_many(w4p),
    )


def _coset_x_consts_impl(n: int):
    """Traced equivalent of `_coset_x_consts`: computes the [16, 4n] tables
    on device from two 64-byte constants (log-depth powers + a 4-tile)."""
    q = pow(5, (FR_MOD - 1) // (4 * n), FR_MOD)
    qroots = _ntt.scalar_powers_impl(jnp.asarray(fr.to_mont_host(q)), 4 * n)
    w4 = pow(q, n, FR_MOD)
    w4_4 = jnp.asarray(
        fr.to_mont_host_many([pow(w4, i, FR_MOD) for i in range(4)])
    )  # [16, 4]
    w4p = jnp.tile(w4_4, (1, n))
    return qroots, w4p


def _coset_x_impl(offset, offset_n, qroots, w4p):
    """(X values, Z_H^-1 values, Z_H values) on the 4n coset."""
    xvals = fr.mul(offset[:, None], qroots)
    one = jnp.asarray(fr.ONE_MONT)[:, None]
    zh = fr.sub(fr.mul(offset_n[:, None], w4p), one)
    return xvals, fr.inv(zh), zh


def _quotient_impl(
    a, b, c, pi, ql, qr, qm, qo, qc, z, zs, s1, s2, s3, l0, xvals, zh_inv,
    beta, gamma, alpha, qcube=None, lookup=None,
):
    """QUOT on the 4n coset (all inputs coset-extended, [16, 4n]).

    `qcube` (optional): the custom cube-gate selector on the coset; adds
    the TurboPlonK term q_cube * A^3 to the gate polynomial (degree
    4n-4 — still inside the 4n evaluation domain).

    `lookup` (optional, PlonKup — plonkup.py module docstring): a dict with
    the coset-extended lookup polynomials f, t, ts, h1, h1s, h2, h2s, z2,
    z2s, qk, ln ("s" = omega-shifted) and scalar limbs delta, epsilon,
    tlast, gl (= w^{n-1}); adds the five plookup identities weighted by
    alpha^3..alpha^7."""
    beta = beta[:, None]
    gamma = gamma[:, None]
    alpha = alpha[:, None]
    gate = fr.add(
        fr.add(
            fr.add(fr.mul(a, ql), fr.mul(b, qr)),
            fr.add(fr.mul(fr.mul(a, b), qm), fr.mul(c, qo)),
        ),
        fr.add(pi, qc),
    )
    if qcube is not None:
        gate = fr.add(gate, fr.mul(qcube, fr.mul(fr.mul(a, a), a)))
    x2 = fr.add(xvals, xvals)
    x3 = fr.add(x2, xvals)
    num = fr.mul(
        fr.mul(
            fr.mul(_rlc(a, xvals, beta, gamma), _rlc(b, x2, beta, gamma)),
            _rlc(c, x3, beta, gamma),
        ),
        z,
    )
    den = fr.mul(
        fr.mul(
            fr.mul(_rlc(a, s1, beta, gamma), _rlc(b, s2, beta, gamma)),
            _rlc(c, s3, beta, gamma),
        ),
        zs,
    )
    perm = fr.mul(alpha, fr.sub(num, den))
    one = jnp.asarray(fr.ONE_MONT)[:, None]
    start = fr.mul(fr.mul(fr.mul(alpha, alpha), fr.sub(z, one)), l0)
    ident = fr.add(gate, fr.add(perm, start))
    if lookup is not None:
        lk = lookup
        delta = lk["delta"][:, None]
        eps = lk["epsilon"][:, None]
        od = fr.add(one, delta)                 # 1 + delta
        ed = fr.mul(eps, od)                    # epsilon * (1 + delta)
        xm = fr.sub(xvals, lk["gl"][:, None])   # x - w^{n-1}
        z2m1 = fr.sub(lk["z2"], one)
        t_a = fr.mul(l0, z2m1)
        t_b = fr.sub(
            fr.mul(
                fr.mul(fr.mul(xm, lk["z2"]), fr.mul(od, fr.add(eps, lk["f"]))),
                fr.add(fr.add(ed, lk["t"]), fr.mul(delta, lk["ts"])),
            ),
            fr.mul(
                fr.mul(xm, lk["z2s"]),
                fr.mul(
                    fr.add(fr.add(ed, lk["h1"]), fr.mul(delta, lk["h1s"])),
                    fr.add(fr.add(ed, lk["h2"]), fr.mul(delta, lk["h2s"])),
                ),
            ),
        )
        t_c = fr.mul(lk["ln"], fr.sub(lk["h1"], lk["h2s"]))
        t_d = fr.mul(lk["ln"], z2m1)
        # f well-formedness: q_K*(a - f) + (1 - q_K)*(t_last - f).
        tl = fr.sub(lk["tlast"][:, None], lk["f"])
        t_e = fr.add(
            fr.mul(lk["qk"], fr.sub(a, lk["f"])),
            fr.mul(fr.sub(one, lk["qk"]), tl),
        )
        # alpha^3 * (a' + alpha*(b' + alpha*(c' + alpha*(d' + alpha*e'))))
        ext = fr.add(t_d, fr.mul(alpha, t_e))
        ext = fr.add(t_c, fr.mul(alpha, ext))
        ext = fr.add(t_b, fr.mul(alpha, ext))
        ext = fr.add(t_a, fr.mul(alpha, ext))
        a3 = fr.mul(fr.mul(alpha, alpha), alpha)
        ident = fr.add(ident, fr.mul(a3, ext))
    return fr.mul(ident, zh_inv)


def _barycentric_batch(values, xs, n: int):
    """values [16, B, n], xs [16, B] -> evals [16, B] (Montgomery, canonical
    up to lazy domain)."""
    roots = _ntt._roots_impl(n)
    denom = fr.sub(xs[:, :, None], roots[:, None, :])
    terms = fr.mul(fr.mul(values, roots[:, None, :]), fr.inv(denom))
    total = terms
    m = n
    while m > 1:
        half = m // 2
        total = fr.add(total[..., :half], total[..., half : 2 * half])
        m = half
    total = total[..., 0]
    xn = fr.pow_int(xs, n)
    scale = fr.mul(
        fr.sub(xn, jnp.asarray(fr.ONE_MONT)[:, None]),
        jnp.asarray(fr.to_mont_host(pow(n, -1, FR_MOD)))[:, None],
    )
    return fr.mul(total, scale)


# ---------------------------------------------------------------------------
# Fused round kernels (jitted per group_order; SRS tables are closure args).
# ---------------------------------------------------------------------------

def _round1_kernel(pre, abc_vals, n: int):
    return _commit_many(pre, abc_vals, n, from_lagrange=True)


def _round2_kernel(pre, a, b, c, s1, s2, s3, beta, gamma, n: int):
    roots = _ntt._roots_impl(n)
    beta_ = beta[:, None]
    gamma_ = gamma[:, None]
    r2 = fr.add(roots, roots)
    r3 = fr.add(r2, roots)
    f = fr.mul(
        fr.mul(_rlc(a, roots, beta_, gamma_), _rlc(b, r2, beta_, gamma_)),
        _rlc(c, r3, beta_, gamma_),
    )
    g = fr.mul(
        fr.mul(_rlc(a, s1, beta_, gamma_), _rlc(b, s2, beta_, gamma_)),
        _rlc(c, s3, beta_, gamma_),
    )
    z, z_last = _prefix_product(f, g)
    pts = _commit_many(pre, z[:, None, :], n, from_lagrange=True)
    return z, z_last, pts


def _lookup_z2_kernel(f, t, h1, h2, delta, epsilon, n: int):
    """PlonKup round-2 companion: the lookup grand product Z2.

    plookup recurrence over rows 0..n-2 (the wrap-around row's ratio is
    neutralized to 1; identity (b') of plonkup.py excludes it via the
    (x - w^{n-1}) factor):
      num_i = (1+d)(e+f_i)(e(1+d) + t_i + d*t_{i+1})
      den_i = (e(1+d) + h1_i + d*h1_{i+1})(e(1+d) + h2_i + d*h2_{i+1})
    Returns (Z2 Lagrange values, closing value, monomial coeffs)."""
    one = jnp.asarray(fr.ONE_MONT)[:, None]
    d = delta[:, None]
    e = epsilon[:, None]
    od = fr.add(one, d)
    ed = fr.mul(e, od)
    sh = lambda p: jnp.roll(p, -1, axis=-1)  # noqa: E731
    num = fr.mul(
        fr.mul(od, fr.add(e, f)),
        fr.add(fr.add(ed, t), fr.mul(d, sh(t))),
    )
    den = fr.mul(
        fr.add(fr.add(ed, h1), fr.mul(d, sh(h1))),
        fr.add(fr.add(ed, h2), fr.mul(d, sh(h2))),
    )
    mask = jnp.arange(n)[None, :] == n - 1
    num = jnp.where(mask, one, num)
    den = jnp.where(mask, one, den)
    z2, z2_last = _prefix_product(num, den)
    coeffs = _ntt_impl(z2, n, inverse=True)
    return z2, z2_last, coeffs


@functools.lru_cache(maxsize=None)
def _z2_jit(n: int):
    return jax.jit(functools.partial(_lookup_z2_kernel, n=n))


def _round3_kernel(
    pre, polys, beta, gamma, alpha, offset, offset_n, offset_inv,
    n: int, custom: bool = False, zblind=None, lookup_scalars=None,
):
    """polys: [16, 15(+1)(+11), n] = (a, b, c, pi, ql, qr, qm, qo, qc, z,
    zshift, s1, s2, s3, l0[, qcube][, f, t, ts, h1, h1s, h2, h2s, z2, z2s,
    qk, ln]).  Returns (t commitments, T lagrange stack, big stack, xvals,
    quot values).

    `lookup_scalars` (PlonKup mode): ([16] delta, [16] epsilon, [16]
    t_last) Montgomery limbs; the stack then carries the 11 extra lookup
    rows listed above ("s" = omega-shifted, ln = L_{n-1}).

    `zblind` (ZK mode): (dlo, dhi) coefficient deltas [16, P, 3] adding the
    Z_H-multiple blinding r(X)*(X^n - 1) to Z and Z(wX) post-iNTT — the
    blinded Z' has degree n+2, so the coefficient stack is extended by 3
    before the coset lift (wires stay degree n-1 via the reserved random
    rows, so the quotient degree bound < 3n is unchanged)."""
    qroots, w4p = _coset_x_consts_impl(n)
    # Batched coset extension of all 15 polynomials at once.
    coeffs = _ntt_impl(polys, n, inverse=True)
    if zblind is not None:
        dlo, dhi = zblind
        coeffs = jnp.concatenate(
            [
                fr.add(coeffs[:, :, :3], dlo),
                coeffs[:, :, 3:],
                fr.add(jnp.zeros((NLIMBS, polys.shape[1], 3), jnp.uint32), dhi),
            ],
            axis=2,
        )  # [16, P, n+3]
    ncoef = coeffs.shape[2]
    pw = _ntt.scalar_powers_impl(offset, ncoef)
    scaled = fr.mul(coeffs, pw[:, None, :])
    padded = jnp.concatenate(
        [scaled,
         jnp.zeros((NLIMBS, polys.shape[1], 4 * n - ncoef), dtype=jnp.uint32)],
        axis=2,
    )
    bigs = _ntt_impl(padded, 4 * n, inverse=False)  # [16, 15(+…), 4n]
    (a, b, c, pi, ql, qr, qm, qo, qc, z, zs, s1, s2, s3, l0) = [
        bigs[:, i, :] for i in range(15)
    ]
    qcube = bigs[:, 15, :] if custom else None
    lookup = None
    if lookup_scalars is not None:
        lk0 = 16 if custom else 15
        names = ("f", "t", "ts", "h1", "h1s", "h2", "h2s", "z2", "z2s",
                 "qk", "ln")
        lookup = {nm: bigs[:, lk0 + i, :] for i, nm in enumerate(names)}
        delta, epsilon, tlast = lookup_scalars
        lookup.update(
            delta=delta, epsilon=epsilon, tlast=tlast,
            gl=jnp.asarray(
                fr.to_mont_host(int(Fr.root_of_unity(n) ** (n - 1)))
            ),
        )
    xvals, zh_inv, _zh = _coset_x_impl(offset, offset_n, qroots, w4p)
    quot = _quotient_impl(
        a, b, c, pi, ql, qr, qm, qo, qc, z, zs, s1, s2, s3, l0,
        xvals, zh_inv, beta, gamma, alpha, qcube=qcube, lookup=lookup,
    )
    qcoeffs = _coset_to_coeffs_impl(quot, offset_inv, 4 * n)  # [16, 4n]
    t_coeffs = qcoeffs[:, : 3 * n].reshape(NLIMBS, 3, n)
    t_lagrange = _ntt_impl(t_coeffs, n, inverse=False)  # [16, 3, n]
    pts = _commit_many(pre, t_coeffs, n, from_lagrange=False)
    return pts, t_lagrange, bigs, xvals, quot, qcoeffs


def _round4_kernel(values, xs, n: int):
    """values [16, 6, n] = (A, B, C, S1, S2, Z); xs [16, 6] with the last
    entry zeta*omega."""
    return _barycentric_batch(values, xs, n)


def _linearization_impl(
    bigs_flat, t1, t2, t3, xvals,
    a_ev, b_ev, c_ev, s1_ev, s2_ev, zw_ev,
    pi_ev, l0_ev, zh_ev, zeta_n, zeta_2n,
    beta, gamma, alpha, zeta, zeta_w, v,
    qcube=None, cube_ev=None, lookup=None,
):
    """Elementwise round-5 core: (R, W_z, W_zw) values on the 4n coset.

    `lookup` (PlonKup mode): dict with coset polys f/t/h1/h2/z2/qk, the
    host-computed linearization scalars c_z2/c_h1/c_qk/c_const
    (plonkup.linearization_scalars), and the eight extra opening evals.
    R gains the three linearized commitment terms + the constant; W_z
    batches (f, t, h1, h2) at v^6..v^9; W_zw becomes the RLC of
    (z, t, h1, h2, z2) at v^0..v^4.

    Purely pointwise over the last axis, so it is layout-agnostic: the
    single-device prover feeds natural-order [16, 4n] arrays, the sharded
    prover feeds the four-step-permuted per-device flats — as long as every
    input (incl. xvals) shares the layout, the outputs come back in it.
    """
    S = lambda x: x[:, None]  # noqa: E731
    (a, b, c, _pi, ql, qr, qm, qo, qc, z, _zs, s1, s2, s3, _l0) = bigs_flat[:15]

    beta_, gamma_, alpha_, zeta_ = S(beta), S(gamma), S(alpha), S(zeta)
    ab = fr.mul(S(a_ev), S(b_ev))
    gate = fr.add(
        fr.add(fr.add(fr.mul(qm, ab), fr.mul(ql, S(a_ev))), fr.mul(qr, S(b_ev))),
        fr.add(fr.mul(qo, S(c_ev)), fr.add(S(pi_ev), qc)),
    )
    if qcube is not None:
        # TurboPlonK custom cube gate: R gains QCUBE * a_eval^3.
        gate = fr.add(gate, fr.mul(qcube, S(cube_ev)))
    zf = fr.mul(
        fr.mul(
            fr.mul(
                _rlc(S(a_ev), zeta_, beta_, gamma_),
                _rlc(S(b_ev), fr.add(zeta_, zeta_), beta_, gamma_),
            ),
            _rlc(S(c_ev), fr.add(fr.add(zeta_, zeta_), zeta_), beta_, gamma_),
        ),
        z,
    )
    sf = fr.mul(
        fr.mul(
            _rlc(S(a_ev), S(s1_ev), beta_, gamma_),
            _rlc(S(b_ev), S(s2_ev), beta_, gamma_),
        ),
        fr.add(fr.add(S(c_ev), gamma_), fr.mul(beta_, s3)),
    )
    sf = fr.mul(sf, S(zw_ev))
    perm = fr.mul(alpha_, fr.sub(zf, sf))
    one = jnp.asarray(fr.ONE_MONT)[:, None]
    start = fr.mul(fr.mul(fr.mul(alpha_, alpha_), S(l0_ev)), fr.sub(z, one))
    t_combined = fr.add(fr.add(t1, fr.mul(t2, S(zeta_n))), fr.mul(t3, S(zeta_2n)))
    r_core = fr.add(gate, fr.add(perm, start))
    if lookup is not None:
        lk = lookup
        r_core = fr.add(r_core, fr.mul(S(lk["c_z2"]), lk["z2"]))
        r_core = fr.add(r_core, fr.mul(S(lk["c_h1"]), lk["h1"]))
        r_core = fr.add(r_core, fr.mul(S(lk["c_qk"]), lk["qk"]))
        r_core = fr.add(r_core, S(lk["c_const"]))
    r_big = fr.sub(r_core, fr.mul(S(zh_ev), t_combined))

    # W_z = (R + sum v^k (poly - eval)) / (X - zeta)
    acc = r_big
    vp = v
    opened = [(a, a_ev), (b, b_ev), (c, c_ev), (s1, s1_ev), (s2, s2_ev)]
    if lookup is not None:
        opened += [
            (lookup["f"], lookup["f_ev"]), (lookup["t"], lookup["t_ev"]),
            (lookup["h1"], lookup["h1_ev"]), (lookup["h2"], lookup["h2_ev"]),
        ]
    for poly, ev in opened:
        acc = fr.add(acc, fr.mul(S(vp), fr.sub(poly, S(ev))))
        vp = fr.mul(vp, v)
    w_z = fr.mul(acc, fr.inv(fr.sub(xvals, S(zeta))))
    acc2 = fr.sub(z, S(zw_ev))
    if lookup is not None:
        vp = v
        for poly, ev in (
            (lookup["t"], lookup["t_w_ev"]), (lookup["h1"], lookup["h1_w_ev"]),
            (lookup["h2"], lookup["h2_w_ev"]), (lookup["z2"], lookup["z2_w_ev"]),
        ):
            acc2 = fr.add(acc2, fr.mul(S(vp), fr.sub(poly, S(ev))))
            vp = fr.mul(vp, v)
    w_zw = fr.mul(acc2, fr.inv(fr.sub(xvals, S(zeta_w))))
    return r_big, w_z, w_zw


def _round5_kernel(
    pre, bigs, t_lagrange, xvals,
    a_ev, b_ev, c_ev, s1_ev, s2_ev, zw_ev,
    pi_ev, l0_ev, zh_ev, zeta_n, zeta_2n,
    beta, gamma, alpha, zeta, zeta_w, v,
    offset, offset_inv,
    n: int, custom: bool = False, cube_ev=None, blind: bool = False,
    lookup_scal=None,
):
    # Expand T1..T3 to the coset (batched).
    tc = _ntt_impl(t_lagrange, n, inverse=True)
    pw = _ntt.scalar_powers_impl(offset, n)
    padded = jnp.concatenate(
        [fr.mul(tc, pw[:, None, :]),
         jnp.zeros((NLIMBS, 3, 3 * n), dtype=jnp.uint32)],
        axis=2,
    )
    t_big = _ntt_impl(padded, 4 * n, inverse=False)
    t1, t2, t3 = (t_big[:, i, :] for i in range(3))

    lookup = None
    if lookup_scal is not None:
        lk0 = 16 if custom else 15
        names = ("f", "t", "ts", "h1", "h1s", "h2", "h2s", "z2", "z2s",
                 "qk", "ln")
        lookup = {
            nm: bigs[:, lk0 + i, :] for i, nm in enumerate(names)
            if nm in ("f", "t", "h1", "h2", "z2", "qk")
        }
        scal_names = ("c_z2", "c_h1", "c_qk", "c_const", "f_ev", "t_ev",
                      "h1_ev", "h2_ev", "t_w_ev", "h1_w_ev", "h2_w_ev",
                      "z2_w_ev")
        lookup.update(dict(zip(scal_names, lookup_scal)))
    r_big, w_z, w_zw = _linearization_impl(
        [bigs[:, i, :] for i in range(15)], t1, t2, t3, xvals,
        a_ev, b_ev, c_ev, s1_ev, s2_ev, zw_ev,
        pi_ev, l0_ev, zh_ev, zeta_n, zeta_2n,
        beta, gamma, alpha, zeta, zeta_w, v,
        qcube=bigs[:, 15, :] if custom else None,
        cube_ev=cube_ev, lookup=lookup,
    )
    w_z_coeffs = _coset_to_coeffs_impl(w_z, offset_inv, 4 * n)
    w_zw_coeffs = _coset_to_coeffs_impl(w_zw, offset_inv, 4 * n)
    # Blinded Z' (degree n+2) pushes the opening quotients to degree n+1.
    wlen = n + 3 if blind else n
    both = jnp.stack([w_z_coeffs[:, :wlen], w_zw_coeffs[:, :wlen]], axis=1)
    pts = _commit_many(pre, both, n, from_lagrange=False)
    return pts, r_big, w_z_coeffs, w_zw_coeffs


@functools.lru_cache(maxsize=None)
def _round_jits(
    n: int, custom: bool = False, blind: bool = False, lookup: bool = False
):
    """The five fused round kernels for group order n, vmapped over a
    leading batch axis.

    One compile set serves both the single prover (batch 1) and the
    batch-parallel prover (parallel/batch.py) — round kernels are the
    heaviest XLA modules in the framework, so sharing the executables
    halves compile time and the persistent-cache footprint.

    `lookup` (PlonKup): r3 takes (delta, epsilon, t_last) extra scalars and
    the 11-row-extended stack; r5 takes the 12 lookup linearization/eval
    scalars.  Mutually exclusive with `blind` (enforced by Program).
    """
    r1 = jax.vmap(
        lambda pre, abc: _round1_kernel(pre, abc, n), in_axes=(None, 0)
    )
    r2 = jax.vmap(
        lambda pre, a, b, c, s1, s2, s3, beta, gamma: _round2_kernel(
            pre, a, b, c, s1, s2, s3, beta, gamma, n
        ),
        in_axes=(None, 0, 0, 0, None, None, None, 0, 0),
    )
    if blind:
        r3 = jax.vmap(
            lambda pre, polys, beta, gamma, alpha, off, offn, offi, dlo, dhi:
            _round3_kernel(
                pre, polys, beta, gamma, alpha, off, offn, offi, n, custom,
                zblind=(dlo, dhi),
            ),
            in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0, 0),
        )
    elif lookup:
        r3 = jax.vmap(
            lambda pre, polys, beta, gamma, alpha, off, offn, offi, dl, ep, tl:
            _round3_kernel(
                pre, polys, beta, gamma, alpha, off, offn, offi, n, custom,
                lookup_scalars=(dl, ep, tl),
            ),
            in_axes=(None,) + (0,) * 10,
        )
    else:
        r3 = jax.vmap(
            lambda pre, polys, beta, gamma, alpha, off, offn, offi: _round3_kernel(
                pre, polys, beta, gamma, alpha, off, offn, offi, n, custom
            ),
            in_axes=(None, 0, 0, 0, 0, 0, 0, 0),
        )
    r4 = jax.vmap(lambda v, x: _round4_kernel(v, x, n), in_axes=(0, 0))
    # r5 scalar tail: 19 base args (a_ev..v, offset, offset_inv), then
    # cube_ev (custom mode), then the 12 lookup scalars (lookup mode).
    base = 19
    ncube = 1 if custom else 0
    nlk = 12 if lookup else 0
    r5 = jax.vmap(
        lambda pre, bigs, t_lag, xv, *scal: _round5_kernel(
            pre, bigs, t_lag, xv, *scal[:base], n=n, custom=custom,
            cube_ev=scal[base] if custom else None, blind=blind,
            lookup_scal=scal[base + ncube:] if lookup else None,
        ),
        in_axes=(None,) + (0,) * (3 + base + ncube + nlk),
    )
    return {
        "r1": jax.jit(r1),
        "r2": jax.jit(r2),
        "r3": jax.jit(r3),
        "r4": jax.jit(r4),
        "r5": jax.jit(r5),
    }


def _points_from_batch(pts, count: int):
    """vmapped MSM output ((X,Y,Z) each [B, 16]) -> list of host affine."""
    X, Y, Z = (np.asarray(c) for c in pts)
    return [
        jac_to_affine_host((X[i], Y[i], Z[i])) for i in range(count)
    ]


# ---------------------------------------------------------------------------
# Prover.
# ---------------------------------------------------------------------------

class Prover:
    def __init__(
        self,
        setup: Setup,
        program: Program,
        debug: bool = False,
        config=None,
    ):
        from .config import ProverConfig
        from .utils.profiling import Timings

        self.group_order = program.group_order
        self.setup = setup
        self.program = program
        self.pk: CommonPreprocessedInput = program.common_preprocessed_input()
        self.config = config or ProverConfig(debug_checks=debug)
        self.debug = self.config.debug_checks
        self.timings = Timings()
        self._custom = program.has_custom_gates
        self._blind = getattr(program, "blinding_rows", 0) > 0
        self._lookup = getattr(program, "has_lookups", False)
        if self._blind:
            # Z gains a Z_H-multiple of degree n+2 (see round_2), so its
            # commitment and the opening quotients need 3 extra SRS powers.
            assert setup.msm_engine.n >= self.group_order + 3, (
                "ZK blinding requires an SRS with at least group_order + 3 "
                "G1 powers"
            )
        self._jits = _round_jits(
            self.group_order, self._custom, self._blind, self._lookup
        )
        # Static per-circuit device stacks.
        pk = self.pk
        self._qcube_vals = pk.QCUBE.values if self._custom else None
        self._selector_stack = jnp.stack(
            [
                pk.QL.values, pk.QR.values, pk.QM.values, pk.QO.values,
                pk.QC.values,
            ],
            axis=1,
        )
        self._s_stack = (pk.S1.values, pk.S2.values, pk.S3.values)
        if self._lookup:
            # PlonKup static tables: the lookup selector, the padded table
            # polynomial, its values as host ints (for the sorted concat),
            # the membership set, and the lookup-row -> variable map.
            self._qk_vals = pk.QK.values
            self._tbl_vals = pk.TBL.values
            self._t_last = pk.t_last
            self._tbl_ints = pk.TBL.to_ints()
            self._tbl_set = set(self._tbl_ints)
            self._lookup_rows = [
                (i, c.wires.L)
                for i, c in enumerate(program.constraints)
                if c.coeffs.get("$lookup")
            ]
        self._mesh_msm = None

    @property
    def _mesh_on(self) -> bool:
        return self.config.mesh is not None and self._mesh_shardable()

    @property
    def _commit_engine(self):
        """Mesh-sharded MSM engine in mesh mode, single-device otherwise."""
        if self._mesh_on:
            if self._mesh_msm is None:
                from .parallel.sharded import MeshMSM

                self._mesh_msm = MeshMSM(
                    self.setup.msm_engine, self.config.mesh, self.config.mesh_axis
                )
            return self._mesh_msm
        return self.setup.msm_engine

    @staticmethod
    def _s(x) -> jnp.ndarray:
        """Fr -> [1, 16] Montgomery limbs (batch-of-one for the round jits)."""
        return jnp.asarray(fr.to_mont_host(int(x)))[None]

    @property
    def _pre(self):
        # Commits always run OUTSIDE the fused round jits, through the MSM
        # engine (Pallas pipeline on TPU, the jitted XLA bucket MSM on CPU).
        # Inlining the MSM into the rounds quadrupled compile time: the
        # same ~10k-op MSM graph was recompiled inside r1, r2, r3, and r5
        # (measured 315/115/224/192 s at n=64 on CPU); one shared commit
        # executable brings those to ~10-30 s each.
        return None

    def _commits(self, coeff_stacks, count: int):
        """Round-kernel coefficient output [B, 16, count, n] -> affine points."""
        coeffs = coeff_stacks[0]  # batch entry 0: [16, count, n]
        eng = self._commit_engine
        clist = [coeffs[:, i, :] for i in range(count)]
        if hasattr(eng, "commit_batch"):
            # One host round trip for the whole round's commitments
            # (per-commit fetches cost ~30-50 ms each over the TPU tunnel).
            return eng.commit_batch(clist)
        return [eng.commit_mont(c) for c in clist]

    def prove(self, witness: dict) -> Proof:
        transcript = Transcript(b"plonk")
        # NB: like the reference (prover.py:56 FIXME), pk and PI are not
        # absorbed — required for bit-identical challenge streams.
        witness = dict(witness)
        public_vars = self.program.get_public_assignments()
        n = self.group_order
        # Sparse build: only the public inputs are nonzero (converting a
        # dense n-list costs ~0.5 s of host modmuls at n=2^18).
        pi_arr = np.zeros((NLIMBS, n), dtype=np.uint32)
        if public_vars:
            pi_arr[:, : len(public_vars)] = fr.to_mont_host_many(
                [(-int(witness[v])) % FR_MOD for v in public_vars]
            )
        self.PI = Polynomial(jnp.asarray(pi_arr), Basis.LAGRANGE)

        with self.timings.section("round_1"):
            msg_1 = self.round_1(witness)
        self.beta, self.gamma = transcript.round_1(msg_1)
        if self._lookup:
            self.delta, self.epsilon = transcript.delta, transcript.epsilon

        with self.timings.section("round_2"):
            msg_2 = self.round_2()
        self.alpha, self.fft_cofactor = transcript.round_2(msg_2)

        with self.timings.section("round_3"):
            msg_3 = self.round_3()
        self.zeta = transcript.round_3(msg_3)

        with self.timings.section("round_4"):
            msg_4 = self.round_4()
        self.v = transcript.round_4(msg_4)

        with self.timings.section("round_5"):
            msg_5 = self.round_5()
        return Proof(msg_1, msg_2, msg_3, msg_4, msg_5)

    # -- round 1: wire polynomials ---------------------------------------
    def round_1(self, witness: dict) -> Message1:
        n = self.group_order
        if None not in witness:
            witness[None] = 0
        wires = self.program.wires()
        t = getattr(self.program, "blinding_rows", 0)
        pad = [0] * (n - t - len(wires))
        if t:
            # Per-proof fresh randomness in the reserved rows: selectors
            # are zero and sigma is the identity there, so any values
            # satisfy the gate and copy constraints while statistically
            # hiding the wire polynomials.
            import secrets

            tails = [
                [secrets.randbelow(FR_MOD) for _ in range(t)]
                for _ in range(3)
            ]
        else:
            tails = [[], [], []]
        col = lambda sel, tail: (  # noqa: E731
            [int(witness[sel(w)]) % FR_MOD for w in wires] + pad + tail
        )
        # Raw limbs on the host (bytes-based encode), Montgomery conversion
        # on device: the per-element host modmul cost ~1.5 s at n=2^18.
        abc_raw = np.stack(
            [
                encode_ints(col(lambda w: w.L, tails[0])),
                encode_ints(col(lambda w: w.R, tails[1])),
                encode_ints(col(lambda w: w.O, tails[2])),
            ],
            axis=1,
        )  # [16, 3, n]
        abc = fr.to_mont(jnp.asarray(abc_raw))
        self.A = Polynomial(abc[:, 0, :], Basis.LAGRANGE)
        self.B = Polynomial(abc[:, 1, :], Basis.LAGRANGE)
        self.C = Polynomial(abc[:, 2, :], Basis.LAGRANGE)
        if self._lookup:
            # PlonKup query polynomial f and sorted-concat halves h1/h2
            # (host construction: one O(n) pass + a table-ordered sort —
            # proving-path MSMs/NTTs stay on device).
            from .plonkup import sorted_by_table

            t_last = int(self._t_last)
            fvals = [t_last] * n
            for row, var in self._lookup_rows:
                val = int(witness[var]) % FR_MOD
                if val not in self._tbl_set:
                    raise ValueError(
                        f"lookup witness {var}={val} not in the table"
                    )
                fvals[row] = val
            s = sorted_by_table(fvals[: n - 1], self._tbl_ints)
            fh_raw = np.stack(
                [
                    encode_ints(fvals),
                    encode_ints(s[:n]),
                    encode_ints(s[n - 1 :]),
                ],
                axis=1,
            )  # [16, 3, n]
            fh = fr.to_mont(jnp.asarray(fh_raw))
            stack6 = jnp.concatenate([abc, fh], axis=1)
            self.F = Polynomial(stack6[:, 3, :], Basis.LAGRANGE)
            self.H1 = Polynomial(stack6[:, 4, :], Basis.LAGRANGE)
            self.H2 = Polynomial(stack6[:, 5, :], Basis.LAGRANGE)
            pts = self._jits["r1"](self._pre, stack6[None])
            a_1, b_1, c_1, f_1, h1_1, h2_1 = self._commits(pts, 6)
            if self.debug:
                fv = self.F.to_ints()
                qk = self.pk.QK.to_ints()
                av = self.A.to_ints()
                assert all(
                    f == (a if q else t_last)
                    for f, q, a in zip(fv, qk, av)
                ), "query polynomial f malformed"
            lk_extra = (f_1, h1_1, h2_1)
        else:
            lk_extra = (None, None, None)
            if self._mesh_on:
                from .parallel.sharded import sharded_intt

                coeffs = sharded_intt(
                    self.config.mesh, self.config.mesh_axis, abc
                )
                pts = coeffs[None]
            else:
                pts = self._jits["r1"](self._pre, abc[None])
            a_1, b_1, c_1 = self._commits(pts, 3)

        if self.debug:
            gate = (
                self.A * self.pk.QL
                + self.B * self.pk.QR
                + self.A * self.B * self.pk.QM
                + self.C * self.pk.QO
                + self.PI
                + self.pk.QC
            )
            if self._custom:
                gate = gate + self.A * self.A * self.A * self.pk.QCUBE
            assert gate == Polynomial.zeros(n), "gate constraints violated"
        return Message1(a_1, b_1, c_1, *lk_extra)

    # -- round 2: permutation grand product ------------------------------
    def round_2(self) -> Message2:
        if self._mesh_on:
            return self._round_2_sharded()
        z_vals, z_last, pts = self._jits["r2"](
            self._pre,
            self.A.values[None],
            self.B.values[None],
            self.C.values[None],
            *self._s_stack,
            self._s(self.beta),
            self._s(self.gamma),
        )
        if self.debug:
            assert fr.from_mont_host(np.asarray(z_last[0])) == 1, (
                "grand product does not close"
            )
        self.Z = Polynomial(z_vals[0], Basis.LAGRANGE)
        if self._blind:
            # Z' = Z + r(X) * Z_H(X), r of degree 2 with fresh per-proof
            # randomness: Z' == Z on the domain (all constraints and the
            # grand-product recurrence are untouched), but the commitment
            # and the zeta*omega opening become statistically hiding —
            # random rows alone cannot blind Z because their sigma is the
            # identity (the num/den ratios there are exactly 1).
            import secrets

            n = self.group_order
            self._z_blind = tuple(secrets.randbelow(FR_MOD) for _ in range(3))
            r0, r1, r2 = self._z_blind
            coeffs = pts[0][:, 0, :]  # [16, n] monomial, Montgomery
            dlo = jnp.asarray(
                fr.to_mont_host_many([FR_MOD - r0, FR_MOD - r1, FR_MOD - r2])
            )
            dhi = jnp.asarray(fr.to_mont_host_many([r0, r1, r2]))
            ext = jnp.concatenate(
                [fr.add(coeffs[:, :3], dlo), coeffs[:, 3:], dhi], axis=1
            )  # [16, n+3] = coeffs of Z'
            z_1 = self._commit_engine.commit_mont(ext)
        else:
            (z_1,) = self._commits(pts, 1)
        if self._lookup:
            n = self.group_order
            z2, z2_last, z2c = _z2_jit(n)(
                self.F.values, self._tbl_vals,
                self.H1.values, self.H2.values,
                self._s(self.delta)[0], self._s(self.epsilon)[0],
            )
            if self.debug:
                assert fr.from_mont_host(np.asarray(z2_last)) == 1, (
                    "lookup grand product does not close"
                )
            self.Z2 = Polynomial(z2, Basis.LAGRANGE)
            z2_1 = self._commit_engine.commit_mont(z2c)
            return Message2(z_1, z2_1)
        return Message2(z_1)

    def _round_2_sharded(self) -> Message2:
        """Round 2 with the grand product length-sharded: local prefix scans
        + one all_gather carry + one ppermute boundary shift."""
        from .parallel.sharded import sharded_round2, sharded_intt

        mesh, axis = self.config.mesh, self.config.mesh_axis
        stack = jnp.stack(
            [self.A.values, self.B.values, self.C.values, *self._s_stack],
            axis=1,
        )
        z, z_last = sharded_round2(
            mesh, axis, stack, self._s(self.beta)[0], self._s(self.gamma)[0]
        )
        if self.debug:
            assert fr.from_mont_host(np.asarray(z_last)) == 1, (
                "grand product does not close"
            )
        self.Z = Polynomial(z, Basis.LAGRANGE)
        coeffs = sharded_intt(mesh, axis, z[:, None, :])
        (z_1,) = self._commits(coeffs[None], 1)
        return Message2(z_1)

    # -- round 3: quotient polynomial ------------------------------------
    def round_3(self) -> Message3:
        n = self.group_order
        off = self.fft_cofactor
        l0 = jnp.concatenate(
            [
                jnp.asarray(fr.ONE_MONT)[:, None],
                jnp.zeros((NLIMBS, n - 1), dtype=jnp.uint32),
            ],
            axis=1,
        )
        polys = jnp.stack(
            [
                self.A.values, self.B.values, self.C.values, self.PI.values,
            ],
            axis=1,
        )
        stack = [
            polys,
            self._selector_stack,
            self.Z.values[:, None, :],
            self.Z.shift(1).values[:, None, :],
            jnp.stack(self._s_stack, axis=1),
            l0[:, None, :],
        ]
        if self._custom:
            stack.append(self._qcube_vals[:, None, :])
        if self._lookup:
            sh = lambda p: jnp.roll(p, -1, axis=-1)  # noqa: E731
            ln = jnp.concatenate(
                [
                    jnp.zeros((NLIMBS, n - 1), dtype=jnp.uint32),
                    jnp.asarray(fr.ONE_MONT)[:, None],
                ],
                axis=1,
            )
            lk_rows = [
                self.F.values, self._tbl_vals, sh(self._tbl_vals),
                self.H1.values, sh(self.H1.values),
                self.H2.values, sh(self.H2.values),
                self.Z2.values, sh(self.Z2.values),
                self._qk_vals, ln,
            ]
            stack.append(jnp.stack(lk_rows, axis=1))
        polys = jnp.concatenate(stack, axis=1)  # [16, 15(+1)(+11), n]
        if self.config.mesh is not None and self._mesh_shardable():
            return self._round_3_sharded(polys)
        extra = ()
        if self._lookup:
            extra = (
                self._s(self.delta), self._s(self.epsilon),
                self._s(self._t_last),
            )
        if self._blind:
            # Coefficient deltas of r(X)*Z_H for Z (row 9) and, omega-scaled,
            # for Z(wX) (row 10); zero for every other stack entry.
            P = polys.shape[1]
            root = Fr.root_of_unity(n)
            r = [Fr(v) for v in self._z_blind]
            rw = [r[j] * root**j for j in range(3)]
            dlo = np.zeros((NLIMBS, P, 3), dtype=np.uint32)
            dhi = np.zeros((NLIMBS, P, 3), dtype=np.uint32)
            dlo[:, 9, :] = fr.to_mont_host_many([int(-v) % FR_MOD for v in r])
            dhi[:, 9, :] = fr.to_mont_host_many([int(v) for v in r])
            dlo[:, 10, :] = fr.to_mont_host_many([int(-v) % FR_MOD for v in rw])
            dhi[:, 10, :] = fr.to_mont_host_many([int(v) for v in rw])
            extra = (jnp.asarray(dlo)[None], jnp.asarray(dhi)[None])
        pts, t_lag, bigs, xvals, quot, qcoeffs = self._jits["r3"](
            self._pre,
            polys[None],
            self._s(self.beta),
            self._s(self.gamma),
            self._s(self.alpha),
            self._s(off),
            self._s(off**n),
            self._s(Fr(1) / off),
            *extra,
        )
        self._t_lag = t_lag
        self._bigs = bigs
        self._xvals = xvals

        if self.debug:
            tail = fr.from_mont_host_many(np.asarray(qcoeffs[0][:, 3 * n :]))
            assert tail == [0] * n, "quotient degree >= 3n"
            t1 = Polynomial(t_lag[0][:, 0, :], Basis.LAGRANGE)
            t2 = Polynomial(t_lag[0][:, 1, :], Basis.LAGRANGE)
            t3 = Polynomial(t_lag[0][:, 2, :], Basis.LAGRANGE)
            lhs = (
                t1.barycentric_eval(off)
                + t2.barycentric_eval(off) * off**n
                + t3.barycentric_eval(off) * off ** (n * 2)
            )
            assert lhs == Fr(fr.from_mont_host(np.asarray(quot[0][:, 0]))), (
                "T split mismatch"
            )

        t_lo_1, t_mid_1, t_hi_1 = self._commits(pts, 3)
        return Message3(t_lo_1, t_mid_1, t_hi_1)

    def _mesh_shardable(self) -> bool:
        """Mesh round 3 needs n = n1*n2 with both divisible by the axis size.

        Custom-gate circuits currently take the single-device round path
        (the sharded round-3/5 kernels are traced for the 15-poly stack),
        and so do ZK-blinded circuits (the sharded chain does not plumb the
        Z_H-multiple coefficient deltas) and PlonKup circuits (the 11-row
        lookup stack extension is single-device only)."""
        from .parallel.sharded import _factor

        if self._custom or self._blind or self._lookup:
            return False
        try:
            _factor(self.group_order, self.config.mesh.shape[self.config.mesh_axis])
            return True
        except ValueError:
            return False

    def _round_3_sharded(self, polys) -> Message3:
        """Round 3 with the NTT/quotient chain length-sharded over the mesh.

        Bit-identical to the single-device path (exact integer math); the
        coset extension, quotient, and inverse transform run inside one
        shard_map (parallel/sharded.py `sharded_round3`) with three
        all_to_alls as the only communication.
        """
        n = self.group_order
        off = self.fft_cofactor
        from .parallel.sharded import sharded_round3

        r3 = sharded_round3(
            self.config.mesh, self.config.mesh_axis, polys,
            self._s(self.beta)[0], self._s(self.gamma)[0],
            self._s(self.alpha)[0], off,
        )
        qcoeffs = r3.qcoeffs
        t_coeffs = qcoeffs[:, : 3 * n].reshape(NLIMBS, 3, n)
        t_lag = _ntt.ntt(t_coeffs)  # jitted forward NTT
        self._t_lag = t_lag[None]
        self._bigs = r3.bigs[None]
        self._xvals = r3.xvals[None]
        self._r3_permuted = (r3.bigs_p, r3.xvals_p)

        if self.debug:
            tail = fr.from_mont_host_many(np.asarray(qcoeffs[:, 3 * n :]))
            assert tail == [0] * n, "quotient degree >= 3n"

        eng = self._commit_engine
        t_lo_1, t_mid_1, t_hi_1 = (
            eng.commit_mont(t_coeffs[:, i, :]) for i in range(3)
        )
        return Message3(t_lo_1, t_mid_1, t_hi_1)

    # -- round 4: openings -------------------------------------------------
    def round_4(self) -> Message4:
        n = self.group_order
        zeta = self.zeta
        root = Fr.root_of_unity(n)
        rows = [
            self.A.values, self.B.values, self.C.values,
            self._s_stack[0], self._s_stack[1],
            self.Z.values,
        ]
        zl, zwl = self._s(zeta)[0], self._s(zeta * root)[0]
        points = [zl] * 5 + [zwl]
        if self._lookup:
            # f, t at zeta; t, h1, h2 at both; z2 at zeta*omega only
            # (z2(zeta) and q_K(zeta) are linearized away in round 5).
            rows += [
                self.F.values, self._tbl_vals, self._tbl_vals,
                self.H1.values, self.H1.values,
                self.H2.values, self.H2.values, self.Z2.values,
            ]
            points += [zl, zl, zwl, zl, zwl, zl, zwl, zwl]
        values = jnp.stack(rows, axis=1)
        xs = jnp.stack(points, axis=1)
        if self._mesh_on:
            from .parallel.sharded import sharded_round4

            evs = sharded_round4(
                self.config.mesh, self.config.mesh_axis, values, xs
            )[None]
        else:
            evs = self._jits["r4"](values[None], xs[None])
        evals = [Fr(v) for v in fr.from_mont_host_many(np.asarray(evs[0]))]
        if self._blind:
            # The barycentric kernel evaluates the unblinded Z values; the
            # published opening is Z'(zeta*w) = Z(zeta*w) + r(zeta*w)*Z_H
            # with Z_H(zeta*w) = zeta^n - 1.
            zw = zeta * root
            r0, r1, r2 = (Fr(v) for v in self._z_blind)
            evals[5] = evals[5] + (r0 + r1 * zw + r2 * zw * zw) * (zeta**n - 1)
        (
            self.a_eval, self.b_eval, self.c_eval,
            self.s1_eval, self.s2_eval, self.z_shifted_eval,
        ) = evals[:6]
        if self._lookup:
            keys = ("f", "t", "t_w", "h1", "h1_w", "h2", "h2_w", "z2_w")
            self.lookup_evals = dict(zip(keys, evals[6:]))
            return Message4(*evals[:6], lookup_evals=self.lookup_evals)
        return Message4(*evals)

    # -- round 5: linearization + opening proofs --------------------------
    def round_5(self) -> Message5:
        if self._mesh_on and getattr(self, "_r3_permuted", None) is not None:
            return self._round_5_sharded()
        n = self.group_order
        zeta = self.zeta
        root = Fr.root_of_unity(n)
        off = self.fft_cofactor
        zh_ev = zeta**n - 1
        l0_ev = zh_ev / (n * (zeta - 1))
        pi_ev = self.PI.barycentric_eval(zeta)

        extra = (self._s(self.a_eval**3),) if self._custom else ()
        if self._lookup:
            from .plonkup import linearization_scalars

            e = dict(self.lookup_evals)
            e["a"] = self.a_eval
            c_z2, c_h1, c_qk, c_const = linearization_scalars(
                n, self.alpha, zeta, self.delta, self.epsilon, e,
                self._t_last, root,
            )
            extra = extra + tuple(
                self._s(x)
                for x in (
                    c_z2, c_h1, c_qk, c_const,
                    e["f"], e["t"], e["h1"], e["h2"],
                    e["t_w"], e["h1_w"], e["h2_w"], e["z2_w"],
                )
            )
        pts, r_big, w_z_coeffs, w_zw_coeffs = self._jits["r5"](
            self._pre,
            self._bigs,
            self._t_lag,
            self._xvals,
            self._s(self.a_eval), self._s(self.b_eval), self._s(self.c_eval),
            self._s(self.s1_eval), self._s(self.s2_eval),
            self._s(self.z_shifted_eval),
            self._s(pi_ev), self._s(l0_ev), self._s(zh_ev),
            self._s(zeta**n), self._s(zeta ** (2 * n)),
            self._s(self.beta), self._s(self.gamma), self._s(self.alpha),
            self._s(zeta), self._s(zeta * root), self._s(self.v),
            self._s(off), self._s(Fr(1) / off),
            *extra,
        )

        if self.debug:
            r_coeffs = Polynomial(r_big[0], Basis.LAGRANGE).coset_extended_lagrange_to_coeffs(off)
            if self._blind:
                # R has degree n+2 under blinding; Horner over all coeffs.
                r_at_zeta = Fr(0)
                for c in reversed(r_coeffs.to_ints()):
                    r_at_zeta = r_at_zeta * zeta + Fr(c)
                assert r_at_zeta == 0, "R(zeta) != 0"
            else:
                r_poly = Polynomial(r_coeffs.values[:, :n], Basis.MONOMIAL).fft()
                assert r_poly.barycentric_eval(zeta) == 0, "R(zeta) != 0"
            wlen = n + 3 if self._blind else n  # blinded Z' raises W degrees
            assert fr.from_mont_host_many(
                np.asarray(w_z_coeffs[0][:, wlen:])
            ) == [0] * (4 * n - wlen), "W_z degree too large"
            assert fr.from_mont_host_many(
                np.asarray(w_zw_coeffs[0][:, wlen:])
            ) == [0] * (4 * n - wlen), "W_zw degree too large"

        W_z_1, W_zw_1 = self._commits(pts, 2)
        return Message5(W_z_1, W_zw_1)

    def _round_5_sharded(self) -> Message5:
        """Round 5 with every NTT and the linearization length-sharded.

        Consumes the permuted sharded arrays kept by `_round_3_sharded`, so
        the linearization runs directly in the four-step layout with zero
        re-permutation traffic; bit-identical to the single-device path.
        """
        from .parallel.sharded import sharded_round5

        n = self.group_order
        zeta = self.zeta
        root = Fr.root_of_unity(n)
        off = self.fft_cofactor
        zh_ev = zeta**n - 1
        l0_ev = zh_ev / (n * (zeta - 1))
        pi_ev = self.PI.barycentric_eval(zeta)

        bigs_p, xvals_p = self._r3_permuted
        s = lambda x: self._s(x)[0]  # noqa: E731
        scalars = (
            s(self.a_eval), s(self.b_eval), s(self.c_eval),
            s(self.s1_eval), s(self.s2_eval), s(self.z_shifted_eval),
            s(pi_ev), s(l0_ev), s(zh_ev),
            s(zeta**n), s(zeta ** (2 * n)),
            s(self.beta), s(self.gamma), s(self.alpha),
            s(zeta), s(zeta * root), s(self.v),
        )
        r_big, w_z_coeffs, w_zw_coeffs = sharded_round5(
            self.config.mesh, self.config.mesh_axis,
            bigs_p, xvals_p, self._t_lag[0], scalars, off,
        )

        if self.debug:
            r_coeffs = Polynomial(
                r_big, Basis.LAGRANGE
            ).coset_extended_lagrange_to_coeffs(off)
            r_poly = Polynomial(r_coeffs.values[:, :n], Basis.MONOMIAL).fft()
            assert r_poly.barycentric_eval(zeta) == 0, "R(zeta) != 0"
            assert fr.from_mont_host_many(np.asarray(w_z_coeffs[:, n:])) == [0] * (
                3 * n
            ), "W_z degree >= n"
            assert fr.from_mont_host_many(np.asarray(w_zw_coeffs[:, n:])) == [0] * (
                3 * n
            ), "W_zw degree >= n"

        eng = self._commit_engine
        W_z_1 = eng.commit_mont(w_z_coeffs[:, :n])
        W_zw_1 = eng.commit_mont(w_zw_coeffs[:, :n])
        return Message5(W_z_1, W_zw_1)

    # -- reference-compatible helpers -------------------------------------
    def fft_expand(self, p: Polynomial) -> Polynomial:
        return p.to_coset_extended_lagrange(self.fft_cofactor)

    def expanded_evals_to_coeffs(self, p: Polynomial) -> Polynomial:
        return p.coset_extended_lagrange_to_coeffs(self.fft_cofactor)

    def rlc(self, t1, t2):
        return t1 + t2 * self.beta + self.gamma
