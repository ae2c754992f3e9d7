"""The 5-round PLONK prover, device-first.

Round structure and all algebra match the reference specification
(prover.py:51-315 stub comments + sanity asserts, README protocol spec):

  1. wire polynomials A, B, C + commitments
  2. permutation grand product Z + commitment
  3. quotient polynomial on the 4n coset, split T1/T2/T3 + commitments
  4. openings at zeta / zeta*omega
  5. linearization R, opening proofs W_z, W_zw + commitments

TPU-native realization: polynomial values live as limb tensors on device; the
grand product is a log-depth prefix-product scan (not a Python loop,
cf. prover.py:134-146); coset expansion is the NTT pipeline; commitments are
the fixed-base bucket MSM.  Fiat-Shamir challenges cross to the host between
rounds (natural phase boundaries of the protocol).

`debug=True` enables the reference's internal invariant checks
(gate constraint, Z product, quotient degree, T split, R(zeta)=0, W degrees).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from .fields import Fr, FR_MOD
from .frontend import Program, CommonPreprocessedInput
from .kzg import Setup
from .ops.limbs import fr, NLIMBS
from .ops import ntt as _ntt
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
        return proof


# ---------------------------------------------------------------------------
# Device kernels.
# ---------------------------------------------------------------------------

def _prefix_product_impl(f, g):
    """Grand-product accumulator from per-row factors.

    Z[0] = 1; Z[i] = prod_{j<i} f[j] / prod_{j<i} g[j].
    Inclusive prefix products via Hillis-Steele (log n batched muls), one
    batched inversion.  Returns (z_values, z_last) where z_last is the
    wrap-around value prod f / prod g (must equal 1).
    """
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
    z_all = fr.mul(pf, fr.inv(pg))  # z_all[i] = prod_{j<=i} f/g
    z_last = z_all[:, -1]
    ones = jnp.broadcast_to(one[:, None], (NLIMBS, 1)).astype(jnp.uint32)
    z = jnp.concatenate([ones, z_all[:, :-1]], axis=-1)
    return z, z_last


_prefix_product = jax.jit(_prefix_product_impl)


def _rlc_factors_impl(a, b, c, s1, s2, s3, roots, beta, gamma):
    """Per-row numerator/denominator factors of the permutation product.

    f[i] = rlc(A_i, w^i) * rlc(B_i, 2 w^i) * rlc(C_i, 3 w^i)
    g[i] = rlc(A_i, S1_i) * rlc(B_i, S2_i) * rlc(C_i, S3_i)
    with rlc(x, y) = x + beta*y + gamma.
    """
    beta = beta[:, None]
    gamma = gamma[:, None]

    def rlc(x, y):
        return fr.add(fr.add(x, fr.mul(beta, y)), gamma)

    r2 = fr.add(roots, roots)
    r3 = fr.add(r2, roots)
    f = fr.mul(fr.mul(rlc(a, roots), rlc(b, r2)), rlc(c, r3))
    g = fr.mul(fr.mul(rlc(a, s1), rlc(b, s2)), rlc(c, s3))
    return f, g


_rlc_factors = jax.jit(_rlc_factors_impl)


@functools.lru_cache(maxsize=None)
def _roots_device(n: int):
    return jnp.asarray(_ntt._roots_mont(n))


def _quotient_impl(
    a, b, c, pi, ql, qr, qm, qo, qc, z, zs, s1, s2, s3, l0, xvals, zh_inv,
    beta, gamma, alpha,
):
    """QUOT on the 4n coset (all inputs coset-extended, [16, 4n])."""
    beta = beta[:, None]
    gamma = gamma[:, None]
    alpha = alpha[:, None]

    def rlc(x, y):
        return fr.add(fr.add(x, fr.mul(beta, y)), gamma)

    gate = fr.add(
        fr.add(
            fr.add(fr.mul(a, ql), fr.mul(b, qr)),
            fr.add(fr.mul(fr.mul(a, b), qm), fr.mul(c, qo)),
        ),
        fr.add(pi, qc),
    )
    x2 = fr.add(xvals, xvals)
    x3 = fr.add(x2, xvals)
    perm_num = fr.mul(fr.mul(fr.mul(rlc(a, xvals), rlc(b, x2)), rlc(c, x3)), z)
    perm_den = fr.mul(fr.mul(fr.mul(rlc(a, s1), rlc(b, s2)), rlc(c, s3)), zs)
    perm = fr.mul(alpha, fr.sub(perm_num, perm_den))
    one = jnp.asarray(fr.ONE_MONT)[:, None]
    start = fr.mul(fr.mul(fr.mul(alpha, alpha), fr.sub(z, one)), l0)
    total = fr.add(gate, fr.add(perm, start))
    return fr.mul(total, zh_inv)


_quotient = jax.jit(_quotient_impl)


def _linearization_impl(
    ql, qr, qm, qo, qc, z, s3, t1, t2, t3,
    a_ev, b_ev, c_ev, s1_ev, s2_ev, zw_ev,
    pi_ev, l0_ev, zh_ev, zeta_n, zeta_2n,
    beta, gamma, alpha, zeta,
):
    """Linearization polynomial R on the 4n coset (constant-folded openings)."""
    S = lambda v: v[:, None]  # noqa: E731 — scalars to broadcastable columns
    beta_, gamma_, alpha_, zeta_ = S(beta), S(gamma), S(alpha), S(zeta)

    ab = fr.mul(S(a_ev), S(b_ev))
    gate = fr.add(
        fr.add(fr.add(fr.mul(qm, ab), fr.mul(ql, S(a_ev))), fr.mul(qr, S(b_ev))),
        fr.add(fr.mul(qo, S(c_ev)), fr.add(S(pi_ev), qc)),
    )

    def rlc_const(x, y):
        return fr.add(fr.add(x, fr.mul(beta_, y)), gamma_)

    zf = fr.mul(
        fr.mul(
            fr.mul(rlc_const(S(a_ev), zeta_), rlc_const(S(b_ev), fr.add(zeta_, zeta_))),
            rlc_const(S(c_ev), fr.add(fr.add(zeta_, zeta_), zeta_)),
        ),
        z,
    )
    sf = fr.mul(
        fr.mul(rlc_const(S(a_ev), S(s1_ev)), rlc_const(S(b_ev), S(s2_ev))),
        fr.add(fr.add(S(c_ev), gamma_), fr.mul(beta_, s3)),
    )
    sf = fr.mul(sf, S(zw_ev))
    perm = fr.mul(alpha_, fr.sub(zf, sf))

    one = jnp.asarray(fr.ONE_MONT)[:, None]
    start = fr.mul(fr.mul(fr.mul(alpha_, alpha_), S(l0_ev)), fr.sub(z, one))

    t_combined = fr.add(
        fr.add(t1, fr.mul(t2, S(zeta_n))), fr.mul(t3, S(zeta_2n))
    )
    return fr.sub(fr.add(gate, fr.add(perm, start)), fr.mul(S(zh_ev), t_combined))


_linearization = jax.jit(_linearization_impl)


def _opening_impl(r_big, a, b, c, s1, s2, xvals,
                  a_ev, b_ev, c_ev, s1_ev, s2_ev, v, zeta):
    """W_z numerator and (X - zeta)^-1 division on the coset."""
    S = lambda x: x[:, None]  # noqa: E731
    acc = r_big
    vp = v
    for poly, ev in ((a, a_ev), (b, b_ev), (c, c_ev), (s1, s1_ev), (s2, s2_ev)):
        acc = fr.add(acc, fr.mul(S(vp), fr.sub(poly, S(ev))))
        vp = fr.mul(vp, v)
    denom = fr.inv(fr.sub(xvals, S(zeta)))
    return fr.mul(acc, denom)


_opening = jax.jit(_opening_impl)


def _shifted_opening_impl(z, zw_ev, xvals, zeta_w):
    S = lambda x: x[:, None]  # noqa: E731
    denom = fr.inv(fr.sub(xvals, S(zeta_w)))
    return fr.mul(fr.sub(z, S(zw_ev)), denom)


_shifted_opening = jax.jit(_shifted_opening_impl)


@functools.lru_cache(maxsize=None)
def _coset_x_consts(n: int):
    """Constants for X and Z_H on the 4n coset, parameterized by offset.

    Returns (quarter_roots [16, 4n], w4_powers [16, 4n]) where w4 = q^n cycles
    with period 4: X(i) = offset * q^i, Z_H(i) = offset^n * w4^i - 1.
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
        jnp.asarray(fr.to_mont_host_many(qr)),
        jnp.asarray(fr.to_mont_host_many(w4p)),
    )


def _coset_x_impl(offset, offset_n, qroots, w4p):
    """(X values, Z_H^-1 values) on the coset."""
    xvals = fr.mul(offset[:, None], qroots)
    one = jnp.asarray(fr.ONE_MONT)[:, None]
    zh = fr.sub(fr.mul(offset_n[:, None], w4p), one)
    return xvals, fr.inv(zh), zh


_coset_x = jax.jit(_coset_x_impl)


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

    # -- scalars to device ------------------------------------------------
    @staticmethod
    def _s(x: Fr):
        return jnp.asarray(fr.to_mont_host(int(x)))

    def prove(self, witness: dict) -> Proof:
        transcript = Transcript(b"plonk")
        # NB: like the reference (prover.py:56 FIXME), pk and PI are not
        # absorbed — required for bit-identical challenge streams.
        witness = dict(witness)
        public_vars = self.program.get_public_assignments()
        n = self.group_order
        self.PI = Polynomial(
            [Fr(-witness[v]) for v in public_vars]
            + [Fr(0) for _ in range(n - len(public_vars))],
            Basis.LAGRANGE,
        )

        with self.timings.section("round_1"):
            msg_1 = self.round_1(witness)
        self.beta, self.gamma = transcript.round_1(msg_1)

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
        pad = n - len(wires)
        self.A = Polynomial(
            [Fr(witness[w.L]) for w in wires] + [Fr(0)] * pad, Basis.LAGRANGE
        )
        self.B = Polynomial(
            [Fr(witness[w.R]) for w in wires] + [Fr(0)] * pad, Basis.LAGRANGE
        )
        self.C = Polynomial(
            [Fr(witness[w.O]) for w in wires] + [Fr(0)] * pad, Basis.LAGRANGE
        )
        a_1 = self.setup.commit(self.A)
        b_1 = self.setup.commit(self.B)
        c_1 = self.setup.commit(self.C)

        if self.debug:
            gate = (
                self.A * self.pk.QL
                + self.B * self.pk.QR
                + self.A * self.B * self.pk.QM
                + self.C * self.pk.QO
                + self.PI
                + self.pk.QC
            )
            assert gate == Polynomial.zeros(n), "gate constraints violated"
        return Message1(a_1, b_1, c_1)

    # -- round 2: permutation grand product ------------------------------
    def round_2(self) -> Message2:
        n = self.group_order
        roots = _roots_device(n)
        f, g = _rlc_factors(
            self.A.values,
            self.B.values,
            self.C.values,
            self.pk.S1.values,
            self.pk.S2.values,
            self.pk.S3.values,
            roots,
            self._s(self.beta),
            self._s(self.gamma),
        )
        z_vals, z_last = _prefix_product(f, g)
        if self.debug:
            assert fr.from_mont_host(z_last) == 1, "grand product does not close"
        self.Z = Polynomial(z_vals, Basis.LAGRANGE)
        z_1 = self.setup.commit(self.Z)
        return Message2(z_1)

    # -- round 3: quotient polynomial ------------------------------------
    def round_3(self) -> Message3:
        n = self.group_order
        off = self.fft_cofactor
        expand = lambda p: p.to_coset_extended_lagrange(off)  # noqa: E731

        self.A_big = expand(self.A)
        self.B_big = expand(self.B)
        self.C_big = expand(self.C)
        pi_big = expand(self.PI)
        self.QL_big = expand(self.pk.QL)
        self.QR_big = expand(self.pk.QR)
        self.QM_big = expand(self.pk.QM)
        self.QO_big = expand(self.pk.QO)
        self.QC_big = expand(self.pk.QC)
        self.Z_big = expand(self.Z)
        zs_big = expand(self.Z.shift(1))
        self.S1_big = expand(self.pk.S1)
        self.S2_big = expand(self.pk.S2)
        self.S3_big = expand(self.pk.S3)
        l0_big = expand(
            Polynomial([Fr(1)] + [Fr(0)] * (n - 1), Basis.LAGRANGE)
        )

        qroots, w4p = _coset_x_consts(n)
        off_l = self._s(off)
        off_n = self._s(off ** n)
        self.X_big, zh_inv, zh_vals = _coset_x(off_l, off_n, qroots, w4p)

        quot_vals = _quotient(
            self.A_big.values, self.B_big.values, self.C_big.values,
            pi_big.values,
            self.QL_big.values, self.QR_big.values, self.QM_big.values,
            self.QO_big.values, self.QC_big.values,
            self.Z_big.values, zs_big.values,
            self.S1_big.values, self.S2_big.values, self.S3_big.values,
            l0_big.values, self.X_big, zh_inv,
            self._s(self.beta), self._s(self.gamma), self._s(self.alpha),
        )
        quot_big = Polynomial(quot_vals, Basis.LAGRANGE)

        coeffs = quot_big.coset_extended_lagrange_to_coeffs(off)
        if self.debug:
            tail = coeffs.to_ints()[3 * n :]
            assert tail == [0] * n, "quotient degree >= 3n"

        c_vals = coeffs.values
        t1 = Polynomial(c_vals[:, :n], Basis.MONOMIAL)
        t2 = Polynomial(c_vals[:, n : 2 * n], Basis.MONOMIAL)
        t3 = Polynomial(c_vals[:, 2 * n : 3 * n], Basis.MONOMIAL)
        # Keep Lagrange forms for round 5's coset re-expansion.
        self.T1 = t1.fft()
        self.T2 = t2.fft()
        self.T3 = t3.fft()

        if self.debug:
            fc = off
            lhs = (
                self.T1.barycentric_eval(fc)
                + self.T2.barycentric_eval(fc) * fc**n
                + self.T3.barycentric_eval(fc) * fc ** (n * 2)
            )
            assert lhs == Fr(fr.from_mont_host(quot_vals[:, 0])), "T split mismatch"

        t_lo_1 = self.setup.commit(t1)
        t_mid_1 = self.setup.commit(t2)
        t_hi_1 = self.setup.commit(t3)
        return Message3(t_lo_1, t_mid_1, t_hi_1)

    # -- round 4: openings -------------------------------------------------
    def round_4(self) -> Message4:
        zeta = self.zeta
        root = Fr.root_of_unity(self.group_order)
        self.a_eval = self.A.barycentric_eval(zeta)
        self.b_eval = self.B.barycentric_eval(zeta)
        self.c_eval = self.C.barycentric_eval(zeta)
        self.s1_eval = self.pk.S1.barycentric_eval(zeta)
        self.s2_eval = self.pk.S2.barycentric_eval(zeta)
        self.z_shifted_eval = self.Z.barycentric_eval(zeta * root)
        return Message4(
            self.a_eval,
            self.b_eval,
            self.c_eval,
            self.s1_eval,
            self.s2_eval,
            self.z_shifted_eval,
        )

    # -- round 5: linearization + opening proofs --------------------------
    def round_5(self) -> Message5:
        n = self.group_order
        zeta = self.zeta
        root = Fr.root_of_unity(n)
        zh_ev = zeta**n - 1
        l0_ev = zh_ev / (n * (zeta - 1))
        pi_ev = self.PI.barycentric_eval(zeta)

        off = self.fft_cofactor
        t1_big = self.T1.to_coset_extended_lagrange(off)
        t2_big = self.T2.to_coset_extended_lagrange(off)
        t3_big = self.T3.to_coset_extended_lagrange(off)

        r_vals = _linearization(
            self.QL_big.values, self.QR_big.values, self.QM_big.values,
            self.QO_big.values, self.QC_big.values,
            self.Z_big.values, self.S3_big.values,
            t1_big.values, t2_big.values, t3_big.values,
            self._s(self.a_eval), self._s(self.b_eval), self._s(self.c_eval),
            self._s(self.s1_eval), self._s(self.s2_eval),
            self._s(self.z_shifted_eval),
            self._s(pi_ev), self._s(l0_ev), self._s(zh_ev),
            self._s(zeta**n), self._s(zeta ** (2 * n)),
            self._s(self.beta), self._s(self.gamma), self._s(self.alpha),
            self._s(zeta),
        )

        if self.debug:
            r_coeffs = Polynomial(r_vals, Basis.LAGRANGE).coset_extended_lagrange_to_coeffs(off)
            r_poly = Polynomial(r_coeffs.values[:, :n], Basis.MONOMIAL).fft()
            assert r_poly.barycentric_eval(zeta) == 0, "R(zeta) != 0"

        w_z_vals = _opening(
            r_vals,
            self.A_big.values, self.B_big.values, self.C_big.values,
            self.S1_big.values, self.S2_big.values,
            self.X_big,
            self._s(self.a_eval), self._s(self.b_eval), self._s(self.c_eval),
            self._s(self.s1_eval), self._s(self.s2_eval),
            self._s(self.v), self._s(zeta),
        )
        w_z_coeffs = Polynomial(w_z_vals, Basis.LAGRANGE).coset_extended_lagrange_to_coeffs(off)
        if self.debug:
            assert w_z_coeffs.to_ints()[n:] == [0] * (3 * n), "W_z degree >= n"
        W_z = Polynomial(w_z_coeffs.values[:, :n], Basis.MONOMIAL)
        W_z_1 = self.setup.commit(W_z)

        w_zw_vals = _shifted_opening(
            self.Z_big.values,
            self._s(self.z_shifted_eval),
            self.X_big,
            self._s(zeta * root),
        )
        w_zw_coeffs = Polynomial(w_zw_vals, Basis.LAGRANGE).coset_extended_lagrange_to_coeffs(off)
        if self.debug:
            assert w_zw_coeffs.to_ints()[n:] == [0] * (3 * n), "W_zw degree >= n"
        W_zw = Polynomial(w_zw_coeffs.values[:, :n], Basis.MONOMIAL)
        W_zw_1 = self.setup.commit(W_zw)

        return Message5(W_z_1, W_zw_1)

    # -- reference-compatible helpers -------------------------------------
    def fft_expand(self, p: Polynomial) -> Polynomial:
        return p.to_coset_extended_lagrange(self.fft_cofactor)

    def expanded_evals_to_coeffs(self, p: Polynomial) -> Polynomial:
        return p.coset_extended_lagrange_to_coeffs(self.fft_cofactor)

    def rlc(self, t1, t2):
        return t1 + t2 * self.beta + self.gamma
