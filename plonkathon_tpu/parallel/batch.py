"""Batch-parallel proving: many independent proofs of one circuit at once.

Data-parallel by construction (a brand-new capability — the reference proves
strictly one proof at a time): every fused round kernel of the single-proof
prover is `vmap`ped over a leading batch axis, so B proofs cost one dispatch
per round; with a device mesh, the batch axis is sharded and XLA partitions
the whole pipeline (each instance's NTTs/MSMs are independent — no
cross-device communication at all, the ideal dp case).

Fiat-Shamir transcripts remain per-instance on the host (cheap with the
native Keccak backend).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import Fr, FR_MOD
from ..frontend import Program
from ..kzg import Setup
from ..ops.limbs import fr, NLIMBS
from ..ops import ntt as _ntt
from ..poly import Polynomial, Basis
from ..prover import (
    Proof,
    _round_jits,
)
from ..transcript import (
    Transcript,
    Message1,
    Message2,
    Message3,
    Message4,
    Message5,
)


def _stack_scalars(values) -> jnp.ndarray:
    """list of Fr -> [B, 16] Montgomery."""
    return jnp.asarray(
        np.stack([fr.to_mont_host(int(v)) for v in values], axis=0)
    )


class BatchProver:
    """Proves B witnesses of one circuit per call, one dispatch per round."""

    def __init__(self, setup: Setup, program: Program, mesh=None, axis="shard"):
        if getattr(program, "blinding_rows", 0):
            # The batch round kernels zero-pad every row past the wire count
            # and do not add the Z_H-multiple blinding to Z, so a ZK-configured
            # circuit would silently emit verifying-but-unblinded proofs.
            raise ValueError(
                "BatchProver does not implement ZK blinding; use Prover for "
                "circuits with blinding_rows > 0"
            )
        if getattr(program, "has_lookups", False):
            # The batch round kernels carry only the 15-row vanilla stack —
            # proofs would silently omit the lookup argument entirely.
            raise ValueError(
                "BatchProver does not implement PlonKup lookups; use Prover "
                "for circuits with lookup rows"
            )
        self.setup = setup
        self.program = program
        self.group_order = program.group_order
        self.pk = program.common_preprocessed_input()
        self.mesh = mesh
        self.axis = axis
        self._jits = _round_jits(self.group_order)
        pk = self.pk
        self._selector_stack = jnp.stack(
            [pk.QL.values, pk.QR.values, pk.QM.values, pk.QO.values, pk.QC.values],
            axis=1,
        )
        self._s_stack = (pk.S1.values, pk.S2.values, pk.S3.values)

    def _shard(self, arr):
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(self.axis, *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    def _extract_points(self, out, b: int, count: int):
        """Round-kernel coefficient stacks [B, 16, count, n] -> per-instance
        host affine points.

        All B*count commitments go through ONE batched MSM dispatch
        (FixedBaseMSM.commit_many_mont) instead of a B x count Python loop
        of sequential dispatches.
        """
        eng = self.setup.msm_engine
        stack = jnp.transpose(out, (1, 0, 2, 3)).reshape(
            NLIMBS, b * count, -1
        )
        pts = eng.commit_many_mont(stack)
        return [pts[i * count : (i + 1) * count] for i in range(b)]

    def prove_batch(self, witnesses: list[dict]) -> list[Proof]:
        n = self.group_order
        B = len(witnesses)
        # Commits always run outside the round jits (see Prover._pre): one
        # shared MSM executable instead of one inlined per round kernel.
        pre = None
        public_vars = self.program.get_public_assignments()
        wires = self.program.wires()
        transcripts = [Transcript(b"plonk") for _ in range(B)]

        pis = []
        for w in witnesses:
            w.setdefault(None, 0)
            pis.append(
                [(-int(w[v])) % FR_MOD for v in public_vars]
                + [0] * (n - len(public_vars))
            )

        # ---- round 1 ----
        pad = [0] * (n - len(wires))
        abc = np.stack(
            [
                np.stack(
                    [
                        fr.to_mont_host_many(
                            [int(w[x.L]) % FR_MOD for x in wires] + pad
                        ),
                        fr.to_mont_host_many(
                            [int(w[x.R]) % FR_MOD for x in wires] + pad
                        ),
                        fr.to_mont_host_many(
                            [int(w[x.O]) % FR_MOD for x in wires] + pad
                        ),
                    ],
                    axis=1,
                )
                for w in witnesses
            ]
        )  # [B, 16, 3, n]
        abc = self._shard(jnp.asarray(abc))
        pts1 = self._jits["r1"](pre, abc)
        msg1s = [Message1(*row) for row in self._extract_points(pts1, B, 3)]
        betas, gammas = zip(*(t.round_1(m) for t, m in zip(transcripts, msg1s)))

        # ---- round 2 ----
        a_vals, b_vals, c_vals = abc[:, :, 0, :], abc[:, :, 1, :], abc[:, :, 2, :]
        z_vals, _z_last, pts2 = self._jits["r2"](
            pre, a_vals, b_vals, c_vals, *self._s_stack,
            _stack_scalars(betas), _stack_scalars(gammas),
        )
        msg2s = [Message2(*row) for row in self._extract_points(pts2, B, 1)]
        alphas, offs = zip(*(t.round_2(m) for t, m in zip(transcripts, msg2s)))

        # ---- round 3 ----
        l0 = np.zeros((NLIMBS, 1, n), dtype=np.uint32)
        l0[:, 0, 0] = fr.ONE_MONT
        pi_stack = np.stack(
            [fr.to_mont_host_many(p) for p in pis]
        )  # [B, 16, n]
        polys = jnp.concatenate(
            [
                jnp.stack([a_vals, b_vals, c_vals], axis=2),
                jnp.asarray(pi_stack)[:, :, None, :],
                jnp.broadcast_to(
                    self._selector_stack[None],
                    (B, NLIMBS, 5, n),
                ),
                z_vals[:, :, None, :],
                jnp.roll(z_vals, -1, axis=-1)[:, :, None, :],
                jnp.broadcast_to(
                    jnp.stack(self._s_stack, axis=1)[None], (B, NLIMBS, 3, n)
                ),
                jnp.broadcast_to(jnp.asarray(l0)[None], (B, NLIMBS, 1, n)),
            ],
            axis=2,
        )  # [B, 16, 15, n]
        offs_f = list(offs)
        pts3, t_lag, bigs, xvals, _quot, _qc = self._jits["r3"](
            pre,
            polys,
            _stack_scalars(betas),
            _stack_scalars(gammas),
            _stack_scalars(alphas),
            _stack_scalars(offs_f),
            _stack_scalars([o**n for o in offs_f]),
            _stack_scalars([Fr(1) / o for o in offs_f]),
        )
        msg3s = [Message3(*row) for row in self._extract_points(pts3, B, 3)]
        zetas = [t.round_3(m) for t, m in zip(transcripts, msg3s)]

        # ---- round 4 ----
        root = Fr.root_of_unity(n)
        vals4 = jnp.concatenate(
            [
                jnp.stack([a_vals, b_vals, c_vals], axis=2),
                jnp.broadcast_to(
                    jnp.stack(self._s_stack[:2], axis=1)[None],
                    (B, NLIMBS, 2, n),
                ),
                z_vals[:, :, None, :],
            ],
            axis=2,
        )  # [B, 16, 6, n]
        xs = jnp.asarray(
            np.stack(
                [
                    np.stack([fr.to_mont_host(int(z))] * 5 + [fr.to_mont_host(int(z * root))], axis=1)
                    for z in zetas
                ]
            )
        )  # [B, 16, 6]
        evs = np.asarray(self._jits["r4"](vals4, xs))  # [B, 16, 6]
        msg4s = []
        all_evals = []
        for i in range(B):
            evals = [Fr(v) for v in fr.from_mont_host_many(evs[i])]
            all_evals.append(evals)
            msg4s.append(Message4(*evals))
        vs = [t.round_4(m) for t, m in zip(transcripts, msg4s)]

        # ---- round 5 ----
        pi_polys = [
            Polynomial(jnp.asarray(p), Basis.LAGRANGE) for p in pi_stack
        ]
        zh_evs = [z**n - 1 for z in zetas]
        l0_evs = [zh / (n * (z - 1)) for zh, z in zip(zh_evs, zetas)]
        pi_evs = [p.barycentric_eval(z) for p, z in zip(pi_polys, zetas)]
        col = lambda k: _stack_scalars([e[k] for e in all_evals])  # noqa: E731
        pts5, _r, _wz, _wzw = self._jits["r5"](
            pre, bigs, t_lag, xvals,
            col(0), col(1), col(2), col(3), col(4), col(5),
            _stack_scalars(pi_evs), _stack_scalars(l0_evs),
            _stack_scalars(zh_evs),
            _stack_scalars([z**n for z in zetas]),
            _stack_scalars([z ** (2 * n) for z in zetas]),
            _stack_scalars(betas), _stack_scalars(gammas),
            _stack_scalars(alphas), _stack_scalars(zetas),
            _stack_scalars([z * root for z in zetas]), _stack_scalars(vs),
            _stack_scalars(offs_f),
            _stack_scalars([Fr(1) / o for o in offs_f]),
        )
        rows5 = self._extract_points(pts5, B, 2)
        proofs = []
        for i in range(B):
            msg5 = Message5(*rows5[i])
            transcripts[i].round_5(msg5)
            proofs.append(Proof(msg1s[i], msg2s[i], msg3s[i], msg4s[i], msg5))
        return proofs
