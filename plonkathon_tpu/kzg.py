"""KZG trusted setup: snarkjs .ptau ingestion, commitments, verification keys.

Parses the Powers-of-Tau ceremony format used by snarkjs "prepare phase 2"
files, with the same recovery tricks as the reference loader (setup.py:23-63):
the log2 power count lives at byte 60, G1 points start at byte 80 as 32-byte
little-endian coordinate pairs scaled by a common factor recovered from the
known generator, and the G2 block is located by scanning for the scaled G2
generator x-coordinate.

Commitments run on the TPU MSM engine (ops/curve.py); the SRS window tables
are precomputed once per setup.
"""

from __future__ import annotations

from dataclasses import dataclass

from .fields import Fq, Fq2, Fr, FQ_MOD
from .ec import G1, G2, B2, is_on_curve
from .ops.curve import FixedBaseMSM
from .poly import Polynomial, Basis
from . import verifier as _verifier

_POWERS_BYTE = 60
_G1_START = 80


@dataclass
class Setup:
    powers_of_x: list  # [G, xG, x^2 G, ...] host affine points
    X2: tuple          # [x]_2 in G2
    srs_cache: str | None = None  # optional .npz window-table cache path

    def __post_init__(self):
        self._msm = None

    @property
    def msm_engine(self) -> FixedBaseMSM:
        if self._msm is None:
            self._msm = FixedBaseMSM(self.powers_of_x, cache_path=self.srs_cache)
        return self._msm

    @classmethod
    def generate(
        cls, powers: int, tau: int = 0xDEADBEEF1337, srs_cache: str | None = None
    ) -> "Setup":
        """Synthetic known-tau SRS for tests/benchmarks (NOT a trusted setup).

        Unlocks circuit sizes beyond the 2^11 ceremony fixture (the reference
        is capped by its ptau file, setup.py:27 / README.md:166).  Points are
        computed on-device: digits of tau^i select from a small host-built
        window table of multiples of G, a log-depth fold sums the 32 windows
        per point, and a batched inversion converts to affine.
        """
        import numpy as np
        import jax
        import jax.numpy as jnp
        from .fields import FR_MOD
        from .ec import pt_add, pt_mul
        from .ops.limbs import fq as _fq
        from .ops import curve as _curve
        from .ops.msm2 import affine_from_jacobian

        cache_file = f"{srs_cache}.gen{powers}.npz" if srs_cache else None
        if cache_file is not None:
            try:
                data = np.load(cache_file)
                if int(data["n"]) == powers and int(data["tau"]) == tau % FR_MOD:
                    xs = _fq.from_mont_host_many(data["ax"])
                    ys = _fq.from_mont_host_many(data["ay"])
                    pts = [(Fq(a), Fq(b)) for a, b in zip(xs, ys)]
                    return cls(pts, pt_mul(G2, tau % FR_MOD), srs_cache=srs_cache)
            except (OSError, KeyError, ValueError):
                pass

        tau = tau % FR_MOD
        # Host window table: T[w][b] = (b * 2^(8w)) * G, w<32, b<256.
        base = G1
        table = []
        for w in range(32):
            row = [None, base]
            acc = base
            for _ in range(254):
                acc = pt_add(acc, base)
                row.append(acc)
            table.append(row)
            for _ in range(8):
                base = pt_add(base, base)
        flat = []
        for w in range(32):
            for b in range(256):
                flat.append(table[w][b] if b else G1)  # b=0 masked below
        tx, ty = _curve.points_to_device(flat)

        # Digits of tau^i, window-major per point.
        taus = []
        cur = 1
        for _ in range(powers):
            taus.append(cur)
            cur = cur * tau % FR_MOD
        dig = np.frombuffer(
            b"".join(t.to_bytes(32, "little") for t in taus), dtype=np.uint8
        ).reshape(powers, 32).astype(np.int32)

        idx = jnp.asarray(dig + np.arange(32)[None, :] * 256)  # [n, 32]
        gx = tx[:, idx]  # [16, n, 32]
        gy = ty[:, idx]
        flag = jnp.asarray((dig != 0).astype(np.uint32))  # [n, 32]
        one = jnp.asarray(_fq.ONE_MONT)[:, None, None]
        gz = (one * flag[None]).astype(jnp.uint32)

        # Fixed-shape halving fold over the 32 windows: ONE compiled
        # jac_add body serves every level (a manual width-halving loop
        # compiled 5 distinct shapes; each remote TPU compile costs tens
        # of seconds through the tunnel and dominated SRS generation).
        cur = jax.jit(_curve.jac_fold_sum)((gx, gy, gz))
        ax, ay = affine_from_jacobian(*cur)
        ax = np.asarray(_fq.canon(ax))
        ay = np.asarray(_fq.canon(ay))
        xs = _fq.from_mont_host_many(ax)
        ys = _fq.from_mont_host_many(ay)
        pts = [(Fq(a), Fq(b)) for a, b in zip(xs, ys)]
        assert pts[0] == G1, "synthetic SRS sanity: tau^0 * G must be G"
        if cache_file is not None:
            try:
                np.savez(cache_file, n=powers, tau=tau, ax=ax, ay=ay)
            except OSError:
                pass
        return cls(pts, pt_mul(G2, tau), srs_cache=srs_cache)

    @classmethod
    def from_file(cls, filename: str, srs_cache: str | None = None) -> "Setup":
        contents = open(filename, "rb").read()
        powers = 2 ** contents[_POWERS_BYTE]
        coords = [
            int.from_bytes(contents[i : i + 32], "little")
            for i in range(_G1_START, _G1_START + 32 * powers * 2, 32)
        ]
        assert max(coords) < FQ_MOD
        # All encoded coordinates carry a common Montgomery-style factor;
        # recover it from the known generator (first point).
        factor = Fq(coords[0]) / G1[0]
        inv_factor = factor.inv()
        points = [
            (Fq(coords[2 * i] * inv_factor.n), Fq(coords[2 * i + 1] * inv_factor.n))
            for i in range(powers)
        ]
        # Locate the G2 block by scanning for the scaled G2 generator.
        pos = _G1_START + 32 * powers * 2
        target = (factor * G2[0].coeffs[0]).n
        while pos < len(contents):
            if int.from_bytes(contents[pos : pos + 32], "little") == target:
                break
            pos += 1
        else:
            raise ValueError(
                f"{filename}: G2 generator block not found — truncated or "
                "malformed .ptau file"
            )
        if pos + 32 * 8 > len(contents):
            raise ValueError(f"{filename}: .ptau file ends inside the G2 block")
        enc = contents[pos + 32 * 4 : pos + 32 * 8]
        vals = [
            (Fq(int.from_bytes(enc[i : i + 32], "little")) * inv_factor).n
            for i in range(0, 128, 32)
        ]
        x2 = (Fq2(vals[:2]), Fq2(vals[2:]))
        assert is_on_curve(x2, B2)
        return cls(points, x2, srs_cache=srs_cache)

    # -- commitments ------------------------------------------------------
    def commit(self, poly: Polynomial):
        """KZG commitment [p(x)]_1 (reference setup.py:66-72 semantics).

        Accepts Lagrange values (iNTT'd on device) or monomial coefficients.
        """
        if poly.basis == Basis.LAGRANGE:
            poly = poly.ifft()
        assert len(poly) <= len(self.powers_of_x), "polynomial exceeds SRS"
        return self.msm_engine.commit_mont(poly.values)

    # -- verification key -------------------------------------------------
    def verification_key(self, pk) -> "_verifier.VerificationKey":
        """Commit to the preprocessed polynomials (reference setup.py:75-77,
        verifier.py:9-34, README protocol spec)."""
        return _verifier.VerificationKey(
            group_order=pk.group_order,
            Qm=self.commit(pk.QM),
            Ql=self.commit(pk.QL),
            Qr=self.commit(pk.QR),
            Qo=self.commit(pk.QO),
            Qc=self.commit(pk.QC),
            S1=self.commit(pk.S1),
            S2=self.commit(pk.S2),
            S3=self.commit(pk.S3),
            X_2=self.X2,
            w=Fr.root_of_unity(pk.group_order),
            Qcube=(
                self.commit(pk.QCUBE) if pk.QCUBE is not None else None
            ),
            Qk=self.commit(pk.QK) if pk.QK is not None else None,
            Tbl=self.commit(pk.TBL) if pk.TBL is not None else None,
            t_last=pk.t_last,
        )
