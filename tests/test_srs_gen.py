"""Synthetic known-tau SRS generator (kzg.Setup.generate)."""

import os

from plonkathon_tpu.ec import G1, G2, pt_mul
from plonkathon_tpu.fields import FR_MOD
from plonkathon_tpu.kzg import Setup


def test_generate_matches_host_scalar_muls(tmp_path):
    tau = 0xABCDEF12345
    n = 64
    setup = Setup.generate(n, tau, srs_cache=str(tmp_path / "srs"))
    assert len(setup.powers_of_x) == n
    # Spot-check tau^i * G against host double-and-add.
    for i in (0, 1, 2, 5, 33, 63):
        expect = pt_mul(G1, pow(tau, i, FR_MOD))
        assert setup.powers_of_x[i] == expect, f"power {i} mismatch"
    assert setup.X2 == pt_mul(G2, tau)

    # Cache round-trip.
    again = Setup.generate(n, tau, srs_cache=str(tmp_path / "srs"))
    assert again.powers_of_x == setup.powers_of_x


def test_generated_srs_proves_and_verifies(tmp_path):
    """A full prove+verify at n=16 against a generated (non-ceremony) SRS."""
    from plonkathon_tpu.frontend import Program
    from plonkathon_tpu.prover import Prover

    setup = Setup.generate(32)
    program = Program(["e public", "c <== a * b", "e <== c * d"], 8)
    prover = Prover(setup, program)
    proof = prover.prove({"a": 3, "b": 4, "c": 12, "d": 5, "e": 60})
    vk = setup.verification_key(program.common_preprocessed_input())
    assert vk.verify_proof(8, proof, [60])
