"""Poseidon end-to-end: ~900-gate circuit at n=1024, checked against the
host Poseidon oracle (reference test.py:242-259 counterpart)."""

import os

import pytest

from plonkathon_tpu.frontend import Program
from plonkathon_tpu.kzg import Setup
from plonkathon_tpu.prover import Prover
from plonkathon_tpu.models.poseidon import poseidon_hash, poseidon_circuit_source

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_poseidon_host_hash_stable():
    # Self-consistency + regression pin for the host oracle.
    h = poseidon_hash(1, 2)
    assert h == poseidon_hash(1, 2)
    assert h != poseidon_hash(2, 1)


@pytest.mark.slow
def test_poseidon_circuit_end_to_end():
    setup = Setup.from_file(
        os.path.join(FIXTURES, "powersOfTau28_hez_final_11.ptau")
    )
    expected = poseidon_hash(1, 2)
    program = Program.from_str(poseidon_circuit_source(), 1024)
    assignments = program.fill_variable_assignments({"L0": 1, "M0": 2})
    assert assignments["M64"] == expected.n
    vk = setup.verification_key(program.common_preprocessed_input())
    prover = Prover(setup, program)
    proof = prover.prove(assignments)
    assert vk.verify_proof(1024, proof, [1, 2, expected.n])
    assert vk.verify_proof_unoptimized(1024, proof, [1, 2, expected.n])
