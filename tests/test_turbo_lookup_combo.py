"""TurboPlonK custom gates + PlonKup lookups in ONE circuit.

BASELINE.json config #4 pairs the two extensions ("2^20-gate circuit with
TurboPlonK custom gates + PlonKup lookup argument"); this is the small
correctness anchor for that combination (`models/examples.py
turbo_lookup_program` is the scaled bench workload).
"""

import os

import pytest

from plonkathon_tpu.kzg import Setup
from plonkathon_tpu.models.examples import (
    turbo_lookup_program,
    turbo_lookup_witness,
)
from plonkathon_tpu.prover import Prover

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
PTAU = os.path.join(FIXTURES, "powersOfTau28_hez_final_11.ptau")


@pytest.mark.slow
def test_turbo_plus_lookup_proof_verifies():
    program = turbo_lookup_program(48, 64, table_bits=5)
    assert program.has_custom_gates and program.has_lookups
    setup = Setup.from_file(PTAU)
    prover = Prover(setup, program, debug=True)
    witness = turbo_lookup_witness(program)
    proof = prover.prove(dict(witness))
    vk = setup.verification_key(program.common_preprocessed_input())
    assert vk.verify_proof(64, proof, [])
    assert vk.verify_proof_unoptimized(64, proof, [])
