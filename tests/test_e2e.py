"""End-to-end protocol tests against the reference's golden fixtures.

Mirrors the reference test strategy (test.py:14-283):
  * golden commitment constant (setup_test)
  * snarkjs vkey vectors for three circuits (basic/ab_plus_a/one_public)
  * recorded known-good proof checks the verifier (proof.pickle)
  * our prover must reproduce that proof bit-for-bit (Fiat-Shamir determinism)
  * full prove+verify round trips
"""

import json
import os

import pytest

from plonkathon_tpu.fields import Fr
from plonkathon_tpu.frontend import Program
from plonkathon_tpu.kzg import Setup
from plonkathon_tpu.poly import Polynomial, Basis
from plonkathon_tpu.prover import Prover
from plonkathon_tpu.utils.serialization import (
    interpret_json_point,
    load_proof_pickle,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
PTAU = os.path.join(FIXTURES, "powersOfTau28_hez_final_11.ptau")


@pytest.fixture(scope="module")
def setup():
    return Setup.from_file(PTAU)


def test_setup_golden_commitment(setup):
    # Reference test.py:14-34: commit to values 1..8 over the n=8 domain.
    from plonkathon_tpu.fields import Fq

    dummy = Polynomial(list(range(1, 9)), Basis.LAGRANGE)
    commitment = setup.commit(dummy)
    assert commitment == (
        Fq(16120260411117808045030798560855586501988622612038310041007562782458075125622),
        Fq(3125847109934958347271782137825877642397632921923926105820408033549219695465),
    )
    program = Program(["c <== a * b"], 8)
    vk = setup.verification_key(program.common_preprocessed_input())
    assert (
        vk.w
        == 19540430494807482326159819597004422086093766032135589407132600596362845576832
    )


VKEY_CASES = [
    (["c <== a * b"], "main.plonk.vkey.json"),
    (["ab === a - c", "-ab === a * b"], "main.plonk.vkey-58.json"),
    (["c public", "c === a * b"], "main.plonk.vkey-59.json"),
]


@pytest.mark.parametrize("lines,fixture", VKEY_CASES, ids=[c[1] for c in VKEY_CASES])
def test_vkey_matches_snarkjs(setup, lines, fixture):
    program = Program(lines, 8)
    vk = setup.verification_key(program.common_preprocessed_input())
    theirs = json.load(open(os.path.join(FIXTURES, fixture)))
    for key in ("Qm", "Ql", "Qr", "Qo", "Qc", "S1", "S2", "S3", "X_2"):
        assert interpret_json_point(theirs[key]) == getattr(vk, key), key
    assert vk.w == int(theirs["w"])


THREE_GATE = ["e public", "c <== a * b", "e <== c * d"]
ASSIGNMENTS = {"a": 3, "b": 4, "c": 12, "d": 5, "e": 60}


@pytest.fixture(scope="module")
def recorded_proof():
    return load_proof_pickle(os.path.join(FIXTURES, "proof.pickle"))


def test_recorded_proof_verifies(setup, recorded_proof):
    # Oracle direction 1: known-good proof -> our verifier must accept.
    program = Program(THREE_GATE, 8)
    vk = setup.verification_key(program.common_preprocessed_input())
    assert vk.verify_proof_unoptimized(8, recorded_proof, [60])
    assert vk.verify_proof(8, recorded_proof, [60])


def test_prover_bit_identical_to_reference(setup, recorded_proof):
    # Oracle direction 2: our prover must reproduce the recorded proof
    # exactly (PLONK + Merlin Fiat-Shamir is fully deterministic).
    program = Program(THREE_GATE, 8)
    prover = Prover(setup, program, debug=True)
    proof = prover.prove(dict(ASSIGNMENTS))
    ours, theirs = proof.flatten(), recorded_proof.flatten()
    assert set(ours) == set(theirs)
    for key in ours:
        assert ours[key] == theirs[key], f"proof field {key} diverges"


def test_prove_and_verify_roundtrip(setup):
    program = Program(THREE_GATE, 8)
    prover = Prover(setup, program, debug=True)
    proof = prover.prove(dict(ASSIGNMENTS))
    vk = setup.verification_key(program.common_preprocessed_input())
    assert vk.verify_proof_unoptimized(8, proof, [60])
    assert vk.verify_proof(8, proof, [60])


def test_factorization_circuit(setup):
    # Reference test.py:171-213: prove knowledge of factors of 91.
    program = Program.from_str(
        """n public
        pb0 === pb0 * pb0
        pb1 === pb1 * pb1
        pb2 === pb2 * pb2
        pb3 === pb3 * pb3
        qb0 === qb0 * qb0
        qb1 === qb1 * qb1
        qb2 === qb2 * qb2
        qb3 === qb3 * qb3
        pb01 <== pb0 + 2 * pb1
        pb012 <== pb01 + 4 * pb2
        p <== pb012 + 8 * pb3
        qb01 <== qb0 + 2 * qb1
        qb012 <== qb01 + 4 * qb2
        q <== qb012 + 8 * qb3
        n <== p * q""",
        16,
    )
    assignments = program.fill_variable_assignments(
        {"pb3": 1, "pb2": 1, "pb1": 0, "pb0": 1, "qb3": 0, "qb2": 1, "qb1": 1, "qb0": 1}
    )
    vk = setup.verification_key(program.common_preprocessed_input())
    prover = Prover(setup, program)
    proof = prover.prove(assignments)
    assert vk.verify_proof(16, proof, [91])
