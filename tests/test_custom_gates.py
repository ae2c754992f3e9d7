"""TurboPlonK custom-gate extension: the cube gate.

Reference extension track (README.md:29-31 "add custom gates").  One row
`c <== a * a * a` replaces the two vanilla rows (a2 = a*a, c = a2*a): the
circuit gains a QCUBE selector column, the quotient the term q_cube * A^3
(degree 4n-4, still inside the 4n coset), the linearization QCUBE * a_ev^3,
and the VK an optional ninth commitment.  Vanilla circuits are unaffected
(QCUBE is None; the snarkjs vkey goldens pin that layout).
"""

import os

import pytest

from plonkathon_tpu.fields import Fr
from plonkathon_tpu.frontend import Program
from plonkathon_tpu.kzg import Setup
from plonkathon_tpu.prover import Prover

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
PTAU = os.path.join(FIXTURES, "powersOfTau28_hez_final_11.ptau")

CUBE_LINES = ["out public", "b <== a * a * a", "out <== b * b * b"]


@pytest.fixture(scope="module")
def setup():
    return Setup.from_file(PTAU)


def test_cube_gate_witness_fill():
    program = Program(CUBE_LINES, 8, custom_gates=True)
    assert program.has_custom_gates
    w = program.fill_variable_assignments({"a": 3})
    assert w["b"] == 27
    assert w["out"] == 27**3


def test_cube_gate_rejected_without_flag():
    with pytest.raises(ValueError):
        Program(["b <== a * a * a"], 8)


def test_cube_gate_prove_verify(setup):
    program = Program(CUBE_LINES, 8, custom_gates=True)
    witness = program.fill_variable_assignments({"a": 3})
    prover = Prover(setup, program, debug=True)
    proof = prover.prove(dict(witness))
    vk = setup.verification_key(program.common_preprocessed_input())
    assert vk.Qcube is not None
    assert vk.verify_proof(8, proof, [27**3])
    assert vk.verify_proof_unoptimized(8, proof, [27**3])
    # Wrong public input must be rejected.
    assert vk.verify_proof(8, proof, [42]) is False


def test_cube_gate_matches_vanilla_semantics(setup):
    # The same function via vanilla gates: both proofs must verify against
    # the same public output (different circuits -> different VKs/proofs).
    vanilla = Program(
        [
            "out public",
            "a2 <== a * a",
            "b <== a2 * a",
            "b2 <== b * b",
            "out <== b2 * b",
        ],
        8,
    )
    wv = vanilla.fill_variable_assignments({"a": 3})
    assert wv["out"] == 27**3
    vk_v = setup.verification_key(vanilla.common_preprocessed_input())
    proof_v = Prover(setup, vanilla).prove(dict(wv))
    assert vk_v.verify_proof(8, proof_v, [27**3])


def test_vanilla_vk_has_no_qcube(setup):
    program = Program(["c <== a * b"], 8)
    vk = setup.verification_key(program.common_preprocessed_input())
    assert vk.Qcube is None
