"""Zero-knowledge blinding via reserved random rows (extension track).

Reference extension "add zero-knowledge" (README.md:29-37).  TPU-first
design choice: instead of the PLONK paper's Z_H-multiple blinding (which
raises wire-polynomial degrees past n and would force every fused kernel
onto a larger domain), the last `blinding_rows` rows of the circuit are
reserved: no constraints, identity sigma (singleton copy cycles), and the
prover fills them with per-proof randomness — the Halo2 approach.  Degree
bounds, kernels, transcript, and verifier are all untouched; proofs become
randomized while remaining verifiable, and blinding_rows=0 keeps the
bit-identical deterministic behavior the oracle tests pin.
"""

import os

import pytest

from plonkathon_tpu.frontend import Program
from plonkathon_tpu.kzg import Setup
from plonkathon_tpu.prover import Prover

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
PTAU = os.path.join(FIXTURES, "powersOfTau28_hez_final_11.ptau")
THREE_GATE = ["e public", "c <== a * b", "e <== c * d"]
ASSIGNMENTS = {"a": 3, "b": 4, "c": 12, "d": 5, "e": 60}


@pytest.fixture(scope="module")
def setup():
    return Setup.from_file(PTAU)


def test_blinded_proofs_verify_and_differ(setup):
    program = Program(THREE_GATE, 8, blinding_rows=4)
    vk = setup.verification_key(program.common_preprocessed_input())
    prover = Prover(setup, program, debug=True)
    p1 = prover.prove(dict(ASSIGNMENTS))
    p2 = prover.prove(dict(ASSIGNMENTS))
    assert vk.verify_proof(8, p1, [60])
    assert vk.verify_proof(8, p2, [60])
    # Fresh randomness per proof: wire and grand-product commitments differ
    # between two proofs of the SAME witness (the whole point of blinding).
    f1, f2 = p1.flatten(), p2.flatten()
    assert f1["a_1"] != f2["a_1"]
    assert f1["z_1"] != f2["z_1"]


def test_blinding_rows_reduce_capacity():
    with pytest.raises(ValueError):
        Program(["x public"] + [f"c{i} <== a * a" for i in range(5)], 8,
                blinding_rows=3)


def test_blinded_sigma_is_identity_on_reserved_rows():
    program = Program(THREE_GATE, 8, blinding_rows=2)
    from plonkathon_tpu.fields import Fr

    s1, s2, s3 = program.make_s_polynomials()
    roots = Fr.roots_of_unity(8)
    for row in (6, 7):
        assert Fr(s1.to_ints()[row]) == roots[row] * 1
        assert Fr(s2.to_ints()[row]) == roots[row] * 2
        assert Fr(s3.to_ints()[row]) == roots[row] * 3
