"""Zero-knowledge blinding (extension track).

Reference extension "add zero-knowledge" (README.md:29-37).  Hybrid scheme:

* Wires A/B/C: the last `blinding_rows` rows are reserved (no constraints,
  identity sigma) and filled with per-proof randomness — the Halo2 approach;
  wire degrees stay < n so the quotient bound and verifier are untouched.
* Grand product Z: random rows CANNOT blind Z (sigma is the identity there,
  so every blinding-row ratio is exactly 1 and Z stays a deterministic
  function of the witness and beta/gamma).  Z is therefore blinded with the
  PLONK-paper Z_H-multiple: Z' = Z + (r0 + r1*X + r2*X^2) * Z_H with fresh
  per-proof r_j.  Z' == Z on the domain, so all constraints hold; the
  commitment z_1 and the published opening Z'(zeta*w) are randomized.

blinding_rows=0 keeps the bit-identical deterministic behavior the oracle
tests pin.
"""

import os

import pytest

from plonkathon_tpu.fields import Fr
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


def test_z_randomized_under_fixed_challenges(setup, monkeypatch):
    """The strong form of Z-hiding: with beta/gamma (and every later
    challenge) pinned to constants, z_1 and z_shifted_eval must STILL differ
    across proofs of the same witness.  Under row-only blinding this fails —
    Z is a deterministic function of (witness, beta, gamma) — which is
    exactly the leak the Z_H-multiple blinding closes: a verifier-published
    Z'(zeta*w) no longer confirms a guessed witness.
    """
    from plonkathon_tpu import transcript as T

    monkeypatch.setattr(T.Transcript, "round_1", lambda s, m: (Fr(7), Fr(13)))
    monkeypatch.setattr(T.Transcript, "round_2", lambda s, m: (Fr(17), Fr(23)))
    monkeypatch.setattr(T.Transcript, "round_3", lambda s, m: Fr(29))
    monkeypatch.setattr(T.Transcript, "round_4", lambda s, m: Fr(31))

    program = Program(THREE_GATE, 8, blinding_rows=4)
    prover = Prover(setup, program, debug=True)
    p1 = prover.prove(dict(ASSIGNMENTS))
    p2 = prover.prove(dict(ASSIGNMENTS))
    f1, f2 = p1.flatten(), p2.flatten()
    # Commitment hiding AND opening hiding, with challenge variation removed.
    assert f1["z_1"] != f2["z_1"]
    assert f1["z_shifted_eval"] != f2["z_shifted_eval"]
    # Wires likewise (row randomness, independent of challenges).
    assert f1["a_1"] != f2["a_1"]


def test_batch_prover_rejects_blinding(setup):
    from plonkathon_tpu.parallel.batch import BatchProver

    program = Program(THREE_GATE, 8, blinding_rows=2)
    with pytest.raises(ValueError, match="blinding"):
        BatchProver(setup, program)


def test_blinding_rows_reduce_capacity():
    with pytest.raises(ValueError):
        Program(["x public"] + [f"c{i} <== a * a" for i in range(5)], 8,
                blinding_rows=3)


def test_blinded_sigma_is_identity_on_reserved_rows():
    program = Program(THREE_GATE, 8, blinding_rows=2)
    s1, s2, s3 = program.make_s_polynomials()
    roots = Fr.roots_of_unity(8)
    for row in (6, 7):
        assert Fr(s1.to_ints()[row]) == roots[row] * 1
        assert Fr(s2.to_ints()[row]) == roots[row] * 2
        assert Fr(s3.to_ints()[row]) == roots[row] * 3
