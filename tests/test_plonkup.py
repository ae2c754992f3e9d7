"""PlonKup: lookup gates integrated into the main PLONK prover/verifier.

Reference extension "add support for lookups (PlonKup)" (README.md:29-37).
The `x lookup` DSL statement + `Program(lookup_table=...)` weave the plookup
multiset argument into the 5-round schedule (see plonkup.py docstring).
This is new protocol surface (the reference implements none), so the oracle
is internal consistency: prover debug invariants + both verifier paths +
soundness probes (corrupted proofs and out-of-table witnesses must fail).
"""

import os
from dataclasses import replace

import pytest

from plonkathon_tpu.fields import Fr
from plonkathon_tpu.frontend import Program
from plonkathon_tpu.kzg import Setup
from plonkathon_tpu.prover import Prover

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
PTAU = os.path.join(FIXTURES, "powersOfTau28_hez_final_11.ptau")

TABLE = list(range(8))  # range-check table [0, 8)
LINES = [
    "out public",
    "x lookup",
    "y lookup",
    "s <== x + y",
    "out <== s * s",
]


@pytest.fixture(scope="module")
def setup():
    return Setup.from_file(PTAU)


@pytest.fixture(scope="module")
def proven(setup):
    program = Program(LINES, 8, lookup_table=TABLE)
    prover = Prover(setup, program, debug=True)
    witness = program.fill_variable_assignments({"x": 3, "y": 5})
    proof = prover.prove(dict(witness))
    vk = setup.verification_key(program.common_preprocessed_input())
    return program, vk, proof


def test_plonkup_proof_verifies_both_paths(proven):
    _, vk, proof = proven
    assert vk.verify_proof(8, proof, [64])
    assert vk.verify_proof_unoptimized(8, proof, [64])


def test_plonkup_proof_carries_lookup_fields(proven):
    _, _, proof = proven
    flat = proof.flatten()
    for k in ("f_1", "h1_1", "h2_1", "z2_1", "lk_f_eval", "lk_z2_w_eval"):
        assert k in flat


def test_out_of_table_witness_rejected(setup):
    program = Program(LINES, 8, lookup_table=TABLE)
    prover = Prover(setup, program, debug=True)
    witness = program.fill_variable_assignments({"x": 9, "y": 5})
    with pytest.raises(ValueError, match="not in the table"):
        prover.prove(dict(witness))


def test_corrupted_lookup_eval_rejected(proven):
    _, vk, proof = proven
    bad_evals = dict(proof.msg_4.lookup_evals)
    bad_evals["z2_w"] = bad_evals["z2_w"] + Fr(1)
    bad = replace(proof, msg_4=replace(proof.msg_4, lookup_evals=bad_evals))
    assert not vk.verify_proof(8, bad, [64])
    assert not vk.verify_proof_unoptimized(8, bad, [64])


def test_corrupted_z2_commitment_rejected(proven):
    _, vk, proof = proven
    from plonkathon_tpu.ec import G1

    bad = replace(proof, msg_2=replace(proof.msg_2, z2_1=G1))
    assert not vk.verify_proof(8, bad, [64])
    assert not vk.verify_proof_unoptimized(8, bad, [64])


def test_wrong_public_input_rejected(proven):
    _, vk, proof = proven
    assert not vk.verify_proof(8, proof, [63])


def test_frontend_validation():
    with pytest.raises(ValueError, match="lookup_table"):
        Program(["x lookup", "o <== x * x"], 8)  # no table given
    with pytest.raises(ValueError, match="larger than the group order"):
        Program(LINES, 8, lookup_table=list(range(9)))
    with pytest.raises(ValueError, match="blinding"):
        Program(LINES, 8, lookup_table=TABLE, blinding_rows=2)
    # Lookup rows carry no gate constraint and zero selectors.
    p = Program(LINES, 8, lookup_table=TABLE)
    ql, qr, qm, qo, qc = p.constraints[1].selectors()
    assert (ql, qr, qm, qo, qc) == (Fr(0),) * 5
    qk, tbl, t_last = p.make_lookup_polynomials()
    assert qk.to_ints() == [0, 1, 1, 0, 0, 0, 0, 0]
    assert tbl.to_ints() == [0, 1, 2, 3, 4, 5, 6, 7]
    assert t_last == Fr(7)


def test_batch_prover_rejects_lookups(setup):
    from plonkathon_tpu.parallel.batch import BatchProver

    program = Program(LINES, 8, lookup_table=TABLE)
    with pytest.raises(ValueError, match="lookup"):
        BatchProver(setup, program)
