"""Batch-parallel prover: B proofs per dispatch, equal to single-proof output."""

import os

import pytest

from plonkathon_tpu.frontend import Program
from plonkathon_tpu.kzg import Setup
from plonkathon_tpu.prover import Prover
from plonkathon_tpu.parallel.batch import BatchProver

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.mark.slow
def test_batch_prover_matches_single():
    setup = Setup.from_file(
        os.path.join(FIXTURES, "powersOfTau28_hez_final_11.ptau")
    )
    program = Program(["e public", "c <== a * b", "e <== c * d"], 8)
    witnesses = [
        {"a": 3, "b": 4, "c": 12, "d": 5, "e": 60},
        {"a": 2, "b": 5, "c": 10, "d": 7, "e": 70},
    ]
    batch = BatchProver(setup, program)
    proofs = batch.prove_batch([dict(w) for w in witnesses])

    vk = setup.verification_key(program.common_preprocessed_input())
    assert vk.verify_proof(8, proofs[0], [60])
    assert vk.verify_proof(8, proofs[1], [70])

    # Determinism: the batch path must equal the single-proof path bit-for-bit.
    single = Prover(setup, program).prove(dict(witnesses[1]))
    ours, theirs = proofs[1].flatten(), single.flatten()
    for key in ours:
        assert ours[key] == theirs[key], f"batch/single divergence at {key}"
