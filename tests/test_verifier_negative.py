"""Negative verifier tests: corrupted proofs must be REJECTED (not crash).

The reference's contract is a boolean return (verifier.py:40-92 returns
False on the stub branch); our verifier must return False — not raise, and
not silently pass under `python -O` — when any proof field is tampered with.
Uses the recorded known-good proof (test/proof.pickle) as the base and flips
one field at a time.
"""

import copy
import os

import pytest

from plonkathon_tpu.fields import Fr
from plonkathon_tpu.frontend import Program
from plonkathon_tpu.kzg import Setup
from plonkathon_tpu.utils.serialization import load_proof_pickle

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
PTAU = os.path.join(FIXTURES, "powersOfTau28_hez_final_11.ptau")
THREE_GATE = ["e public", "c <== a * b", "e <== c * d"]


@pytest.fixture(scope="module")
def vk():
    setup = Setup.from_file(PTAU)
    program = Program(THREE_GATE, 8)
    return setup.verification_key(program.common_preprocessed_input())


@pytest.fixture(scope="module")
def good_proof():
    return load_proof_pickle(os.path.join(FIXTURES, "proof.pickle"))


def _tamper_point(proof, msg_attr, field):
    bad = copy.deepcopy(proof)
    msg = getattr(bad, msg_attr)
    pt = getattr(msg, field)
    # Replace with the doubled point: still on-curve, wrong value.
    from plonkathon_tpu.ec import pt_add

    setattr(msg, field, pt_add(pt, pt))
    return bad


def _tamper_eval(proof, field):
    bad = copy.deepcopy(proof)
    setattr(bad.msg_4, field, getattr(bad.msg_4, field) + Fr(1))
    return bad


def test_tampered_opening_proof_rejected(vk, good_proof):
    bad = _tamper_point(good_proof, "msg_5", "W_z_1")
    assert vk.verify_proof(8, bad, [60]) is False
    assert vk.verify_proof_unoptimized(8, bad, [60]) is False


def test_tampered_eval_rejected(vk, good_proof):
    bad = _tamper_eval(good_proof, "a_eval")
    assert vk.verify_proof(8, bad, [60]) is False
    assert vk.verify_proof_unoptimized(8, bad, [60]) is False


def test_tampered_commitment_rejected(vk, good_proof):
    bad = _tamper_point(good_proof, "msg_3", "t_lo_1")
    assert vk.verify_proof(8, bad, [60]) is False


def test_wrong_public_input_rejected(vk, good_proof):
    assert vk.verify_proof(8, good_proof, [61]) is False
