"""Plookup lookup argument (reference extension track, README.md:29-37).

Standalone single-table plookup over the framework's device kernels: NTT
coset chains for the quotient, the round-2 prefix scan for the grand
product, the fixed-base MSM engine for commitments, Merlin Fiat-Shamir.
"""

import os

import pytest

from plonkathon_tpu.fields import Fr
from plonkathon_tpu.kzg import Setup
from plonkathon_tpu.lookup import (
    LookupProof,
    prove_lookup,
    verify_lookup,
    _sorted_by_table,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
PTAU = os.path.join(FIXTURES, "powersOfTau28_hez_final_11.ptau")

TABLE = [1, 5, 7, 11, 13, 17, 19, 23]  # n = 8


@pytest.fixture(scope="module")
def setup():
    return Setup.from_file(PTAU)


def test_sorted_by_table_is_valid_merge():
    f = [5, 5, 13, 1]
    s = _sorted_by_table(f, TABLE)
    assert len(s) == len(TABLE) + len(f)
    assert sorted(s) == sorted(TABLE + f)
    # order respects the table's order
    pos = {v: i for i, v in enumerate(TABLE)}
    assert all(pos[s[i]] <= pos[s[i + 1]] for i in range(len(s) - 1))


def test_lookup_prove_verify(setup):
    witness = [5, 13, 1, 5, 23, 7, 7]  # n - 1 = 7 values, all in table
    proof = prove_lookup(setup, TABLE, witness)
    assert verify_lookup(setup, TABLE, proof)


def test_lookup_rejects_outside_value(setup):
    with pytest.raises(AssertionError):
        prove_lookup(setup, TABLE, [5, 13, 4, 5, 23, 7, 7])  # 4 not in table


def test_lookup_rejects_tampered_eval(setup):
    witness = [5, 13, 1, 5, 23, 7, 7]
    proof = prove_lookup(setup, TABLE, witness)
    bad = LookupProof(
        proof.f_1, proof.h1_1, proof.h2_1, proof.z_1, proof.q_1,
        dict(proof.evals), proof.W_z_1, proof.W_zw_1,
    )
    bad.evals["f"] = (bad.evals["f"] + 1) % Fr.modulus
    assert verify_lookup(setup, TABLE, bad) is False


def test_lookup_rejects_tampered_opening(setup):
    from plonkathon_tpu.ec import pt_add

    witness = [5, 13, 1, 5, 23, 7, 7]
    proof = prove_lookup(setup, TABLE, witness)
    bad = LookupProof(
        proof.f_1, proof.h1_1, proof.h2_1, proof.z_1, proof.q_1,
        dict(proof.evals), pt_add(proof.W_z_1, proof.W_z_1), proof.W_zw_1,
    )
    assert verify_lookup(setup, TABLE, bad) is False
