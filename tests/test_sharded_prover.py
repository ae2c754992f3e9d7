"""Length-sharded proving (round 3 across a mesh) and mesh-sharded batches.

Both paths must be bit-identical to the single-device prover: the sharded
round 3 (parallel/sharded.py `sharded_round3`) is the same exact integer
math rearranged over devices, and the BatchProver's mesh sharding is pure
data parallelism.
"""

import os

import pytest

from plonkathon_tpu.config import ProverConfig
from plonkathon_tpu.frontend import Program
from plonkathon_tpu.kzg import Setup
from plonkathon_tpu.parallel.batch import BatchProver
from plonkathon_tpu.parallel.mesh import make_mesh
from plonkathon_tpu.prover import Prover

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _chain_program(n: int):
    """A mul-chain circuit filling most of a group order n."""
    lines = ["out public", "c1 <== a * a"]
    k = 2
    while k < n - 3:
        lines.append(f"c{k} <== c{k-1} * a")
        k += 1
    lines.append(f"out <== c{k-1} * a")
    return Program(lines, n)


@pytest.mark.slow
def test_sharded_round3_bit_identical():
    n = 64
    program = _chain_program(n)
    setup = Setup.from_file(
        os.path.join(FIXTURES, "powersOfTau28_hez_final_11.ptau")
    )
    witness = program.fill_variable_assignments({"a": 3})

    single = Prover(setup, program).prove(dict(witness))

    mesh = make_mesh(8)
    sharded = Prover(
        setup, program, config=ProverConfig(mesh=mesh)
    ).prove(dict(witness))

    ours, theirs = sharded.flatten(), single.flatten()
    for key in ours:
        assert ours[key] == theirs[key], f"sharded/single divergence at {key}"

    vk = setup.verification_key(program.common_preprocessed_input())
    assert vk.verify_proof(n, sharded, [int(witness["out"])])


@pytest.mark.slow
def test_batch_prover_mesh_sharded():
    setup = Setup.from_file(
        os.path.join(FIXTURES, "powersOfTau28_hez_final_11.ptau")
    )
    program = Program(["e public", "c <== a * b", "e <== c * d"], 8)
    witnesses = [
        {"a": k, "b": 4, "c": 4 * k, "d": 5, "e": 20 * k} for k in range(1, 9)
    ]
    mesh = make_mesh(8)
    batch = BatchProver(setup, program, mesh=mesh)
    proofs = batch.prove_batch([dict(w) for w in witnesses])

    single = Prover(setup, program).prove(dict(witnesses[5]))
    ours, theirs = proofs[5].flatten(), single.flatten()
    for key in ours:
        assert ours[key] == theirs[key], f"mesh-batch divergence at {key}"

    vk = setup.verification_key(program.common_preprocessed_input())
    assert vk.verify_proof(8, proofs[0], [20])
