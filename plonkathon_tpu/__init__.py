"""plonkathon_tpu — a TPU-native PLONK zk-SNARK proving framework.

A from-scratch re-design of the capabilities of 0xPARC/plonkathon for
TPU hardware: BN254 field/curve arithmetic as batched limb kernels
(JAX/XLA), NTT-based polynomial algebra, fixed-base bucket MSM for KZG
commitments, a bit-exact Merlin (STROBE-128) Fiat-Shamir transcript, the
zkrepl-style circuit DSL, the 5-round prover, and both verifier variants —
plus multi-chip sharding (four-step NTT, sharded MSM) that the reference
never had.

Quick start::

    from plonkathon_tpu import Setup, Program, Prover

    setup = Setup.from_file("powersOfTau28_hez_final_11.ptau")
    program = Program(["e public", "c <== a * b", "e <== c * d"], 8)
    proof = Prover(setup, program).prove({"a": 3, "b": 4, "c": 12, "d": 5, "e": 60})
    vk = setup.verification_key(program.common_preprocessed_input())
    assert vk.verify_proof(8, proof, [60])
"""

from .fields import Fr, Fq, Fq2, Fq12, Scalar, FR_MOD, FQ_MOD
from .poly import Polynomial, Basis
from .frontend import Program, CommonPreprocessedInput
from .kzg import Setup
from .prover import Prover, Proof
from .verifier import VerificationKey
from .transcript import (
    Transcript,
    Message1,
    Message2,
    Message3,
    Message4,
    Message5,
)
from .utils.serialization import interpret_json_point, load_proof_pickle

__version__ = "0.1.0"

__all__ = [
    "Fr",
    "Fq",
    "Fq2",
    "Fq12",
    "Scalar",
    "FR_MOD",
    "FQ_MOD",
    "Polynomial",
    "Basis",
    "Program",
    "CommonPreprocessedInput",
    "Setup",
    "Prover",
    "Proof",
    "VerificationKey",
    "Transcript",
    "Message1",
    "Message2",
    "Message3",
    "Message4",
    "Message5",
    "interpret_json_point",
    "load_proof_pickle",
]
