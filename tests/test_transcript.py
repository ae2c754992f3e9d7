"""Merlin/STROBE bit-exactness and Fiat-Shamir schedule tests."""

from plonkathon_tpu.fields import Fr
from plonkathon_tpu.merlin import MerlinTranscript, Strobe128
from plonkathon_tpu.transcript import Transcript, Message4


def test_merlin_conformance_vector():
    # Upstream merlin test vector (equivalence with merlin-rs).
    t = MerlinTranscript(b"test protocol")
    t.append_message(b"some label", b"some data")
    assert (
        t.challenge_bytes(b"challenge", 32).hex()
        == "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_merlin_transcript_divergence():
    a = MerlinTranscript(b"proto")
    b = MerlinTranscript(b"proto")
    a.append_message(b"x", b"1")
    b.append_message(b"x", b"2")
    assert a.challenge_bytes(b"c", 16) != b.challenge_bytes(b"c", 16)


def test_strobe_large_absorb_crosses_rate():
    s = Strobe128(b"p")
    s.ad(b"\xab" * 1000, False)  # crosses the 166-byte rate several times
    out = s.prf(32, False)
    assert len(out) == 32


def test_challenges_deterministic_and_nonzero():
    msg = Message4(Fr(1), Fr(2), Fr(3), Fr(4), Fr(5), Fr(6))
    t1, t2 = Transcript(b"plonk"), Transcript(b"plonk")
    v1, v2 = t1.round_4(msg), t2.round_4(msg)
    assert v1 == v2
    assert v1 != Fr(0)


def test_scalar_and_point_encoding_is_32_byte_be():
    # A scalar append must match the raw 32-byte big-endian message encoding.
    t1 = Transcript(b"plonk")
    t1.append_scalar(b"s", Fr(258))
    t2 = Transcript(b"plonk")
    t2.append_message(b"s", (258).to_bytes(32, "big"))
    assert t1.challenge_bytes(b"c", 8) == t2.challenge_bytes(b"c", 8)
