"""Circuit frontend tests: parser, selectors, permutation cycles, witness fill."""

import pytest

from plonkathon_tpu.fields import Fr
from plonkathon_tpu.frontend import (
    Program,
    parse_constraint,
    parse_expression,
    product_key,
)


def test_parse_expression_basics():
    assert parse_expression(["a", "+", "b", "*", "c", "*", "5"]) == {"a": 1, "b*c": 5}
    assert parse_expression(["6000", "-", "700", "-", "80", "+", "9"]) == {"": 5229}
    assert parse_expression(["-2", "*", "x"]) == {"x": -2}


def test_product_key_canonical():
    assert product_key("b", "a") == "a*b"
    assert product_key("a", None) == "a"
    assert product_key("", "") == ""


def test_parse_constraint_forms():
    c = parse_constraint("c <== a * b")
    assert c.wires.L == "a" and c.wires.R == "b" and c.wires.O == "c"
    assert c.coeffs == {"a*b": 1}

    c = parse_constraint("a === 9")
    assert c.wires.as_list() == [None, None, "a"]
    assert c.coeffs == {"": 9}

    # NB: sign propagation distributes over *both* factors after '-' (the
    # reference's documented example claims -45, but its code — which the
    # golden snarkjs vectors pin — yields +45; we match the code).
    c = parse_constraint("d <== a * c - 45 * a + 987")
    assert c.coeffs == {"a*c": 1, "a": 45, "": 987}

    c = parse_constraint("-ab === a * b")
    assert c.coeffs["$output_coeff"] == -1

    c = parse_constraint("e public")
    assert c.coeffs == {"e": -1, "$output_coeff": 0, "$public": True}


def test_parse_constraint_rejects_invalid():
    with pytest.raises(ValueError):
        parse_constraint("e <== a + b * c * d")  # 3 variables
    with pytest.raises(ValueError):
        parse_constraint("7 === 7")  # non-variable output
    with pytest.raises(ValueError):
        parse_constraint("a <~~ b")  # unknown operator


def test_selectors_three_gate():
    c = parse_constraint("c <== a * b")
    ql, qr, qm, qo, qc = c.selectors()
    assert (ql, qr, qo, qc) == (Fr(0), Fr(0), Fr(1), Fr(0))
    assert qm == Fr(-1)


def test_public_assignments_ordering():
    p = Program(["e public", "c <== a * b", "e <== c * d"], 8)
    assert p.get_public_assignments() == ["e"]
    with pytest.raises(ValueError):
        Program(["c <== a * b", "e public"], 8).get_public_assignments()


def test_s_polynomials_cycle_structure():
    # One variable used at (LEFT,0) and (OUTPUT,1): the cycle swaps them.
    p = Program(["b <== a * a", "c <== b * b"], 4)
    s1, s2, s3 = p.make_s_polynomials()
    roots = Fr.roots_of_unity(4)
    s1v, s2v, s3v = s1.to_scalars(), s2.to_scalars(), s3.to_scalars()
    # 'a' used at L0, R0 -> cycle (L0 R0): S1[0] = label(R,0) = 2*w^0.
    assert s1v[0] == roots[0] * 2
    assert s2v[0] == roots[0] * 1
    # 'b' used at O0, L1, R1 -> ordered [(0,O),(1,L),(1,R)] rotated by one.
    assert s1v[1] == roots[0] * 3  # S[LEFT][1] <- label of (0, OUTPUT)
    assert s2v[1] == roots[1] * 1  # S[RIGHT][1] <- label of (1, LEFT)
    assert s3v[0] == roots[1] * 2  # S[OUTPUT][0] <- label of (1, RIGHT)


def test_fill_variable_assignments():
    p = Program(["c <== a * b", "d <== c * a + 7"], 8)
    out = p.fill_variable_assignments({"a": 3, "b": 5})
    assert out["c"] == 15
    assert out["d"] == 15 * 3 + 7
    with pytest.raises(ValueError):
        Program(["c <== a * b"], 8).fill_variable_assignments(
            {"a": 2, "b": 3, "c": 7}
        )


def test_gate_polynomial_values():
    p = Program(["e public", "c <== a * b", "e <== c * d"], 8)
    ql, qr, qm, qo, qc = p.make_gate_polynomials()
    qlv = ql.to_scalars()
    qmv = qm.to_scalars()
    qov = qo.to_scalars()
    assert qlv[0] == Fr(1)  # public row: L selector 1
    assert qov[0] == Fr(0)
    assert qmv[1] == Fr(-1)
    assert qov[1] == Fr(1)
