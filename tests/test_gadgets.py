"""Gadget-vs-native oracle tests (SURVEY.md §4 pattern 1), covering the
reference's per-width unit-test suites (uint8: 20, uint16/32/64/128: 12 each,
int8, address: 5) with parametrized width sweeps."""

import pytest

from simpleworks_tpu.fields.bls12_377 import ConstraintF
from simpleworks_tpu.gadgets import (
    AddressGadget,
    Boolean,
    Comparison,
    FieldVar,
    Int8Gadget,
    UIntGadget,
    UInt8Gadget,
    address_to_field_elements,
    rotate_bytes_left,
    rotate_bytes_right,
    to_field_elements_int,
)
from simpleworks_tpu.r1cs.constraint_system import ConstraintSystem

WIDTHS = [8, 16, 32, 64, 128]


def new_cs():
    return ConstraintSystem(ConstraintF)


def mask(w):
    return (1 << w) - 1


# ------------------------------------------------------------- Boolean ----


def test_boolean_ops_truth_tables():
    for av in (False, True):
        for bv in (False, True):
            cs = new_cs()
            a = Boolean.new_witness(cs, av)
            b = Boolean.new_witness(cs, bv)
            assert a.and_(b).value() == (av and bv)
            assert a.or_(b).value() == (av or bv)
            assert a.xor(b).value() == (av != bv)
            assert a.nand(b).value() == (not (av and bv))
            assert a.nor(b).value() == (not (av or bv))
            assert a.not_().value() == (not av)
            assert cs.is_satisfied()


def test_boolean_select_and_eq():
    cs = new_cs()
    t = Boolean.new_witness(cs, True)
    f = Boolean.new_witness(cs, False)
    c = Boolean.new_witness(cs, True)
    assert Boolean.conditionally_select(c, t, f).value() is True
    assert Boolean.conditionally_select(c.not_(), t, f).value() is False
    t.enforce_equal(Boolean.constant(True, cs))
    assert cs.is_satisfied()
    t.enforce_equal(f)
    assert not cs.is_satisfied()


def test_boolean_is_witness():
    cs = new_cs()
    w = Boolean.new_witness(cs, True)
    i = Boolean.new_input(cs, True)
    assert w.is_witness() and not i.is_witness()
    assert not Boolean.constant(True).is_witness()


# ------------------------------------------------------------- UInt -------


@pytest.mark.parametrize("w", WIDTHS)
def test_uint_bitwise_vs_native(w):
    cs = new_cs()
    av, bv = 0xA3A3A3A3A3A3A3A3A3A3A3A3A3A3A3A3 & mask(w), 0x5CC55CC55CC55CC55CC55CC55CC55CC5 & mask(w)
    a = UIntGadget.new_witness(cs, w, av)
    b = UIntGadget.new_witness(cs, w, bv)
    assert a.and_(b).value() == av & bv
    assert a.or_(b).value() == av | bv
    assert a.xor(b).value() == av ^ bv
    assert a.nand(b).value() == (~(av & bv)) & mask(w)
    assert a.nor(b).value() == (~(av | bv)) & mask(w)
    assert cs.is_satisfied()


@pytest.mark.parametrize("w", WIDTHS)
def test_uint_add_wraps(w):
    cs = new_cs()
    av, bv = mask(w) - 1, 5
    a = UIntGadget.new_witness(cs, w, av)
    b = UIntGadget.new_witness(cs, w, bv)
    assert a.add(b).value() == (av + bv) & mask(w)
    assert cs.is_satisfied()


@pytest.mark.parametrize("w", WIDTHS)
def test_uint_sub_and_underflow(w):
    cs = new_cs()
    a = UIntGadget.new_witness(cs, w, 200 & mask(w) or 100)
    b = UIntGadget.new_witness(cs, w, 77)
    assert a.sub(b).value() == a.value() - 77
    assert cs.is_satisfied()
    with pytest.raises(ValueError, match="underflow"):
        b.sub(a)


@pytest.mark.parametrize("w", [8, 16, 32])
def test_uint_mul_div_vs_native(w):
    cs = new_cs()
    av, bv = 13, 11
    a = UIntGadget.new_witness(cs, w, av)
    b = UIntGadget.new_witness(cs, w, bv)
    assert a.mul(b, cs).value() == (av * bv) & mask(w)
    assert a.div(b, cs).value() == av // bv
    assert cs.is_satisfied()
    with pytest.raises(ValueError, match="divide by zero"):
        a.div(UIntGadget.new_witness(cs, w, 0), cs)


def test_uint8_mul_wrapping():
    cs = new_cs()
    a = UIntGadget.new_witness(cs, 8, 200)
    b = UIntGadget.new_witness(cs, 8, 3)
    assert a.mul(b, cs).value() == (200 * 3) & 0xFF
    assert cs.is_satisfied()


# reference uint8 rotation tests (uint8.rs:417-475)
@pytest.mark.parametrize("positions", [1, 2])
def test_uint8_rotate_left(positions):
    cs = new_cs()
    byte = UInt8Gadget.new_witness(cs, 142)
    result = byte.rotate_left(positions, cs)
    expected = ((142 << positions) | (142 >> (8 - positions))) & 0xFF
    assert cs.is_satisfied()
    assert result.value() == expected


@pytest.mark.parametrize("positions", [1, 2])
def test_uint8_rotate_right(positions):
    cs = new_cs()
    byte = UInt8Gadget.new_witness(cs, 135)
    result = byte.rotate_right(positions, cs)
    expected = ((135 >> positions) | (135 << (8 - positions))) & 0xFF
    assert cs.is_satisfied()
    assert result.value() == expected


# reference uint8 shift tests (uint8.rs:477-596), incl. overflow semantics
@pytest.mark.parametrize("value,positions,expected", [
    (1, 1, 2), (1, 2, 4), (0b1000_0001, 1, 2), (1, 8, 0),
])
def test_uint8_shift_left(value, positions, expected):
    cs = new_cs()
    byte = UInt8Gadget.new_witness(cs, value)
    result = byte.shift_left(positions, cs)
    assert cs.is_satisfied()
    assert result.value() == expected


@pytest.mark.parametrize("value,positions,expected", [
    (2, 1, 1), (4, 2, 1), (1, 1, 0), (255, 8, 0),
])
def test_uint8_shift_right(value, positions, expected):
    cs = new_cs()
    byte = UInt8Gadget.new_witness(cs, value)
    result = byte.shift_right(positions, cs)
    assert cs.is_satisfied()
    assert result.value() == expected


# reference [UInt8;4] byte rotations (uint8.rs:599-772)
@pytest.mark.parametrize("positions,expected", [
    (0, [1, 2, 3, 4]), (1, [2, 3, 4, 1]), (2, [3, 4, 1, 2]), (4, [1, 2, 3, 4]),
])
def test_bytes_rotate_left(positions, expected):
    cs = new_cs()
    bytes4 = [UInt8Gadget.new_witness(cs, v) for v in (1, 2, 3, 4)]
    rotated = rotate_bytes_left(bytes4, positions, cs)
    assert cs.is_satisfied()
    assert [b.value() for b in rotated] == expected


@pytest.mark.parametrize("positions,expected", [
    (0, [1, 2, 3, 4]), (1, [4, 1, 2, 3]), (2, [3, 4, 1, 2]), (4, [1, 2, 3, 4]),
])
def test_bytes_rotate_right(positions, expected):
    cs = new_cs()
    bytes4 = [UInt8Gadget.new_witness(cs, v) for v in (1, 2, 3, 4)]
    rotated = rotate_bytes_right(bytes4, positions, cs)
    assert cs.is_satisfied()
    assert [b.value() for b in rotated] == expected


@pytest.mark.parametrize("w", WIDTHS)
def test_uint_compare_all_ops(w):
    cs = new_cs()
    a = UIntGadget.new_witness(cs, w, 10)
    b = UIntGadget.new_witness(cs, w, 20)
    assert a.compare(b, Comparison.LESS_THAN, cs).value() is True
    assert a.compare(b, Comparison.LESS_THAN_OR_EQUAL, cs).value() is True
    assert a.compare(b, Comparison.GREATER_THAN, cs).value() is False
    assert a.compare(a, Comparison.GREATER_THAN_OR_EQUAL, cs).value() is True
    assert cs.is_satisfied()


@pytest.mark.parametrize("w", [16, 32, 64, 128])
def test_uint_from_bytes(w):
    cs = new_cs()
    data = [0x11, 0x22, 0x33, 0x44, 0x55, 0x66, 0x77, 0x88] * (w // 64 or 1)
    data = data[: w // 8]
    byte_gadgets = [UInt8Gadget.new_witness(cs, v) for v in data]
    le = UIntGadget.from_bytes_le(w, byte_gadgets)
    be = UIntGadget.from_bytes_be(w, byte_gadgets)
    assert le.value() == int.from_bytes(bytes(data), "little")
    assert be.value() == int.from_bytes(bytes(data), "big")


def test_uint8_new_input_vec_values():
    cs = new_cs()
    data = b"Hello World"
    gadgets = UIntGadget.new_input_vec(cs, data)
    assert bytes(g.value() for g in gadgets) == data
    assert cs.is_satisfied()
    # one packed public input for 11 bytes (31-byte capacity)
    assert cs.num_instance_variables == 2


def test_uint_enforce_equal_and_is_eq():
    cs = new_cs()
    a = UIntGadget.new_witness(cs, 8, 9)
    b = UIntGadget.new_witness(cs, 8, 9)
    c = UIntGadget.new_witness(cs, 8, 7)
    assert a.is_eq(b).value() is True
    assert a.is_eq(c).value() is False
    a.enforce_equal(b)
    assert cs.is_satisfied()
    a.enforce_equal(c)
    assert not cs.is_satisfied()


# -------------------------------------------------------- ToFieldElements ----


def test_to_field_elements_little_endian():
    # reference traits.rs tests: 142u8 -> [0,1,1,1,0,0,0,1]
    assert to_field_elements_int(142, 8) == [0, 1, 1, 1, 0, 0, 0, 1]
    assert to_field_elements_int(0xFFFF, 16) == [1] * 16
    assert to_field_elements_int(1 << 31, 32) == [0] * 31 + [1]
    assert to_field_elements_int(64, 8) == [0, 0, 0, 0, 0, 0, 1, 0]
    assert to_field_elements_int(-64, 8) == [0, 0, 0, 0, 0, 0, 1, 1]
    assert to_field_elements_int(127, 8) == [1] * 7 + [0]


def test_address_to_field_elements():
    address = b"aleo1" + b"1" * 58
    fes = address_to_field_elements(address)
    assert len(fes) == 63 * 8
    assert fes[:8] == [1, 0, 0, 0, 0, 1, 1, 0]  # 'a' = 0x61


# ------------------------------------------------------------- Int8 -------


def test_int8_alloc_and_value():
    cs = new_cs()
    for v in (-128, -64, -1, 0, 1, 64, 127):
        g = Int8Gadget.new_witness(cs, v)
        assert g.value() == v
    assert cs.is_satisfied()


def test_int8_add_two_complement():
    cases = [(3, 4), (-3, 4), (3, -4), (-3, -4), (127, 1), (-128, -1)]
    for av, bv in cases:
        cs = new_cs()
        a = Int8Gadget.new_witness(cs, av)
        b = Int8Gadget.new_witness(cs, bv)
        expected = ((av + bv + 128) & 0xFF) - 128  # wrapping i8
        assert a.add(b).value() == expected
        assert cs.is_satisfied()


def test_int8_sub_with_checked_guard():
    cs = new_cs()
    a = Int8Gadget.new_witness(cs, 10)
    b = Int8Gadget.new_witness(cs, 3)
    assert a.sub(b).value() == 7
    with pytest.raises(ValueError, match="underflow"):
        Int8Gadget.new_witness(cs, -128).sub(Int8Gadget.new_witness(cs, 1))


def test_int8_mul_vs_native():
    for av, bv in [(3, 5), (-3, 5), (3, -5), (-3, -5), (12, 11)]:
        cs = new_cs()
        a = Int8Gadget.new_witness(cs, av)
        b = Int8Gadget.new_witness(cs, bv)
        expected = ((av * bv + 128) & 0xFF) - 128
        assert a.mul(b, cs).value() == expected
        assert cs.is_satisfied()


def test_int8_signed_division():
    for av, bv in [(7, 2), (-7, 2), (7, -2), (-7, -2), (100, 10), (-100, 10)]:
        cs = new_cs()
        a = Int8Gadget.new_witness(cs, av)
        b = Int8Gadget.new_witness(cs, bv)
        # Rust i8 division truncates toward zero
        expected = abs(av) // abs(bv)
        if (av < 0) != (bv < 0):
            expected = -expected
        assert a.div(b, cs).value() == expected
        assert cs.is_satisfied()


def test_int8_arithmetic_shift_right():
    for v, k in [(-64, 1), (-64, 2), (-1, 3), (64, 2), (-128, 8), (127, 9)]:
        cs = new_cs()
        g = Int8Gadget.new_witness(cs, v)
        result = g.shift_right(k, cs)
        expected = (-1 if v < 0 else 0) if k >= 8 else v >> k
        assert result.value() == expected
        assert cs.is_satisfied()


def test_int8_shift_left():
    for v, k in [(1, 1), (1, 6), (-1, 1), (3, 8)]:
        cs = new_cs()
        g = Int8Gadget.new_witness(cs, v)
        result = g.shift_left(k, cs)
        expected = 0 if k >= 8 else (((v << k) + 128) & 0xFF) - 128
        assert result.value() == expected
        assert cs.is_satisfied()


def test_int8_compare():
    cs = new_cs()
    a = Int8Gadget.new_witness(cs, -5)
    b = Int8Gadget.new_witness(cs, 3)
    assert a.compare(b, Comparison.LESS_THAN, cs).value() is True
    assert cs.is_satisfied()


# ------------------------------------------------------------- Address ----


def test_address_round_trip():
    cs = new_cs()
    addr_str = "aleo11111111111111111111111111111111111111111111111111111111111"
    g = AddressGadget.new_witness(cs, addr_str)
    assert g.value() == addr_str
    assert cs.is_satisfied()
    assert len(g.to_field_elements()) == 504


def test_address_eq_and_select():
    cs = new_cs()
    a = AddressGadget.new_witness(cs, b"a" * 63)
    b = AddressGadget.new_witness(cs, b"b" * 63)
    cond = Boolean.new_witness(cs, True)
    sel = AddressGadget.conditionally_select(cond, a, b)
    assert sel.value_bytes() == b"a" * 63
    assert a.is_eq(b).value() is False
    assert a.is_eq(a).value() is True
    a.enforce_equal(a)
    assert cs.is_satisfied()


# ------------------------------------------------------------- FieldVar ----


def test_field_var_arithmetic():
    cs = new_cs()
    p = ConstraintF.PARAMS.modulus
    a = FieldVar.new_witness(cs, 1234)
    b = FieldVar.new_witness(cs, 5678)
    assert a.add(b).value() == (1234 + 5678) % p
    assert a.mul(b).value() == 1234 * 5678 % p
    assert a.sub(b).value() == (1234 - 5678) % p
    assert a.inverse().value() == pow(1234, -1, p)
    assert a.pow_by_constant(17).value() == pow(1234, 17, p)
    assert cs.is_satisfied()


def test_field_var_eq_gadgets():
    cs = new_cs()
    a = FieldVar.new_witness(cs, 42)
    b = FieldVar.new_witness(cs, 42)
    c = FieldVar.new_witness(cs, 43)
    assert a.is_eq(b).value() is True
    assert a.is_eq(c).value() is False
    a.enforce_equal(b)
    assert cs.is_satisfied()
    a.enforce_equal(c)
    assert not cs.is_satisfied()


def test_field_var_bits_and_constants():
    cs = new_cs()
    a = FieldVar.new_witness(cs, 0b1011)
    bits = a.to_bits_le(8)
    assert [b.value() for b in bits] == [1, 1, 0, 1, 0, 0, 0, 0]
    assert cs.is_satisfied()
    c = FieldVar.constant(cs, 7)
    assert c.is_constant() and not c.is_witness()
    assert a.is_witness()


# ------------------------------------------------------------- addmany ----


@pytest.mark.parametrize("w", [16, 32, 64, 128])
def test_addmany_matches_wrapping_sum(w):
    """The field-arithmetic add used by the reference's uint16/32/64/128
    (arkworks addmany) and the Blake2s gadget."""
    cs = new_cs()
    vals = [mask(w) - 3, 17, mask(w) // 2, 9]
    ops = [UIntGadget.new_witness(cs, w, v) for v in vals]
    result = UIntGadget.addmany(ops, cs)
    assert result.value() == sum(vals) & mask(w)
    assert cs.is_satisfied()


def test_addmany_unsatisfiable_when_tampered():
    cs = new_cs()
    a = UIntGadget.new_witness(cs, 32, 5)
    b = UIntGadget.new_witness(cs, 32, 7)
    result = UIntGadget.addmany([a, b], cs)
    assert result.value() == 12
    # corrupt the witness bit behind result bit 0 (12 is even → set to 1)
    var = result.bits[0].variable
    cs.witness_assignment[var.index] = 1
    assert not cs.is_satisfied()


def test_uint_is_witness_flags():
    cs = new_cs()
    w = UIntGadget.new_witness(cs, 16, 5)
    i = UIntGadget.new_input(cs, 16, 5)
    c = UIntGadget.constant(cs, 16, 5)
    assert w.is_witness() and not i.is_witness() and not c.is_witness()
