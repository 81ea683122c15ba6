"""Cross-validation against independent ground truth and the reference's
own pinned constants (VERDICT r1 item 5).

Three tiers:

1. **Independent ground truth** — Python's hashlib Blake2s (the reference's
   ``blake2`` crate computes the same RFC 7693 function), curve/group laws,
   and field-constant identities that any correct BLS12-377 implementation
   must satisfy.
2. **Reference-source constants** — the Poseidon ark/MDS table and Pedersen
   window shapes parsed out of ``/root/reference`` source at test time
   (skipped when the reference checkout is absent).
3. **Self-pinned regression vectors** — deterministic outputs
   (``test_rng`` stream, Pedersen/Poseidon digests, a Schnorr signature)
   frozen at their current values.  These guard against silent drift; they
   are NOT arkworks-verified (no Rust toolchain in this environment — the
   remaining gap is documented in docs/compatibility notes).
"""

import hashlib
import json
import re
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")


# ---------------------------------------------------------- tier 1: truth ----


def test_blake2s_matches_hashlib_many_lengths():
    from simpleworks_tpu.hash.blake2s import blake2s_digest

    for n in (0, 1, 31, 32, 33, 64, 100, 255):
        data = bytes((i * 7 + n) % 256 for i in range(n))
        assert blake2s_digest(data) == hashlib.blake2s(data).digest()


def test_blake2s_gadget_matches_hashlib():
    """The in-circuit Blake2s (Schnorr challenge hash) against the stdlib —
    real end-to-end ground truth for the gadget."""
    from simpleworks_tpu.gadgets.uint import UIntGadget
    from simpleworks_tpu.r1cs.constraint_system import ConstraintSystem
    from simpleworks_tpu.schnorr.blake2s_gadget import blake2s_gadget

    from simpleworks_tpu.fields.bls12_377 import ConstraintF

    cs = ConstraintSystem(ConstraintF)
    msg = b"reference vector input 123"
    byte_gadgets = [UIntGadget.new_witness(cs, 8, b) for b in msg]
    out_bytes = blake2s_gadget(cs, byte_gadgets)
    got = bytes(u.value() for u in out_bytes)
    assert got == hashlib.blake2s(msg).digest()
    assert cs.is_satisfied()


def test_fr_field_constants():
    from simpleworks_tpu.fields.bls12_377 import FR_MODULUS, FQ_MODULUS, fr_root_of_unity

    # BLS12-377 Fr: 253-bit prime, 2-adicity 47 (SURVEY.md; zexe paper)
    assert FR_MODULUS.bit_length() == 253
    assert FQ_MODULUS.bit_length() == 377
    two_adicity = 0
    t = FR_MODULUS - 1
    while t % 2 == 0:
        t //= 2
        two_adicity += 1
    assert two_adicity == 47
    w = fr_root_of_unity(1 << 20)
    assert pow(w, 1 << 20, FR_MODULUS) == 1
    assert pow(w, 1 << 19, FR_MODULUS) != 1
    # Fq ≡ 1 mod r is false, but the embedding degree identity must hold:
    # r | q^12 − 1 (pairing target group order divides Fq12 multiplicative order)
    assert pow(FQ_MODULUS, 12, FR_MODULUS) == 1


def test_curve_group_identities():
    from simpleworks_tpu.curves.bls12_377 import G1Point, G2Point
    from simpleworks_tpu.curves.edwards import GENERATOR, SUBGROUP_ORDER
    from simpleworks_tpu.fields.bls12_377 import FR_MODULUS

    g1 = G1Point.generator()
    assert g1.scalar_mul(FR_MODULUS).is_identity()
    g2 = G2Point.generator()
    assert g2.scalar_mul(FR_MODULUS).is_identity()
    # ed-on-bls12-377 lives over BLS12-377 Fr (the key identity that lets
    # ConstraintF circuits be proven by Marlin; SURVEY.md preamble)
    assert GENERATOR.scalar_mul(SUBGROUP_ORDER).is_identity()


def test_fr_serialization_layout():
    """arkworks CanonicalSerialize for Fr: 32 little-endian bytes of the
    standard representation (src/fields/serialization.rs:5-16)."""
    from simpleworks_tpu.fields.bls12_377 import Fr, FR_MODULUS

    assert Fr(1).serialize() == b"\x01" + b"\x00" * 31
    assert Fr(0).serialize() == b"\x00" * 32
    minus_one = Fr(FR_MODULUS - 1)
    assert Fr.deserialize(minus_one.serialize()).value == FR_MODULUS - 1
    assert minus_one.serialize()[-1] < 0x20  # 253-bit field: top 3 bits clear


# -------------------------------------- tier 2: reference-source constants ----


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout absent")
def test_poseidon_constants_match_reference_source():
    """Our poseidon_params.json vs the decimal tables hard-coded in the
    reference (src/hash/helpers.rs:6-578) — byte-level parity of every
    ark and MDS constant, plus alpha and the round counts."""
    src = (REFERENCE / "src/hash/helpers.rs").read_text()
    ours = json.loads(
        (Path(__file__).parent.parent / "simpleworks_tpu/hash/poseidon_params.json").read_text()
    )
    ref_decimals = re.findall(r'"(\d{10,})"', src)
    flat_ours = [str(v) for row in ours["mds"] for v in row] + [
        str(v) for row in ours["ark"] for v in row
    ]
    # same values AND same order (the source lists mds rows, then ark rows)
    assert ref_decimals == flat_ours
    assert ours["alpha"] == 17
    assert ours["full_rounds"] == 8 and ours["partial_rounds"] == 29


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout absent")
def test_pedersen_windows_match_reference_source():
    src = (REFERENCE / "src/merkle_tree/common.rs").read_text()
    pairs = re.findall(r"WINDOW_SIZE: usize = (\d+);\s*const NUM_WINDOWS: usize = (\d+)", src)
    assert ("4", "144") in pairs and ("4", "128") in pairs
    from simpleworks_tpu.hash.pedersen import LEAF_WINDOW, TWO_TO_ONE_WINDOW

    assert (LEAF_WINDOW.window_size, LEAF_WINDOW.num_windows) == (4, 144)
    assert (TWO_TO_ONE_WINDOW.window_size, TWO_TO_ONE_WINDOW.num_windows) == (4, 128)


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout absent")
def test_ark_test_rng_seed_matches_reference_contract():
    """ark_std::test_rng() is StdRng::from_seed with the fixed 32-byte
    array [1,0,0,0, 23,0,0,0, 200,1,0,0, 210,30,0,0, 0...] (ark-std 0.3
    source). Our utils/rng.py must use the same seed so every sampled
    artifact lines up."""
    from simpleworks_tpu.utils.rng import ARK_TEST_RNG_SEED

    expected = bytes([1, 0, 0, 0, 23, 0, 0, 0, 200, 1, 0, 0, 210, 30, 0, 0]) + bytes(16)
    assert bytes(ARK_TEST_RNG_SEED) == expected


# ----------------------------------- tier 3: self-pinned regression vectors ----


PINNED_RNG_U64 = [
    10719222850664546238,
    301075827032876239,
    17612447688858836480,
    12312230394186135662,
]
PINNED_DIGESTS = (
    1245731786879778688465806797157228018689431747061803007773540899115885872656,
    7314555913787019909445607772553282986968213136184795048266378135190771079370,
)


def test_test_rng_stream_pinned():
    """First u64s of the deterministic RNG, frozen (regression guard; an
    arkworks-sourced vector should replace the pin when available)."""
    from simpleworks_tpu.utils.rng import test_rng

    rng = test_rng()
    stream = [rng.next_u64() for _ in range(4)]
    assert stream == PINNED_RNG_U64, stream


def test_hash_digests_pinned():
    from simpleworks_tpu.hash.pedersen import pedersen_hash
    from simpleworks_tpu.hash.poseidon import poseidon2_hash

    d1 = pedersen_hash(b"\x01\x02\x03")
    d2 = poseidon2_hash(b"\x01\x02\x03")
    assert (d1, d2) == PINNED_DIGESTS, (d1, d2)


# -------------------- arkworks 0.3 CanonicalSerialize layout contracts --------


def test_g1_compressed_layout():
    """SW compressed: x as 48 LE bytes with 2 flag bits in the top byte —
    0x80 = y is lexicographically largest, 0x40 = infinity (arkworks 0.3
    SWFlags; consumed by src/marlin/serialization.rs)."""
    from simpleworks_tpu.curves.bls12_377 import G1Point
    from simpleworks_tpu.fields.bls12_377 import FQ_MODULUS, Fq

    inf = G1Point.identity().serialize_compressed()
    assert len(inf) == 48
    assert inf[-1] == 0x40 and all(b == 0 for b in inf[:-1])

    g = G1Point.generator()
    enc = g.serialize_compressed()
    assert len(enc) == 48
    x, y = g.to_affine()
    x_bytes = bytearray(Fq(x).serialize())
    flag = 0x80 if y > (FQ_MODULUS - y) % FQ_MODULUS else 0
    x_bytes[-1] |= flag
    assert enc == bytes(x_bytes)
    assert G1Point.deserialize_compressed(enc) == g
    # negation flips exactly the sign flag
    assert G1Point.deserialize_compressed(g.neg().serialize_compressed()) == g.neg()
    assert (g.neg().serialize_compressed()[-1] ^ enc[-1]) == 0x80


def test_g2_and_edwards_compressed_roundtrip():
    from simpleworks_tpu.curves.bls12_377 import G2Point
    from simpleworks_tpu.curves.edwards import GENERATOR, EdwardsPoint

    g2 = G2Point.generator().scalar_mul(7)
    enc = g2.serialize_compressed()
    assert len(enc) == 96  # Fq2 = 2 x 48 LE bytes, flags in the top byte
    assert G2Point.deserialize_compressed(enc) == g2

    e = GENERATOR.scalar_mul(11)
    enc = e.serialize_compressed()
    assert len(enc) == 32  # TE compressed: x with the y-sign bit on top
    assert EdwardsPoint.deserialize_compressed(enc) == e
    ident = EdwardsPoint.identity().serialize_compressed()
    assert ident == bytes(32)  # (0, 1): x = 0, y not greatest


def test_serde_length_prefixes_are_u64_le():
    """Container formats use 8-byte LE length prefixes (arkworks' u64
    convention) — checked on a proving-key round-trip elsewhere; here the
    raw layout of the first field of serialize_proving_key."""
    import struct

    from simpleworks_tpu import marlin
    from simpleworks_tpu.examples import test_circuit
    from simpleworks_tpu.marlin.serialization import (
        deserialize_proving_key,
        serialize_proving_key,
    )

    cs = test_circuit.synthesize(3, 3)
    srs = marlin.universal_setup(100, 25, 300, marlin.generate_rand())
    pk, _vk = marlin.index(srs, cs)
    blob = serialize_proving_key(pk)
    (vk_len,) = struct.unpack_from("<Q", blob, 0)
    assert 0 < vk_len < len(blob)
    pk2 = deserialize_proving_key(blob)
    assert pk2.vk.info.domain_h_size == pk.vk.info.domain_h_size
