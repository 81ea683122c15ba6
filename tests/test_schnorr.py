"""Schnorr tests: native sign/verify (reference
examples/schnorr-signature/main.rs:79-101), in-circuit verify pass/fail
(main.rs:104-174), and Blake2s gadget == native (the RO cross-check)."""

import pytest

from simpleworks_tpu.curves.edwards import COEFF_D
from simpleworks_tpu.fields.bls12_377 import ConstraintF, Fr
from simpleworks_tpu.gadgets import Boolean, UInt8Gadget
from simpleworks_tpu.hash.blake2s import blake2s_digest
from simpleworks_tpu.r1cs.constraint_system import ConstraintSystem
from simpleworks_tpu.schnorr import schnorr
from simpleworks_tpu.schnorr.blake2s_gadget import blake2s_gadget
from simpleworks_tpu.schnorr.gadget import (
    ParametersVar,
    PublicKeyVar,
    SignatureVar,
    schnorr_verify_gadget,
)
from simpleworks_tpu.utils.rng import test_rng

MESSAGE = b"a message for signing"


def new_cs():
    return ConstraintSystem(ConstraintF)


def test_edwards_d_is_nonsquare():
    # completeness precondition for the affine addition formulas
    assert Fr(COEFF_D).legendre() == -1
    assert Fr(Fr.PARAMS.modulus - 1).legendre() == 1  # a = -1 is a square


@pytest.fixture(scope="module")
def keypair():
    rng = test_rng()
    params = schnorr.setup(rng)
    pk, sk = schnorr.keygen(params, rng)
    return params, pk, sk, rng


def test_native_sign_verify(keypair):
    params, pk, sk, rng = keypair
    sig = schnorr.sign(params, sk, MESSAGE, rng)
    assert schnorr.verify(params, pk, MESSAGE, sig)
    assert not schnorr.verify(params, pk, b"another message", sig)


def test_native_sign_deterministic_with_fixed_rng():
    rng1, rng2 = test_rng(), test_rng()
    params = schnorr.setup()
    pk1, sk1 = schnorr.keygen(params, rng1)
    pk2, sk2 = schnorr.keygen(params, rng2)
    assert pk1 == pk2 and sk1.secret_key == sk2.secret_key
    sig1 = schnorr.sign(params, sk1, MESSAGE, rng1)
    sig2 = schnorr.sign(params, sk2, MESSAGE, rng2)
    assert sig1 == sig2


@pytest.mark.parametrize("data", [b"", b"abc", bytes(64), bytes(range(100))])
def test_blake2s_gadget_equals_native(data):
    cs = new_cs()
    input_gadgets = [UInt8Gadget.new_witness(cs, b) for b in data]
    out = blake2s_gadget(cs, input_gadgets)
    got = bytes(b.value() for b in out)
    assert got == blake2s_digest(data)
    assert cs.is_satisfied()


def test_schnorr_gadget_verifies(keypair):
    params, pk, sk, rng = keypair
    sig = schnorr.sign(params, sk, MESSAGE, rng)
    assert schnorr.verify(params, pk, MESSAGE, sig)

    cs = new_cs()
    params_var = ParametersVar.new_constant(cs, params)
    pk_var = PublicKeyVar.new_witness(cs, pk)
    msg_var = [UInt8Gadget.new_witness(cs, b) for b in MESSAGE]
    sig_var = SignatureVar.new_witness(cs, sig)
    ok = schnorr_verify_gadget(cs, params_var, pk_var, msg_var, sig_var)
    assert ok.value() is True
    ok.enforce_equal(Boolean.constant(True, cs))
    assert cs.is_satisfied(), cs.which_is_unsatisfied()


def test_schnorr_gadget_rejects_wrong_message(keypair):
    """reference schnorr-signature/main.rs:140-174."""
    params, pk, sk, rng = keypair
    sig = schnorr.sign(params, sk, MESSAGE, rng)
    cs = new_cs()
    params_var = ParametersVar.new_constant(cs, params)
    pk_var = PublicKeyVar.new_witness(cs, pk)
    bad_msg = [UInt8Gadget.new_witness(cs, b) for b in b"a different message!!"]
    sig_var = SignatureVar.new_witness(cs, sig)
    ok = schnorr_verify_gadget(cs, params_var, pk_var, bad_msg, sig_var)
    assert ok.value() is False
    ok.enforce_equal(Boolean.constant(True, cs))
    assert not cs.is_satisfied()
