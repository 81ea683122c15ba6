"""Reference-scale workloads (run explicitly: ``pytest -m fullscale``).

These use the exact reference parameters — SRS(100_000, 25_000, 300_000),
Pedersen windows 4×144 / 4×128 — and take minutes even with the native
runtime; they are the TPU benchmark configurations (BASELINE.md)."""

import pytest

from simpleworks_tpu.merkle.simple_merkle_tree import SimpleMerkleTree

pytestmark = [pytest.mark.slow, pytest.mark.fullscale]


def test_simple_merkle_tree_reference_scale():
    """reference src/merkle_tree/simple_merkle_tree.rs:276-292 at the real
    scale: 8 leaves, height 4, SRS(100k, 25k, 300k)."""
    tree = SimpleMerkleTree([1, 2, 3, 10, 9, 17, 70, 45])
    path = tree.get_merkle_path(4)
    proof_bytes = tree.prove(9, path)
    assert tree.verify(proof_bytes, 9)
    assert not tree.verify(proof_bytes, 8)


def test_schnorr_marlin_reference_scale():
    """reference examples/schnorr-signature/main.rs:177-209: full Marlin
    prove/verify over the Schnorr verification circuit,
    SRS(100k, 25k, 300k), empty public inputs."""
    from simpleworks_tpu import marlin
    from simpleworks_tpu.examples.schnorr_circuit import synthesize
    from simpleworks_tpu.schnorr import schnorr
    from simpleworks_tpu.utils.rng import test_rng

    rng = test_rng()
    params = schnorr.setup(rng)
    pk_s, sk = schnorr.keygen(params, rng)
    message = b"a message to sign"
    sig = schnorr.sign(params, sk, message, rng)
    cs = synthesize(params, pk_s, message, sig)
    assert cs.is_satisfied()

    srs = marlin.universal_setup(100_000, 25_000, 300_000, marlin.generate_rand())
    pk, vk = marlin.index(srs, cs)
    proof = marlin.prove(pk, cs)
    assert marlin.verify(vk, [], proof)


def test_simple_payments_proven_transaction_reference_scale():
    """The reference's headline path (examples/simple-payments/
    transaction.rs:89-139): Transaction::validate with the FULL Marlin leg —
    fresh SRS(100k, 25k, 300k) + index + prove + verify per transaction,
    plus the native Schnorr verify — exercised end-to-end through
    State.apply_transaction (ledger.rs:176-193)."""
    from simpleworks_tpu.examples.simple_payments.ledger import Parameters, State
    from simpleworks_tpu.examples.simple_payments.transaction import Transaction
    from simpleworks_tpu.utils.rng import test_rng

    rng = test_rng()
    pp = Parameters.sample(rng, prove_transactions=True)
    state = State(4, pp)
    alice, _alice_pk, alice_sk = state.sample_keys_and_register(pp, rng)
    bob, _bob_pk, _bob_sk = state.sample_keys_and_register(pp, rng)
    state.update_balance(alice, 50)

    tx = Transaction.create(pp, alice, bob, 20, alice_sk, rng)
    assert state.apply_transaction(pp, tx, rng)
    assert state.id_to_account_info[alice].balance == 30
    assert state.id_to_account_info[bob].balance == 20

    # invalid: overdraw fails validation WITHOUT minting a proof of a false
    # statement (balance check is native, reference transaction.rs:181)
    bad = Transaction.create(pp, alice, bob, 1000, alice_sk, rng)
    assert state.apply_transaction(pp, bad, rng) is None


def test_validate_block_proven_reference_scale():
    """Block-level PROVEN validation (VERDICT r3 #7): the DP axis
    (satisfiability batch) composed with the PP axis (pipelined Marlin
    proves) on the reference's flagship workload — per-tx proof bytes
    match the sequential index+prove path, and a bad-signature tx gets no
    proof (reference examples/simple-payments/ledger.rs:176-193,
    transaction.rs:89-139)."""
    from simpleworks_tpu import marlin
    from simpleworks_tpu.examples.simple_payments.account import AccountId
    from simpleworks_tpu.examples.simple_payments.ledger import Parameters, State
    from simpleworks_tpu.examples.simple_payments.transaction import Transaction
    from simpleworks_tpu.examples.schnorr_circuit import (
        SimpleSchnorrSignatureVerification,
    )
    from simpleworks_tpu.fields.bls12_377 import ConstraintF
    from simpleworks_tpu.marlin.serialization import serialize_proof
    from simpleworks_tpu.r1cs.constraint_system import ConstraintSystem
    from simpleworks_tpu.utils.rng import test_rng

    rng = test_rng()
    pp = Parameters.sample(rng, prove_transactions=True)
    state = State(8, pp)
    _, _apk, ask = state.sample_keys_and_register(pp, rng)
    _, _bpk, bsk = state.sample_keys_and_register(pp, rng)
    state.update_balance(AccountId(1), 10)

    good = Transaction.create(pp, AccountId(1), AccountId(2), 5, ask, rng)
    good2 = Transaction.create(pp, AccountId(1), AccountId(2), 3, ask, rng)
    bad_sig = Transaction.create(pp, AccountId(1), AccountId(2), 5, bsk, rng)

    verdicts, proofs = state.validate_block(
        pp, [good, bad_sig, good2], prove=True
    )
    assert verdicts == [True, False, True]
    assert proofs[1] is None
    assert proofs[0] is not None and proofs[2] is not None

    # per-tx proof bytes match the sequential path (same srs memo, same
    # deterministic per-proof zk rng)
    srs = marlin.universal_setup(*pp.srs_scale, test_rng())
    for tx, proof_bytes in ((good, proofs[0]), (good2, proofs[2])):
        sender = state.id_to_account_info[tx.sender]
        cs = ConstraintSystem(ConstraintF)
        SimpleSchnorrSignatureVerification(
            parameters=pp.sig_params,
            public_key=sender.public_key,
            message=Transaction._message(tx.sender, tx.recipient, tx.amount),
            signature=tx.signature,
        ).generate_constraints(cs)
        pk, _vk = marlin.index(srs, cs)
        assert serialize_proof(marlin.prove(pk, cs)) == proof_bytes
