"""Marlin prove/verify round-trips at the reference's small SRS scale
(SURVEY.md §4 pattern 3: examples/test-circuit.rs:71-81 with
universal_setup(100, 25, 300))."""

import pytest

from simpleworks_tpu import marlin
from simpleworks_tpu.examples import manual_constraints, test_circuit


@pytest.fixture(scope="module")
def srs():
    return marlin.universal_setup(100, 25, 300, marlin.generate_rand())


def test_srs_shape(srs):
    # n = 128, m = 512 → degree max(3·128−1, 3·512−3) = 1533 (the row_col
    # linearization caps the inner sumcheck at 3m−3, halving the SRS)
    assert srs.max_degree == 1533
    assert len(srs.powers_of_g) == 1534


def test_marlin_round_trip_manual_constraints(srs):
    cs = manual_constraints.synthesize(3, 3)
    pk, vk = marlin.index(srs, cs)
    proof = marlin.prove(pk, cs)
    assert marlin.verify(vk, [3], proof)


def test_marlin_rejects_wrong_public_input(srs):
    cs = manual_constraints.synthesize(3, 3)
    pk, vk = marlin.index(srs, cs)
    proof = marlin.prove(pk, cs)
    assert not marlin.verify(vk, [4], proof)


def test_marlin_round_trip_test_circuit(srs):
    cs = test_circuit.synthesize(1, 1)
    pk, vk = marlin.index(srs, cs)
    proof = marlin.prove(pk, cs)
    assert marlin.verify(vk, [], proof)


def test_marlin_prove_rejects_unsatisfied(srs):
    cs = test_circuit.synthesize(1, 2)
    pk, vk = marlin.index(srs, cs)
    with pytest.raises(ValueError, match="unsatisfied"):
        marlin.prove(pk, cs)


def test_marlin_rejects_tampered_proof(srs):
    cs = manual_constraints.synthesize(5, 5)
    pk, vk = marlin.index(srs, cs)
    proof = marlin.prove(pk, cs)
    # corrupt one evaluation
    proof.evaluations["z_a"] = (proof.evaluations["z_a"] + 1) % marlin.P
    assert not marlin.verify(vk, [5], proof)


def test_marlin_rejects_swapped_commitment(srs):
    cs = manual_constraints.synthesize(7, 7)
    pk, vk = marlin.index(srs, cs)
    proof = marlin.prove(pk, cs)
    proof.commitments["z_a"], proof.commitments["z_b"] = (
        proof.commitments["z_b"],
        proof.commitments["z_a"],
    )
    assert not marlin.verify(vk, [7], proof)


def test_marlin_proof_deterministic(srs):
    cs = manual_constraints.synthesize(9, 9)
    pk, vk = marlin.index(srs, cs)
    p1 = marlin.prove(pk, cs)
    p2 = marlin.prove(pk, cs)
    assert p1.evaluations == p2.evaluations
    assert p1.pc_proof_beta == p2.pc_proof_beta


# ---------------------------------------------------------------- zk layer ----


def test_marlin_zero_knowledge_hiding(srs):
    """Proofs with different prover randomness differ everywhere the witness
    could leak (commitments, openings) yet both verify; the mask/blinding
    values are bound by the pairing check."""
    from simpleworks_tpu.marlin.serialization import serialize_proof
    from simpleworks_tpu.utils.rng import chacha12_rng

    cs = manual_constraints.synthesize(4, 4)
    pk, vk = marlin.index(srs, cs)
    p1 = marlin.prove(pk, cs, chacha12_rng(b"A" * 32))
    p2 = marlin.prove(pk, cs, chacha12_rng(b"B" * 32))
    assert serialize_proof(p1) != serialize_proof(p2)
    # hiding: the commitment to the SAME witness polynomial differs
    assert p1.commitments["w"].serialize() != p2.commitments["w"].serialize()
    # v_H-randomization: the opened evaluations differ too
    assert p1.evaluations["w"] != p2.evaluations["w"]
    assert p1.evaluations["z_a"] != p2.evaluations["z_a"]
    assert marlin.verify(vk, [4], p1)
    assert marlin.verify(vk, [4], p2)


def test_marlin_rejects_tampered_blinding(srs):
    cs = manual_constraints.synthesize(6, 6)
    pk, vk = marlin.index(srs, cs)
    proof = marlin.prove(pk, cs)
    proof.pc_rand_beta = (proof.pc_rand_beta + 1) % marlin.P
    assert not marlin.verify(vk, [6], proof)


def test_marlin_rejects_tampered_mask(srs):
    cs = manual_constraints.synthesize(8, 8)
    pk, vk = marlin.index(srs, cs)
    proof = marlin.prove(pk, cs)
    proof.evaluations["mask"] = (proof.evaluations["mask"] + 1) % marlin.P
    assert not marlin.verify(vk, [8], proof)


def test_srs_memo_is_transparent():
    """setup() memoizes on the drawn (max_degree, tau, gamma): the rng is
    advanced identically on hit and miss, and identical rng states yield
    the identical SRS object without recomputing the powers table."""
    from simpleworks_tpu.kzg import kzg10
    from simpleworks_tpu.utils.rng import test_rng

    r1, r2 = test_rng(), test_rng()
    s1 = kzg10.setup(50, r1)
    s2 = kzg10.setup(50, r2)
    assert s1 is s2  # cache hit
    assert r1.next_u64() == r2.next_u64()  # streams advanced identically
    # a different rng state gives a different tau -> distinct SRS
    r3 = test_rng()
    r3.next_u64()
    s3 = kzg10.setup(50, r3)
    assert s3 is not s1


def test_srs_disk_cache_roundtrip(tmp_path, monkeypatch):
    """The disk checkpoint of the powers table reproduces an identical SRS
    in a fresh process (simulated by clearing the in-process memo)."""
    import numpy as np

    from simpleworks_tpu.kzg import kzg10
    from simpleworks_tpu.poly.dense import DensePoly
    from simpleworks_tpu.utils.rng import test_rng

    monkeypatch.setenv("SWTPU_SRS_CACHE_DIR", str(tmp_path))
    s1 = kzg10.setup(60, test_rng())
    if s1.powers_native is None:
        pytest.skip("native runtime not built — disk cache covers the native layout")
    assert any(f.name.startswith("srs_") for f in tmp_path.iterdir())
    kzg10._SRS_MEMO.clear()
    s2 = kzg10.setup(60, test_rng())
    assert s2 is not s1
    assert np.array_equal(s2.powers_native, s1.powers_native)
    assert (s2.h, s2.beta_h) == (s1.h, s1.beta_h)
    assert s2.powers_of_gamma_g == s1.powers_of_gamma_g
    p = DensePoly([5, 7, 11])
    assert kzg10.commit(s1, p).comm == kzg10.commit(s2, p).comm
    kzg10._SRS_MEMO.clear()


def test_index_memo_same_structure_different_witness():
    """index() memoizes on matrix content: two circuits with identical
    structure but different witness values share keys (the ledger's
    per-transaction pattern); a different structure misses."""
    from simpleworks_tpu import marlin as m

    srs = m.universal_setup(100, 25, 300, m.generate_rand())
    m._INDEX_MEMO.clear()
    pk1, vk1 = m.index(srs, manual_constraints.synthesize(3, 3))
    pk2, vk2 = m.index(srs, manual_constraints.synthesize(9, 9))
    assert pk1 is pk2 and vk1 is vk2  # same matrices -> cache hit
    cs3 = test_circuit.synthesize(1, 1)
    pk3, _ = m.index(srs, cs3)
    assert pk3 is not pk1
    # cached keys still prove/verify the *new* witness
    proof = m.prove(pk2, manual_constraints.synthesize(9, 9))
    assert m.verify(vk2, [9], proof)
    m._INDEX_MEMO.clear()


def test_pk_disk_cache_roundtrip(tmp_path, monkeypatch):
    """The index disk checkpoint reproduces equivalent pk/vk in a fresh
    process (simulated by clearing the in-process memo): identical vk
    bytes, identical index polynomials, and a proof from the reloaded pk
    verifies against the originally-computed vk (VERDICT r4 #3)."""
    import numpy as np

    from simpleworks_tpu import marlin as m
    from simpleworks_tpu.marlin.serialization import serialize_verifying_key

    monkeypatch.setenv("SWTPU_PK_CACHE_DIR", str(tmp_path))
    srs = m.universal_setup(100, 25, 300, m.generate_rand())
    m._INDEX_MEMO.clear()
    cs = manual_constraints.synthesize(3, 3)
    pk1, vk1 = m.index(srs, cs)
    assert any(f.name.startswith("pk_") for f in tmp_path.iterdir())
    m._INDEX_MEMO.clear()
    pk2, vk2 = m.index(srs, manual_constraints.synthesize(3, 3))
    assert pk2 is not pk1  # reloaded from disk, not the memo
    assert serialize_verifying_key(vk2) == serialize_verifying_key(vk1)
    for m1, m2 in zip(pk1.index.matrices, pk2.index.matrices):
        assert np.array_equal(m1.row_poly.vec.a, m2.row_poly.vec.a)
        assert np.array_equal(m1.col_poly.vec.a, m2.col_poly.vec.a)
        assert np.array_equal(m1.val_poly.vec.a, m2.val_poly.vec.a)
        assert np.array_equal(m1.row_evals.a, m2.row_evals.a)
        assert np.array_equal(m1.val_evals.a, m2.val_evals.a)
    proof = m.prove(pk2, manual_constraints.synthesize(3, 3))
    assert m.verify(vk1, [3], proof)
    m._INDEX_MEMO.clear()


def test_index_row_col_vocabulary(srs):
    """ark-marlin 0.3's 12-poly index vocabulary (VERDICT r4 #6): row_col
    interpolates row·col on K (committed + opened), the vk carries 12
    index commitments, and b̂(γ) built linearly from the openings equals
    the verifier's inner-sumcheck denominators."""
    import numpy as np

    from simpleworks_tpu import marlin as m
    from simpleworks_tpu.marlin import INDEX_POLYS

    assert len(INDEX_POLYS) == 12
    cs = manual_constraints.synthesize(3, 3)
    pk, vk = m.index(srs, cs)
    assert set(vk.index_commitments) == set(INDEX_POLYS)
    for mat in pk.index.matrices:
        assert np.array_equal(
            mat.row_col_evals.a, (mat.row_evals * mat.col_evals).a
        )
        # the linearization is a genuine degree reduction: row_col as a
        # polynomial has degree < m, while the literal product would not
        assert mat.row_col_poly.degree() < pk.index.info.domain_k_size
    proof = m.prove(pk, cs)
    for name in ("row_col_a", "row_col_b", "row_col_c"):
        assert name in proof.evaluations
    assert m.verify(vk, [3], proof)
