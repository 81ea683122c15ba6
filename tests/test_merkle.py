"""Merkle tree + membership circuit tests (reference
examples/merkle-tree/main.rs:102-207 correctness/soundness pairs and
src/merkle_tree tests)."""

import pytest

from simpleworks_tpu.hash.pedersen import (
    LEAF_WINDOW,
    TWO_TO_ONE_WINDOW,
    pedersen_setup,
)
from simpleworks_tpu.merkle.circuit import (
    MerkleTreeVerificationU8,
    public_inputs_for_verify,
    synthesize,
)
from simpleworks_tpu.merkle.tree import MerkleTree, merkle_tree_height
from simpleworks_tpu.utils.rng import test_rng

LEAVES = [1, 2, 3, 10, 9, 17, 70, 45]  # the reference's test leaves


@pytest.fixture(scope="module")
def params():
    rng = test_rng()
    leaf_params = pedersen_setup(LEAF_WINDOW, rng)
    two_params = pedersen_setup(TWO_TO_ONE_WINDOW, rng)
    return leaf_params, two_params


@pytest.fixture(scope="module")
def tree(params):
    leaf_params, two_params = params
    return MerkleTree.new(leaf_params, two_params, [bytes([v]) for v in LEAVES])


def test_height_rule():
    assert merkle_tree_height(8) == 4
    assert merkle_tree_height(32) == 6


def test_tree_shape(tree):
    assert tree.height == 4
    assert len(tree.levels[0]) == 8


def test_path_verifies_natively(tree, params):
    leaf_params, two_params = params
    for i, leaf in enumerate(LEAVES):
        path = tree.generate_proof(i)
        assert path.verify(leaf_params, two_params, tree.root(), bytes([leaf]))


def test_path_rejects_wrong_leaf(tree, params):
    leaf_params, two_params = params
    path = tree.generate_proof(4)
    assert not path.verify(leaf_params, two_params, tree.root(), bytes([99]))


def test_update_changes_root(tree, params):
    leaf_params, two_params = params
    tree2 = MerkleTree.new(leaf_params, two_params, [bytes([v]) for v in LEAVES])
    old_root = tree2.root()
    tree2.update(0, bytes([4]))
    assert tree2.root() != old_root
    # equals a freshly built tree with the mutated leaf
    mutated = [4] + LEAVES[1:]
    tree3 = MerkleTree.new(leaf_params, two_params, [bytes([v]) for v in mutated])
    assert tree2.root() == tree3.root()
    path = tree2.generate_proof(0)
    assert path.verify(leaf_params, two_params, tree2.root(), bytes([4]))


def test_blank_tree_shape(params):
    leaf_params, two_params = params
    blank = MerkleTree.blank(leaf_params, two_params, 4)
    assert blank.height == 4
    blank.generate_proof(0)


def test_merkle_circuit_correctness(tree, params):
    """reference merkle-tree/main.rs:102-150: valid membership satisfies."""
    leaf_params, two_params = params
    path = tree.generate_proof(4)
    cs = synthesize(leaf_params, two_params, tree.root(), 9, path)
    assert cs.is_satisfied(), cs.which_is_unsatisfied()
    # public input layout: [one, root, 8 leaf bits]
    assert cs.instance_assignment[1:] == public_inputs_for_verify(tree.root(), 9)


def test_merkle_circuit_soundness(tree, params):
    """reference merkle-tree/main.rs:155-207: wrong root must not satisfy."""
    leaf_params, two_params = params
    mutated = [4] + LEAVES[1:]
    second = MerkleTree.new(leaf_params, two_params, [bytes([v]) for v in mutated])
    path = tree.generate_proof(4)
    cs = synthesize(leaf_params, two_params, second.root(), 9, path)
    assert not cs.is_satisfied()
