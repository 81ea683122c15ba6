"""SimpleMerkleTree: the self-proving tree (reference
src/merkle_tree/simple_merkle_tree.rs tests).

The fast tests use a reduced Pedersen leaf window + small SRS so the *full*
pipeline (tree → membership circuit → Marlin prove → serialize → verify)
runs on CPU; the reference-scale windows/SRS run under ``-m slow`` and in
the TPU benchmark."""

import pytest

from simpleworks_tpu.hash.pedersen import PedersenWindow
from simpleworks_tpu.merkle.simple_merkle_tree import (
    SimpleMerkleTree,
    check_leave_exists_u8,
)

#: 2-byte-capacity leaf window + the (mandatory) 512-bit two-to-one window
TINY_LEAF_WINDOW = PedersenWindow(window_size=4, num_windows=4)
TWO_TO_ONE_WINDOW = PedersenWindow(window_size=4, num_windows=128)
SMALL_SCALE = (8_192, 8_192, 40_000)


@pytest.fixture(scope="module")
def tiny_tree():
    return SimpleMerkleTree(
        [1, 2],
        srs_scale=SMALL_SCALE,
        leaf_window=TINY_LEAF_WINDOW,
        two_to_one_window=TWO_TO_ONE_WINDOW,
    )


@pytest.mark.slow
def test_simple_merkle_tree_full_round_trip(tiny_tree):
    """reference simple_merkle_tree.rs:276-292 (merkle_tree_test_proof)."""
    path = tiny_tree.get_merkle_path(0)
    proof_bytes = tiny_tree.prove(1, path)
    assert tiny_tree.verify(proof_bytes, 1)
    # wrong leaf → different public inputs → reject
    assert not tiny_tree.verify(proof_bytes, 2)


@pytest.mark.slow
def test_check_leave_exists(tiny_tree):
    """reference simple_merkle_tree.rs:165-202 satisfiability check."""
    path = tiny_tree.get_merkle_path(1)
    assert check_leave_exists_u8(tiny_tree, 2, path)
    assert not check_leave_exists_u8(tiny_tree, 3, path)
