"""Runnable demo driver for the five reference workloads.

The reference exposes its examples as ``cargo run --example NAME``
(reference README.md:12-16, Cargo.toml:50-60); this module is the
equivalent::

    python -m simpleworks_tpu.examples.run                 # all five, demo scale
    python -m simpleworks_tpu.examples.run merkle-tree     # one workload
    python -m simpleworks_tpu.examples.run --full schnorr-signature

Demo scale keeps every workload CPU-friendly (small SRS, reduced Pedersen
leaf window); ``--full`` switches to the exact reference parameters —
SRS(100_000, 25_000, 300_000), Pedersen windows 4x144 / 4x128
(reference src/merkle_tree/simple_merkle_tree.rs:39, common.rs:16-30) —
which take minutes per proof on CPU (they are the TPU bench shapes).
"""

from __future__ import annotations

import argparse
import sys
import time
from contextlib import contextmanager


@contextmanager
def _step(label: str):
    print(f"  {label} ...", end="", flush=True)
    start = time.perf_counter()
    yield
    print(f" ok ({time.perf_counter() - start:.2f}s)")


def run_test_circuit(full: bool) -> None:
    """reference examples/test-circuit.rs: satisfiability pair + Marlin
    round-trip at SRS(100, 25, 300) (test-circuit.rs:35-81)."""
    from simpleworks_tpu import marlin
    from simpleworks_tpu.examples.test_circuit import synthesize

    with _step("satisfiability (a == b)"):
        assert synthesize(87, 87).is_satisfied()
    with _step("unsatisfiability (a != b)"):
        assert not synthesize(87, 88).is_satisfied()
    cs = synthesize(87, 87)
    with _step("universal_setup(100, 25, 300)"):
        srs = marlin.universal_setup(100, 25, 300, marlin.generate_rand())
    with _step("index + prove + verify"):
        pk, vk = marlin.index(srs, cs)
        proof = marlin.prove(pk, cs)
        assert marlin.verify(vk, [], proof)


def run_manual_constraints(full: bool) -> None:
    """reference examples/manual-constraints.rs: raw R1CS equality circuit,
    public input [number] (manual-constraints.rs:87-100)."""
    from simpleworks_tpu import marlin
    from simpleworks_tpu.examples.manual_constraints import synthesize

    number = 86
    with _step("satisfiability"):
        assert synthesize(number, number).is_satisfied()
    with _step("unsatisfiability"):
        assert not synthesize(number, number + 1).is_satisfied()
    cs = synthesize(number, number)
    with _step("universal_setup(100, 25, 300)"):
        srs = marlin.universal_setup(100, 25, 300, marlin.generate_rand())
    with _step("index + prove + verify(public=[number])"):
        pk, vk = marlin.index(srs, cs)
        proof = marlin.prove(pk, cs)
        assert marlin.verify(vk, [number], proof)


def run_merkle_tree(full: bool) -> None:
    """reference examples/merkle-tree/main.rs: 8-leaf Pedersen tree,
    membership satisfiability pair, then the self-proving tree's full
    Marlin round-trip (main.rs:102-258)."""
    from simpleworks_tpu.hash.pedersen import PedersenWindow
    from simpleworks_tpu.merkle.simple_merkle_tree import (
        SimpleMerkleTree,
        check_leave_exists_u8,
    )

    leaves = [1, 2, 3, 10, 9, 17, 70, 45]
    if full:
        kwargs = {}
    else:
        kwargs = dict(
            srs_scale=(8_192, 8_192, 40_000),
            leaf_window=PedersenWindow(window_size=4, num_windows=4),
            two_to_one_window=PedersenWindow(window_size=4, num_windows=128),
        )
        leaves = [1, 2]
    with _step(f"SimpleMerkleTree({len(leaves)} leaves): SRS + index"):
        tree = SimpleMerkleTree(leaves, **kwargs)
    path = tree.get_merkle_path(0)
    with _step("membership satisfiability (leaf in tree)"):
        assert check_leave_exists_u8(tree, leaves[0], path)
    with _step("membership unsatisfiability (leaf not in tree)"):
        assert not check_leave_exists_u8(tree, 77, path)
    with _step("prove membership (Marlin)"):
        proof_bytes = tree.prove(leaves[0], path)
    with _step(f"verify ({len(proof_bytes)}-byte proof)"):
        assert tree.verify(proof_bytes, leaves[0])
    with _step("reject proof against wrong leaf"):
        assert not tree.verify(proof_bytes, 77)


def run_schnorr_signature(full: bool) -> None:
    """reference examples/schnorr-signature/main.rs: native sign/verify,
    in-circuit satisfiability pair, and (--full) the Marlin round-trip at
    SRS(100k, 25k, 300k) with empty public inputs (main.rs:79-209)."""
    from simpleworks_tpu.examples.schnorr_circuit import synthesize
    from simpleworks_tpu.schnorr import schnorr
    from simpleworks_tpu.utils.rng import test_rng

    rng = test_rng()
    params = schnorr.setup(rng)
    pk_s, sk = schnorr.keygen(params, rng)
    message = b"a message to sign"
    with _step("native sign + verify"):
        sig = schnorr.sign(params, sk, message, rng)
        assert schnorr.verify(params, pk_s, message, sig)
    with _step("native verify rejects wrong message"):
        assert not schnorr.verify(params, pk_s, b"another message", sig)
    with _step("in-circuit verify satisfiability"):
        cs = synthesize(params, pk_s, message, sig)
        assert cs.is_satisfied()
        print(f" [{cs.num_constraints} constraints]", end="")
    with _step("in-circuit unsatisfiability (wrong message)"):
        assert not synthesize(params, pk_s, b"another message", sig).is_satisfied()
    if full:
        from simpleworks_tpu import marlin

        with _step("universal_setup(100k, 25k, 300k)"):
            srs = marlin.universal_setup(
                100_000, 25_000, 300_000, marlin.generate_rand()
            )
        with _step("index + prove + verify (empty public inputs)"):
            pk, vk = marlin.index(srs, cs)
            proof = marlin.prove(pk, cs)
            assert marlin.verify(vk, [], proof)
    else:
        print("  (Marlin round-trip at reference scale: re-run with --full)")


def run_simple_payments(full: bool) -> None:
    """reference examples/simple-payments/ledger.rs:202-250: 32-account
    ledger, register two accounts, one valid + three invalid transactions.
    With --full every validate() runs the reference's per-transaction
    Marlin pipeline (transaction.rs:89-139)."""
    from simpleworks_tpu.examples.simple_payments.account import AccountId
    from simpleworks_tpu.examples.simple_payments.ledger import Parameters, State
    from simpleworks_tpu.examples.simple_payments.transaction import Transaction
    from simpleworks_tpu.utils.rng import test_rng

    rng = test_rng()
    with _step(f"Parameters.sample(prove_transactions={full})"):
        pp = Parameters.sample(rng, prove_transactions=full)
    state = State(32, pp)
    with _step("register alice (balance 10) + bob"):
        alice_id, _apk, alice_sk = state.sample_keys_and_register(pp, rng)
        assert alice_id == AccountId(1)
        assert state.update_balance(alice_id, 10)
        bob_id, _bpk, bob_sk = state.sample_keys_and_register(pp, rng)
    with _step("valid transfer alice->bob of 5"):
        tx = Transaction.create(pp, alice_id, bob_id, 5, alice_sk, rng)
        assert tx.validate(pp, state, rng)
        assert state.apply_transaction(pp, tx, rng)
        assert state.id_to_account_info[alice_id].balance == 5
        assert state.id_to_account_info[bob_id].balance == 5
    with _step("reject overspend (6 > 5)"):
        bad = Transaction.create(pp, alice_id, bob_id, 6, alice_sk, rng)
        assert not bad.validate(pp, state, rng)
    with _step("reject wrong signature (signed with bob's key)"):
        forged = Transaction.create(pp, alice_id, bob_id, 5, bob_sk, rng)
        assert not forged.validate(pp, state, rng)
    with _step("reject unknown recipient"):
        ghost = Transaction.create(pp, alice_id, AccountId(10), 5, alice_sk, rng)
        assert not ghost.validate(pp, state, rng)


def run_proof_pipeline(full: bool) -> None:
    """The PP axis demo (SURVEY.md §2.4 'Prover-round pipeline'): a stream
    of independent circuits proven against one key with Python synthesis
    pipelined against native/device proving; prints the measured overlap."""
    from simpleworks_tpu import marlin
    from simpleworks_tpu.examples.manual_constraints import synthesize
    from simpleworks_tpu.parallel.proof_pipeline import prove_stream

    values = list(range(3, 11)) if full else [3, 5, 8, 13]
    with _step("universal_setup + index"):
        srs = marlin.universal_setup(100, 25, 300, marlin.generate_rand())
        pk, vk = marlin.index(srs, synthesize(3, 3))
    with _step(f"pipelined prove x{len(values)}"):
        fns = [lambda v=v: synthesize(v, v) for v in values]
        proofs, stats = prove_stream(pk, fns, with_stats=True)
    with _step("verify all"):
        for v, proof in zip(values, proofs):
            assert marlin.verify(vk, [v], proof)
    print(
        f"  stats: wall={stats.wall_seconds:.2f}s synth-busy="
        f"{stats.synth_busy_seconds:.2f}s prove-busy={stats.prove_busy_seconds:.2f}s "
        f"overlap={stats.overlap_seconds:.2f}s pipeline-speedup={stats.speedup:.2f}x"
    )


WORKLOADS = {
    "test-circuit": run_test_circuit,
    "manual-constraints": run_manual_constraints,
    "merkle-tree": run_merkle_tree,
    "schnorr-signature": run_schnorr_signature,
    "simple-payments": run_simple_payments,
    "proof-pipeline": run_proof_pipeline,
}


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m simpleworks_tpu.examples.run",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument(
        "workloads",
        nargs="*",
        metavar="WORKLOAD",
        help=f"workloads to run (default: all): {', '.join(WORKLOADS)}",
    )
    parser.add_argument(
        "--full",
        action="store_true",
        help="use the exact reference parameters (minutes per proof on CPU)",
    )
    args = parser.parse_args(argv)
    for name in args.workloads:
        if name not in WORKLOADS:
            parser.error(
                f"unknown workload {name!r} (choose from {', '.join(WORKLOADS)})"
            )
    names = args.workloads or list(WORKLOADS)
    for name in names:
        print(f"[{name}]")
        start = time.perf_counter()
        WORKLOADS[name](args.full)
        print(f"  done in {time.perf_counter() - start:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
