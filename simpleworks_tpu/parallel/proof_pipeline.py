"""Pipelined proving of independent circuits (the PP-analogue axis,
SURVEY.md §2.4 'Prover-round pipeline': independent proofs in flight).

Circuit synthesis (pure Python, GIL-bound) and proving (native/C++ and
device kernels that release the GIL) overlap across a thread pool —
the simple-payments multi-transaction stream is the oracle workload."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable

from .. import marlin


def prove_stream(
    pk,
    synthesize_fns: Iterable[Callable[[], object]],
    max_workers: int = 2,
) -> list:
    """Prove a stream of circuits against one proving key.

    ``synthesize_fns``: callables returning a synthesized ConstraintSystem.
    Returns proofs in input order.
    """
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        cs_futures = [pool.submit(fn) for fn in synthesize_fns]
        proof_futures = []
        for fut in cs_futures:
            cs = fut.result()
            proof_futures.append(pool.submit(marlin.prove, pk, cs))
        return [f.result() for f in proof_futures]
