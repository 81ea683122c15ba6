"""Prover pipeline — the PP-analogue axis (SURVEY.md §2.4 'Prover-round
pipeline': independent proofs in flight; oracle workload = the
simple-payments multi-transaction stream, reference
examples/simple-payments/ledger.rs:202-250).

Architecture: a two-stage stage-queue pipeline with dedicated workers.

* **synth** — circuit synthesis, pure Python and GIL-bound
  (reference analogue: ``circuit.generate_constraints`` inside
  ``MarlinInst::prove``, SURVEY.md §3.2).
* **prove** — the 3-round AHP + KZG commits/openings.  Its hot loops run
  in the native C++ runtime and the device kernels, both of which release
  the GIL, so this stage overlaps *genuinely* with the next item's
  Python synthesis on the same interpreter.

Items flow synth-queue → prove-queue → ordered results; ``max_in_flight``
bounds synthesized-but-unproven circuits (a 100k-constraint system holds
full witness + matrices — memory, not latency, is the binding constraint).
``PipelineStats`` records per-stage busy time and the overlap actually
achieved, so the speedup claim is measured rather than asserted.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional

from .. import marlin

_POLL_S = 0.05


@dataclass
class PipelineStats:
    """Wall-clock accounting of one ``prove_stream`` run."""

    wall_seconds: float = 0.0
    synth_busy_seconds: float = 0.0
    prove_busy_seconds: float = 0.0
    items: int = 0
    stage_wall: dict = field(default_factory=dict)

    @property
    def overlap_seconds(self) -> float:
        """Time both stages were busy simultaneously (the pipelining win):
        busy-sum minus wall, clamped at 0."""
        return max(0.0, self.synth_busy_seconds + self.prove_busy_seconds - self.wall_seconds)

    @property
    def serial_estimate_seconds(self) -> float:
        return self.synth_busy_seconds + self.prove_busy_seconds

    @property
    def speedup(self) -> float:
        if self.wall_seconds <= 0:
            return 1.0
        return self.serial_estimate_seconds / self.wall_seconds


def _put(q: queue.Queue, item, abort: threading.Event) -> bool:
    while not abort.is_set():
        try:
            q.put(item, timeout=_POLL_S)
            return True
        except queue.Full:
            continue
    return False


def _get(q: queue.Queue, abort: threading.Event):
    """-> (ok, item); ok=False means the pipeline aborted."""
    while not abort.is_set():
        try:
            return True, q.get(timeout=_POLL_S)
        except queue.Empty:
            continue
    return False, None


class _StageWorker(threading.Thread):
    """Pull (index, payload) from ``inbox``, apply ``fn``, push to ``outbox``.
    ``None`` is the shutdown sentinel (forwarded downstream).  The first
    exception sets ``abort`` and is re-raised by the caller."""

    def __init__(self, name, fn, inbox, outbox, errors, abort):
        super().__init__(name=f"proof-pipeline-{name}", daemon=True)
        self.fn = fn
        self.inbox = inbox
        self.outbox = outbox
        self.errors = errors
        self.abort = abort
        self.busy_seconds = 0.0

    def run(self):
        while True:
            ok, item = _get(self.inbox, self.abort)
            if not ok:
                return
            if item is None:
                _put(self.outbox, None, self.abort)
                return
            idx, payload = item
            t0 = time.perf_counter()
            try:
                result = self.fn(payload)
            except BaseException as exc:  # noqa: BLE001 — surfaced to caller
                self.errors.append(exc)
                self.abort.set()
                return
            finally:
                self.busy_seconds += time.perf_counter() - t0
            if not _put(self.outbox, (idx, result), self.abort):
                return


def run_pipeline(
    items: Iterable,
    stages: list[tuple[str, Callable]],
    max_in_flight: int = 3,
) -> tuple[list, PipelineStats]:
    """Run ``items`` through ``stages`` (name, fn) with one worker per stage
    and bounded queues.  Returns (results in input order, stats).  The first
    stage exception aborts the whole pipeline and is re-raised."""
    items = list(items)
    stats = PipelineStats(items=len(items))
    if not items:
        return [], stats
    errors: list[BaseException] = []
    abort = threading.Event()
    queues = [queue.Queue(maxsize=max_in_flight) for _ in range(len(stages) + 1)]
    workers = [
        _StageWorker(name, fn, queues[i], queues[i + 1], errors, abort)
        for i, (name, fn) in enumerate(stages)
    ]
    t0 = time.perf_counter()
    for w in workers:
        w.start()

    def feed():
        for i, item in enumerate(items):
            if not _put(queues[0], (i, item), abort):
                return
        _put(queues[0], None, abort)

    feeder = threading.Thread(target=feed, daemon=True)
    feeder.start()

    results: list = [None] * len(items)
    done = 0
    while done < len(items):
        ok, item = _get(queues[-1], abort)
        if not ok or item is None:
            break
        idx, result = item
        results[idx] = result
        done += 1
    abort_was_clean = done == len(items)
    if abort_was_clean:
        abort.set()  # release any worker blocked on a sentinel put
    feeder.join()
    for w in workers:
        w.join(timeout=30.0)
    stats.wall_seconds = time.perf_counter() - t0
    for (name, _fn), w in zip(stages, workers):
        stats.stage_wall[name] = w.busy_seconds
    if len(stages) >= 2:
        stats.synth_busy_seconds = workers[0].busy_seconds
        stats.prove_busy_seconds = sum(w.busy_seconds for w in workers[1:])
    if errors:
        raise errors[0]
    return results, stats


def prove_stream(
    pk,
    synthesize_fns: Iterable[Callable[[], object]],
    max_in_flight: int = 3,
    rng_factory: Optional[Callable[[], object]] = None,
    with_stats: bool = False,
):
    """Prove a stream of independent circuits against one proving key,
    pipelining synthesis (Python) against proving (native/device).

    ``synthesize_fns``: callables returning a synthesized ConstraintSystem.
    ``rng_factory``: per-proof zk-randomness source (default: the
    deterministic test RNG, as the reference's tests use).
    Returns proofs in input order; with ``with_stats=True`` returns
    ``(proofs, PipelineStats)``.
    """

    def synth(fn):
        return fn()

    def prove(cs):
        rng = rng_factory() if rng_factory is not None else None
        return marlin.prove(pk, cs, rng)

    results, stats = run_pipeline(
        list(synthesize_fns),
        [("synth", synth), ("prove", prove)],
        max_in_flight=max_in_flight,
    )
    return (results, stats) if with_stats else results


def prove_indexed_stream(
    srs,
    circuits: Iterable,
    max_in_flight: int = 3,
    rng_factory: Optional[Callable[[], object]] = None,
    verify: bool = True,
    with_stats: bool = False,
):
    """Index + prove (+ verify) a stream of already-synthesized circuits
    against one SRS, pipelined: the index stage (Python-side matrix
    arithmetization, memoized per circuit shape by ``marlin.index``)
    overlaps with the prove stage's native/device hot loops.

    This is the PP half of block-level proven validation
    (``State.validate_block(prove=True)``): the DP axis batch-checks the
    witnesses, this pipelines the per-item Marlin proves — the reference
    proves each transaction serially inside ``Transaction::validate``
    (reference examples/simple-payments/transaction.rs:89-139,
    ledger.rs:176-193).

    Public inputs for the verify leg are taken from each circuit's
    instance assignment (sans the leading One, arkworks convention).
    Returns a list of ``(proof, verify_ok)`` in input order.
    """
    from .. import marlin as _marlin

    def index_stage(cs):
        pk, vk = _marlin.index(srs, cs)
        return cs, pk, vk

    def prove_stage(item):
        cs, pk, vk = item
        rng = rng_factory() if rng_factory is not None else None
        proof = _marlin.prove(pk, cs, rng)
        ok = True
        if verify:
            ok = _marlin.verify(vk, list(cs.instance_assignment[1:]), proof)
        return proof, ok

    results, stats = run_pipeline(
        list(circuits),
        [("index", index_stage), ("prove", prove_stage)],
        max_in_flight=max_in_flight,
    )
    return (results, stats) if with_stats else results
