"""Observability: constraint accounting and kernel timing.

The reference's only tracing hook is ark's `ConstraintLayer`, attributing
constraints to `ns!` spans (SURVEY.md §5.1).  Here namespaces recorded by
the builder power per-span constraint accounting, plus a tiny timer registry
for device-kernel profiling (JAX profiler traces compose on top).
"""

from __future__ import annotations

import time
from collections import Counter
from contextlib import contextmanager
from dataclasses import dataclass, field


def constraint_counts_by_namespace(cs) -> dict[str, int]:
    """Constraints attributed to each namespace path (the ConstraintLayer
    analogue; empty path = unattributed)."""
    counts: Counter[str] = Counter()
    for name in cs.constraint_names:
        counts[name or "<root>"] += 1
    return dict(counts)


def summarize_circuit(cs) -> str:
    lines = [
        f"constraints: {cs.num_constraints}",
        f"instance variables: {cs.num_instance_variables}",
        f"witness variables: {cs.num_witness_variables}",
        f"non-zero entries (max over A/B/C): {cs.num_nonzero()}",
    ]
    for ns_path, count in sorted(
        constraint_counts_by_namespace(cs).items(), key=lambda kv: -kv[1]
    )[:20]:
        lines.append(f"  {ns_path}: {count}")
    return "\n".join(lines)


@dataclass
class KernelTimer:
    """Cumulative wall-clock per labelled region."""

    totals: dict[str, float] = field(default_factory=dict)
    counts: dict[str, int] = field(default_factory=dict)

    @contextmanager
    def region(self, label: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - start
            self.totals[label] = self.totals.get(label, 0.0) + dt
            self.counts[label] = self.counts.get(label, 0) + 1

    def report(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        return "\n".join(
            f"{label}: {total:.3f}s over {self.counts[label]} calls"
            for label, total in rows
        )


GLOBAL_TIMER = KernelTimer()


#: process-global prover timer — every ``marlin.prove`` populates it;
#: ``SWTPU_TRACE=1`` also prints the per-phase report to stderr
PROVER_TIMER = KernelTimer()


def maybe_report_prover(label: str) -> None:
    import os
    import sys

    if os.environ.get("SWTPU_TRACE"):
        print(f"[trace] {label}\n{PROVER_TIMER.report()}", file=sys.stderr, flush=True)


@contextmanager
def maybe_jax_profile(label: str):
    """Capture a JAX profiler trace (TensorBoard/Perfetto format) of the
    enclosed region when ``SWTPU_JAX_PROFILE=<dir>`` is set — kernel-level
    visibility (XLA op timeline, HBM traffic) on top of the wall-clock
    timers.  No-op otherwise."""
    import os

    out_dir = os.environ.get("SWTPU_JAX_PROFILE")
    if not out_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(out_dir, label)):
        yield


@contextmanager
def device_trace(log_dir: str):
    """JAX profiler trace around a region (kernel-level timeline for
    xprof/tensorboard) — the device-level complement to KernelTimer."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
