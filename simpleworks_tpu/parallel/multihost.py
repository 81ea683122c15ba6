"""Multi-host (DCN) plumbing for the sharded prover — SURVEY.md §2.4/§5.8
'multi-host via jax.distributed over DCN'.

A multi-process mesh changes two mechanical things and nothing else:

* **Host → device**: ``jax.device_put(np_array, sharding)`` requires every
  target device to be process-local.  :func:`put_global` falls back to
  ``jax.make_array_from_callback`` — every process holds the full
  (deterministically identical) host array and serves its addressable
  shards.
* **Device → host**: ``np.asarray`` on a global array requires it to be
  fully addressable or fully replicated.  :func:`fetch_global` falls back
  to ``multihost_utils.process_allgather`` for sharded outputs.

The SPMD programs themselves (shard_map + psum/all_to_all) are identical
on 1 process and N — XLA maps the collectives to ICI within a process's
devices and DCN across processes.  Smoke-tested with two local CPU
processes (tests/test_multihost.py), proof bytes pinned against the
single-process path.
"""

from __future__ import annotations

import numpy as np
import jax


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def put_global(arr, sharding):
    """``device_put`` that also works when ``sharding`` spans processes.

    Every process must hold the same full host array (true throughout the
    prover: circuit/SRS/scalar data is computed deterministically on each
    host); each process serves only its addressable shards."""
    if not is_multiprocess():
        return jax.device_put(arr, sharding)
    host = np.asarray(arr)
    return jax.make_array_from_callback(host.shape, sharding, lambda idx: host[idx])


def fetch_global(x) -> np.ndarray:
    """Global array → full host numpy array on every process."""
    if isinstance(x, np.ndarray):
        return x
    x = jax.block_until_ready(x)
    if getattr(x, "is_fully_replicated", True) or getattr(
        x, "is_fully_addressable", True
    ):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def initialize(coordinator_address: str, num_processes: int, process_id: int,
               local_device_count: int | None = None) -> None:
    """Join a multi-host job (``jax.distributed.initialize`` plus the CPU
    pinning this framework's test topology needs).  On TPU pods the PJRT
    runtime discovers the topology itself and only
    ``jax.distributed.initialize()`` (no args) is needed; this explicit
    form backs the 2-process CPU smoke topology."""
    import os

    if local_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={local_device_count}"
            ).strip()
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
