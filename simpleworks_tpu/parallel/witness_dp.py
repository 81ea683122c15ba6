"""Data-parallel batched witness checking over a mesh
(SURVEY.md §2.4 'Batched witness execution' — the DP axis).

One circuit structure, a batch of assignments sharded across devices; the
satisfiability verdict per assignment stays local, the aggregate verdict is
a psum reduction over ICI.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..r1cs.satisfiability import DeviceR1CS
from .multihost import fetch_global, put_global


def make_sharded_checker(mesh: Mesh, axis_name: str, device_r1cs: DeviceR1CS):
    """Returns a jitted fn: z_mont [batch, cols, L] (batch-sharded) ->
    (ok_per_row bool[batch] sharded, num_failures replicated)."""

    def local_step(z_block):
        ok = device_r1cs._check_mont(z_block)
        failures = jnp.sum(~ok)
        total = jax.lax.psum(failures, axis_name)
        return ok, total

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis_name, None, None),),
        out_specs=(P(axis_name), P()),
    )
    return jax.jit(sharded)


def sharded_check_host(mesh: Mesh, axis_name: str, cs, assignments) -> list[bool]:
    """Host wrapper: pad the batch to device-divisible size and check."""
    dev = DeviceR1CS(cs)
    n_dev = mesh.shape[axis_name]
    batch = [dev.df.to_mont(row) for row in assignments]
    n = len(batch)
    sat_row = dev.df.to_mont(cs.full_assignment())
    while len(batch) % n_dev:
        batch.append(sat_row)  # pad with a known-satisfying row
    z = jnp.stack([jnp.asarray(b) for b in batch])
    run = make_sharded_checker(mesh, axis_name, dev)
    z = put_global(z, NamedSharding(mesh, P(axis_name, None, None)))
    ok, _total = run(z)
    return list(fetch_global(ok))[:n]
