"""Mesh-sharded MSM over BLS12-377 G1 (SURVEY.md §2.4 'Distributed
Pippenger MSM' slot).

Points and scalars are sharded across the mesh axis; each device runs a
batched double-and-add ladder over its shard (uint32 limb lanes,
branchless Jacobian ops), tree-reduces its lanes, and partial sums are
combined with an all_gather + local tree reduction over ICI.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..curves.bls12_377 import G1Point
from ..curves import g1_device as g1d
from ..fields.bls12_377 import FR_MODULUS


def scalars_to_bits(scalars: list[int], num_bits: int = 253) -> np.ndarray:
    bits = np.zeros((len(scalars), num_bits), dtype=bool)
    for i, s in enumerate(scalars):
        s = int(s) % FR_MODULUS
        for b in range(num_bits):
            bits[i, b] = (s >> b) & 1
    return bits


def _local_msm(px, py, pz, bits, axis_name=None):
    """Batched ladder: acc_i = s_i · P_i, then lane tree-reduce.
    px/py/pz: [n_local, L]; bits: [n_local, num_bits]."""

    def step(carry, bit_col):
        acc, base = carry
        added = g1d.add(acc, base)
        acc = g1d.select_point(bit_col, added, acc)
        base = g1d.double(base)
        return (acc, base), None

    acc0 = g1d.identity_like((px.shape[0],))
    if axis_name is not None:
        # inside shard_map the carry must carry the varying-axis type
        acc0 = tuple(jax.lax.pvary(x, (axis_name,)) for x in acc0)
    (acc, _base), _ = jax.lax.scan(step, (acc0, (px, py, pz)), bits.T)
    return g1d.tree_reduce(acc)


def make_sharded_msm(mesh: Mesh, axis_name: str, num_bits: int = 253):
    """Build a jitted sharded MSM: (points [N,L]×3, bits [N,num_bits]) -> one
    Jacobian point (replicated [1, L] coordinate triple).

    Each device reduces its shard to one partial point; the partials come out
    of the shard_map region *sharded* (``P(axis, None)`` — the spec shard_map
    can verify without replication inference, which the earlier
    all_gather-inside formulation failed: round-1 dryrun rc=1) and the
    cross-device combine is a small Jacobian tree reduction in the enclosing
    jit, riding ICI via XLA's resharding."""
    n_dev = mesh.shape[axis_name]

    def local_step(px, py, pz, bits):
        # ([1, L],) * 3 — this device's partial sum
        return _local_msm(px, py, pz, bits, axis_name=axis_name)

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(axis_name, None),
            P(axis_name, None),
            P(axis_name, None),
            P(axis_name, None),
        ),
        out_specs=(P(axis_name, None), P(axis_name, None), P(axis_name, None)),
    )

    def run(px, py, pz, bits):
        parts = sharded(px, py, pz, bits)  # ([n_dev, L],) * 3
        # pad the device count to a power of two with identity points
        target = 1
        while target < n_dev:
            target <<= 1
        if target != n_dev:
            ix, iy, iz = g1d.identity_like((target - n_dev,))
            parts = (
                jnp.concatenate([parts[0], ix]),
                jnp.concatenate([parts[1], iy]),
                jnp.concatenate([parts[2], iz]),
            )
        return g1d.tree_reduce(parts)

    return jax.jit(run)


def sharded_msm_host(mesh: Mesh, axis_name: str, points: list[G1Point], scalars: list[int]) -> G1Point:
    """Host wrapper: pad to a device-divisible power-of-two lane count."""
    n_dev = mesh.shape[axis_name]
    n = max(2, len(points))
    target = 1
    while target < n or target % n_dev:
        target <<= 1
    pts = list(points) + [G1Point.identity()] * (target - len(points))
    scs = list(scalars) + [0] * (target - len(scalars))
    px, py, pz = g1d.points_to_device(pts)
    bits = jnp.asarray(scalars_to_bits(scs))
    run = make_sharded_msm(mesh, axis_name)
    spec = NamedSharding(mesh, P(axis_name, None))
    out = run(
        jax.device_put(px, spec),
        jax.device_put(py, spec),
        jax.device_put(pz, spec),
        jax.device_put(bits, spec),
    )
    return g1d.points_from_device(out)[0]
