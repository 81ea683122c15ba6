"""Mesh-sharded radix-2 NTT: 4-step Cooley-Tukey with an all_to_all
transpose over ICI (SURVEY.md §2.4 'Distributed radix-2 NTT' — the SP/CP
axis of the framework).

Domain size N = N1·N2, data viewed as a row-major [N1, N2] matrix of
Montgomery limb vectors:

1. column NTTs of size N1 (local: matrix sharded over columns)
2. twiddle by w_N^(k1·n2)
3. all_to_all transpose → sharded over k1 rows
4. row NTTs of size N2 (local)

Output: C[k1, k2] with X[k1 + N1·k2] = C[k1][k2], sharded over k1.
Validated bit-exact against the host NTT on a virtual 8-device mesh
(tests/test_parallel.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..fields.bls12_377 import FR_MODULUS, Fr, fr_root_of_unity
from ..fields.pack import pack_standard
from ..poly.ntt_device import fr_device_field, DeviceNTT, get_device_ntt
from .multihost import fetch_global, put_global

MOD = FR_MODULUS


def _batched_stage_transform(x: jnp.ndarray, ntt: DeviceNTT,
                             inverse: bool = False) -> jnp.ndarray:
    """NTT along axis 0 of [n, B, L] (natural order in/out); ``inverse``
    selects the ω⁻¹ twiddle tables (no 1/n scaling — the 4-step caller
    applies the global 1/N once)."""
    df = ntt.df
    n = ntt.n
    x = jnp.take(x, ntt.rev, axis=0)
    for stage, tw in enumerate(ntt.twiddles_inv if inverse else ntt.twiddles_fwd):
        m = 2 << stage
        half = m // 2
        y = x.reshape(n // m, m, *x.shape[1:])
        lo = y[:, :half]
        hi = y[:, half:]
        t = df.mul(hi, tw[None, :, None, :])
        x = jnp.concatenate([df.add(lo, t), df.sub(lo, t)], axis=1).reshape(
            n, *x.shape[1:]
        )
    return x


def _twiddle_matrix(n1: int, n2: int, inverse: bool = False) -> np.ndarray:
    """w_N^(k1·n2) (or its inverse) as [n1, n2] Montgomery limb array."""
    w = fr_root_of_unity(n1 * n2)
    if inverse:
        w = pow(w, MOD - 2, MOD)
    R = Fr.PARAMS.montgomery_r
    vals = [
        pow(w, k1 * j2, MOD) * R % MOD for k1 in range(n1) for j2 in range(n2)
    ]
    packed = pack_standard(vals, Fr.PARAMS)
    return packed.reshape(n1, n2, -1)


def make_sharded_ntt(mesh: Mesh, axis_name: str, n1: int, n2: int,
                     inverse: bool = False):
    """Build a jitted sharded NTT: [n1, n2, L] (sharded over axis 1) ->
    C[k1, k2] (sharded over axis 0).  ``inverse`` runs the ω⁻¹ transform
    WITHOUT the 1/N scale (callers fold it into their own scaling)."""
    df = fr_device_field()
    ntt1 = get_device_ntt(n1)
    ntt2 = get_device_ntt(n2)
    twiddle = jnp.asarray(_twiddle_matrix(n1, n2, inverse))
    n_dev = mesh.shape[axis_name]
    assert n2 % n_dev == 0 and n1 % n_dev == 0

    def local_step(x_block, tw_block):
        # x_block: [n1, n2/d, L] — full columns
        y = _batched_stage_transform(x_block, ntt1, inverse)  # column NTTs
        y = df.mul(y, tw_block)                               # twiddle
        # transpose: rows of size n1 split across devices
        y = jax.lax.all_to_all(y, axis_name, split_axis=0, concat_axis=1, tiled=True)
        # y: [n1/d, n2, L] — full rows; NTT along axis 1
        y = jnp.swapaxes(y, 0, 1)                            # [n2, n1/d, L]
        y = _batched_stage_transform(y, ntt2, inverse)       # row NTTs (size n2)
        return jnp.swapaxes(y, 0, 1)                         # [n1/d, n2, L]

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(None, axis_name, None)),
        out_specs=P(axis_name, None, None),
    )

    @jax.jit
    def run(x):
        return sharded(x, twiddle)

    return run, twiddle


# ------------------------------------------------- prover integration ----
#
# marlin.prove's transforms route here when a mesh is configured
# (ops/accel.py: prover_mesh + use_sharded_ntt); bit-exact with the host
# path — tests/test_parallel.py::test_prove_bytes_1_vs_8 pins it at the
# proof-byte level (SURVEY.md §7 PR7 acceptance).

_TRANSFORM_MEMO: dict = {}


def _mesh_key(mesh: Mesh, axis_name: str):
    return (tuple(d.id for d in mesh.devices.flat), axis_name)


def sharded_transform_supported(mesh: Mesh, axis_name: str, n: int) -> bool:
    n_dev = mesh.shape[axis_name]
    if n < 4 or n & (n - 1):
        return False
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    return n1 % n_dev == 0 and n2 % n_dev == 0


def sharded_transform_vec(mesh: Mesh, axis_name: str, v, inverse: bool = False):
    """Natural-order FrVec -> transformed FrVec via the 4-step sharded NTT
    (no scaling; the caller applies 1/n for inverse transforms).  Output is
    identical to the host/native/device single-chip transforms."""
    from ..fields.frvec import FrVec

    n = len(v)
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    key = (_mesh_key(mesh, axis_name), n1, n2, inverse)
    run = _TRANSFORM_MEMO.get(key)
    if run is None:
        run, _ = make_sharded_ntt(mesh, axis_name, n1, n2, inverse)
        if len(_TRANSFORM_MEMO) >= 32:
            _TRANSFORM_MEMO.pop(next(iter(_TRANSFORM_MEMO)))
        _TRANSFORM_MEMO[key] = run
    x = put_global(
        jnp.asarray(v.to_device_limbs().reshape(n1, n2, -1)),
        NamedSharding(mesh, P(None, axis_name, None)),
    )
    c = fetch_global(run(x))  # [n1, n2, L]; X[k1 + n1·k2]
    return FrVec.from_device_limbs(c.swapaxes(0, 1).reshape(n, -1))


def sharded_ntt_host(mesh: Mesh, axis_name: str, values: list[int]) -> list[int]:
    """Host convenience wrapper: natural-order ints in, natural-order out."""
    n = len(values)
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    df = fr_device_field()
    R = Fr.PARAMS.montgomery_r
    packed = pack_standard([v * R % MOD for v in values], Fr.PARAMS).reshape(n1, n2, -1)
    run, _ = make_sharded_ntt(mesh, axis_name, n1, n2)
    x = put_global(
        jnp.asarray(packed), NamedSharding(mesh, P(None, axis_name, None))
    )
    c = fetch_global(run(x))  # [n1, n2, L], X[k1 + n1·k2] = C[k1][k2]
    from ..fields.pack import unpack_standard

    flat = c.swapaxes(0, 1).reshape(n, -1)  # index k1 fastest
    rinv = pow(R, -1, MOD)
    return [v * rinv % MOD for v in unpack_standard(flat, Fr.PARAMS)]
