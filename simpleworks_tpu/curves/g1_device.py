"""Batched BLS12-377 G1 arithmetic on device (uint32 limb lanes).

The compute path for SRS generation and (sharded) commitment MSMs
(SURVEY.md §2.4 'Distributed Pippenger MSM').  Points are Jacobian
(X, Y, Z) with Z = 0 encoding the identity; all case handling is
branchless (select-based), so the ops vmap/shard_map cleanly.

Shapes: a point batch is a dict-free tuple of three [..., 24] uint32
Montgomery-form arrays.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from ..fields.bls12_377 import Fq, FQ_MODULUS
from ..fields.device import DeviceField
from ..fields.pack import pack_standard, unpack_standard
from .bls12_377 import G1Point

Q = FQ_MODULUS


@lru_cache(maxsize=None)
def fq_device_field() -> DeviceField:
    return DeviceField(Fq.PARAMS)


def points_to_device(points: list[G1Point]):
    """Host Jacobian points -> device arrays (Montgomery form)."""
    R = Fq.PARAMS.montgomery_r
    xs = pack_standard([p.X * R % Q for p in points], Fq.PARAMS)
    ys = pack_standard([p.Y * R % Q for p in points], Fq.PARAMS)
    zs = pack_standard([p.Z * R % Q for p in points], Fq.PARAMS)
    return jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs)


def points_from_device(batch) -> list[G1Point]:
    X, Y, Z = batch
    rinv = pow(Fq.PARAMS.montgomery_r, -1, Q)
    xs = unpack_standard(np.asarray(X), Fq.PARAMS)
    ys = unpack_standard(np.asarray(Y), Fq.PARAMS)
    zs = unpack_standard(np.asarray(Z), Fq.PARAMS)
    return [
        G1Point(x * rinv % Q, y * rinv % Q, z * rinv % Q)
        for x, y, z in zip(xs, ys, zs)
    ]


def identity_like(shape_prefix) -> tuple:
    df = fq_device_field()
    one = jnp.broadcast_to(df.one_mont, (*shape_prefix, df.n_limbs))
    zero = jnp.zeros((*shape_prefix, df.n_limbs), jnp.uint32)
    return one, one, zero


def is_identity(p) -> jnp.ndarray:
    df = fq_device_field()
    return df.is_zero(p[2])


def select_point(cond, a, b):
    df = fq_device_field()
    return tuple(df.select(cond, x, y) for x, y in zip(a, b))


def double(p):
    df = fq_device_field()
    X1, Y1, Z1 = p
    A = df.mul(X1, X1)
    B = df.mul(Y1, Y1)
    C = df.mul(B, B)
    t = df.add(X1, B)
    D = df.sub(df.sub(df.mul(t, t), A), C)
    D = df.add(D, D)
    E = df.add(df.add(A, A), A)
    F = df.mul(E, E)
    X3 = df.sub(F, df.add(D, D))
    eight_c = df.add(C, C)
    eight_c = df.add(eight_c, eight_c)
    eight_c = df.add(eight_c, eight_c)
    Y3 = df.sub(df.mul(E, df.sub(D, X3)), eight_c)
    Z3 = df.mul(df.add(Y1, Y1), Z1)
    return (X3, Y3, Z3)


def add(p, q):
    """Complete (branchless) Jacobian addition."""
    df = fq_device_field()
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = df.mul(Z1, Z1)
    Z2Z2 = df.mul(Z2, Z2)
    U1 = df.mul(X1, Z2Z2)
    U2 = df.mul(X2, Z1Z1)
    S1 = df.mul(df.mul(Y1, Z2), Z2Z2)
    S2 = df.mul(df.mul(Y2, Z1), Z1Z1)
    H = df.sub(U2, U1)
    rr = df.sub(S2, S1)
    rr = df.add(rr, rr)
    I = df.mul(df.add(H, H), df.add(H, H))
    J = df.mul(H, I)
    V = df.mul(U1, I)
    X3 = df.sub(df.sub(df.mul(rr, rr), J), df.add(V, V))
    SJ = df.mul(S1, J)
    Y3 = df.sub(df.mul(rr, df.sub(V, X3)), df.add(SJ, SJ))
    Zsum = df.add(Z1, Z2)
    Z3 = df.mul(df.sub(df.sub(df.mul(Zsum, Zsum), Z1Z1), Z2Z2), H)
    general = (X3, Y3, Z3)

    h_zero = df.is_zero(H)
    r_zero = df.is_zero(rr)
    p_ident = df.is_zero(Z1)
    q_ident = df.is_zero(Z2)
    dbl = double(p)
    ident = identity_like(X3.shape[:-1])

    # same x: equal points -> double, opposite -> identity
    out = select_point(h_zero & r_zero, dbl, general)
    out = select_point(h_zero & ~r_zero & ~p_ident & ~q_ident, ident, out)
    out = select_point(q_ident, p, out)
    out = select_point(p_ident, q, out)
    return out


def scalar_mul_fixed_base_batch(base: G1Point, scalars: list[int], num_bits: int = 253):
    """Many scalars × one base: batched double-free ladder using a host
    precomputed table of base doublings (the SRS-generation kernel)."""
    import jax

    table = []
    cur = base
    for _ in range(num_bits):
        table.append(cur)
        cur = cur.double()
    tX, tY, tZ = points_to_device(table)  # [num_bits, 24]
    bits = np.zeros((len(scalars), num_bits), dtype=bool)
    for i, s in enumerate(scalars):
        s = int(s)
        for b in range(num_bits):
            bits[i, b] = (s >> b) & 1
    bits_dev = jnp.asarray(bits)

    def step(acc, inputs):
        bit, bx, by, bz = inputs
        base_b = (
            jnp.broadcast_to(bx, acc[0].shape),
            jnp.broadcast_to(by, acc[0].shape),
            jnp.broadcast_to(bz, acc[0].shape),
        )
        added = add(acc, base_b)
        return select_point(bit, added, acc), None

    acc0 = identity_like((len(scalars),))
    (acc, _) = jax.lax.scan(
        lambda a, xs: step(a, xs),
        acc0,
        (bits_dev.T, tX, tY, tZ),
    )
    return acc


def tree_reduce(points):
    """Pairwise tree reduction of a [N, ...] point batch to a single point
    (N a power of two)."""
    X, Y, Z = points
    n = X.shape[0]
    assert n & (n - 1) == 0
    while n > 1:
        half = n // 2
        left = (X[:half], Y[:half], Z[:half])
        right = (X[half:n], Y[half:n], Z[half:n])
        X, Y, Z = add(left, right)
        n = half
    return (X, Y, Z)
