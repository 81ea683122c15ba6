"""Limb-major BLS12-377 G1 Jacobian arithmetic on device.

The compute path of the device Pippenger MSM
(:mod:`simpleworks_tpu.ops.msm_pippenger`).  Coordinates are **limb-major**
``[24, B]`` uint32 arrays of 16-bit Fq Montgomery limbs — the layout of the
Pallas Montgomery-mul kernel (:mod:`.mont_mul_pallas`), which keeps the
whole schoolbook+REDC pipeline in VMEM and is compute-bound (~16 Fq muls
per point add).  XLA handles the cheap add/sub/select glue.

Same complete branchless Jacobian formulas as the limb-minor XLA path
(:mod:`simpleworks_tpu.curves.g1_device`) — Z = 0 encodes the identity,
equal-x cases resolved with selects — so the two paths are interchangeable
oracles.  Replaces the MSM under KZG commits (reference
``ark_poly_commit::marlin_pc`` via ``/root/reference/src/marlin/mod.rs:12``).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.bls12_377 import Fq, FQ_MODULUS
from ..fields.device import LIMB_BITS, LIMB_MASK, int_to_limbs
from .accel import enable_persistent_compile_cache
from .mont_mul_pallas import make_mont_mul

enable_persistent_compile_cache()

Q = FQ_MODULUS
L = 24  # 16-bit limbs per Fq element


class FqLimb:
    """Batched Fq ops on limb-major [24, B] uint32 Montgomery arrays."""

    def __init__(self, tile: int = 512):
        import os

        self.p_np = np.asarray(int_to_limbs(Q, L)).reshape(L, 1)
        self.one_np = np.asarray(
            int_to_limbs(Fq.PARAMS.montgomery_r % Q, L)
        ).reshape(L, 1)
        self._tile = tile
        self._muls: dict[int, object] = {}
        self._addsubs: dict[int, tuple] = {}
        # Pallas kernels only lower on real TPUs; on CPU (tests, virtual-mesh
        # dryrun) the scan-based XLA mul of fields/device.py is the fallback.
        flag = os.environ.get("SWTPU_PALLAS")
        if flag is not None:
            self._use_pallas = flag == "1"
        else:
            self._use_pallas = jax.default_backend() == "tpu"

    def _pad_batch(self, *arrays: jnp.ndarray):
        """Zero-pad [L, B] operands up to a tile multiple (Pallas block shapes
        must tile the array exactly; zero lanes are benign for mod-p ops and
        are sliced off by the caller).  Returns (padded..., original B)."""
        B = arrays[0].shape[1]
        pad = -B % self._tile
        if pad == 0:
            return (*arrays, B)
        return (*(jnp.pad(a, ((0, 0), (0, pad))) for a in arrays), B)

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        if not self._use_pallas:
            from ..curves.g1_device import fq_device_field

            df = fq_device_field()
            return jnp.moveaxis(df.mul(jnp.moveaxis(a, 0, -1), jnp.moveaxis(b, 0, -1)), -1, 0)
        a, b, B = self._pad_batch(a, b)
        mul = self._muls.get(self._tile)
        if mul is None:
            mul = make_mont_mul(Fq.PARAMS, tile=self._tile)
            self._muls[self._tile] = mul
        return mul(a, b)[:, :B]

    def _addsub(self):
        """Pallas (add, sub) kernels (TPU path; operands pre-padded)."""
        from .mont_mul_pallas import make_mod_addsub

        ops = self._addsubs.get(self._tile)
        if ops is None:
            ops = make_mod_addsub(Fq.PARAMS, tile=self._tile)
            self._addsubs[self._tile] = ops
        return ops

    # -- XLA glue for the CPU fallback (lax.scan keeps the graph small) ------

    @staticmethod
    def _normalize(t: jnp.ndarray) -> jnp.ndarray:
        def step(carry, col):
            v = col + carry
            return v >> LIMB_BITS, v & LIMB_MASK

        _carry, out = jax.lax.scan(step, jnp.zeros_like(t[0]), t)
        return out

    @staticmethod
    def _sub_borrow(a: jnp.ndarray, b: jnp.ndarray):
        def step(borrow, ab):
            ai, bi = ab
            d = ai - bi - borrow
            return (d >> 31) & 1, d & LIMB_MASK

        borrow, out = jax.lax.scan(step, jnp.zeros_like(a[0]), (a, b))
        return out, borrow

    def _cond_sub_p(self, a: jnp.ndarray) -> jnp.ndarray:
        p = jnp.asarray(self.p_np)
        diff, borrow = self._sub_borrow(a, jnp.broadcast_to(p, a.shape))
        return jnp.where((borrow == 1)[None, :], a, diff)

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        if self._use_pallas:
            a, b, B = self._pad_batch(a, b)
            return self._addsub()[0](a, b)[:, :B]
        return self._cond_sub_p(self._normalize(a + b))

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        if self._use_pallas:
            a, b, B = self._pad_batch(a, b)
            return self._addsub()[1](a, b)[:, :B]
        diff, borrow = self._sub_borrow(a, b)
        plus_p = self._normalize(diff + jnp.asarray(self.p_np))
        return jnp.where((borrow == 1)[None, :], plus_p, diff)

    def dbl(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.add(a, a)

    @staticmethod
    def is_zero(a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=0)

    @staticmethod
    def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """cond: [B] bool; a/b: [24, B]."""
        return jnp.where(cond[None, :], a, b)

    def inv(self, x: jnp.ndarray) -> jnp.ndarray:
        """Elementwise Fermat inverse x^(q-2) on [24, B] Montgomery limbs
        (0 maps to 0).  TPU path: ONE Pallas kernel holding the whole
        754-step square-and-multiply chain in VMEM; CPU fallback: the XLA
        mul in a fori_loop."""
        if self._use_pallas:
            from .mont_mul_pallas import make_mont_pow

            x_p, B = self._pad_batch(x)
            fn = make_mont_pow(Fq.PARAMS, Q - 2, tile=self._tile)
            return fn(x_p)[:, :B]
        from ..curves.g1_device import fq_device_field

        df = fq_device_field()
        xm = jnp.moveaxis(x, 0, -1)  # [B, L]
        one = jnp.broadcast_to(jnp.asarray(self.one_np).reshape(1, L), xm.shape)
        bits = jnp.asarray(
            [int(b) for b in bin(Q - 2)[2:]], dtype=jnp.uint32
        )

        def body(i, acc):
            sq = df.mul(acc, acc)
            withx = df.mul(sq, xm)
            return jnp.where(bits[i] > 0, withx, sq)

        out = jax.lax.fori_loop(0, bits.shape[0], body, one)
        return jnp.moveaxis(out, -1, 0)

    def batch_inverse(self, x: jnp.ndarray) -> jnp.ndarray:
        """Elementwise inverses of a NONZERO [24, B] batch via Montgomery's
        trick on a halving product tree: ~3 muls/lane plus one Fermat
        powering of a single ``tile``-wide remainder — the batched-affine
        MSM's per-scan-step inversion (a zero lane would poison its whole
        subtree; callers mask degenerate lanes to one first)."""
        B = x.shape[1]
        base = self._tile
        if B <= base:
            return self.inv(x)
        b_pad = base
        while b_pad < B:
            b_pad <<= 1
        if b_pad != B:
            ones = jnp.broadcast_to(jnp.asarray(self.one_np), (L, b_pad - B))
            cur = jnp.concatenate([x, ones], axis=1)
        else:
            cur = x
        halves = []
        while cur.shape[1] > base:
            h = cur.shape[1] // 2
            a, b = cur[:, :h], cur[:, h:]
            halves.append((a, b))
            cur = self.mul(a, b)
        inv = self.inv(cur)
        for a, b in reversed(halves):
            inv = jnp.concatenate([self.mul(inv, b), self.mul(inv, a)], axis=1)
        return inv[:, :B]


@lru_cache(maxsize=2)
def fq_limb(tile: int = 512) -> FqLimb:
    return FqLimb(tile)


# ------------------------------------------------------------- points ----


def identity(batch: int):
    f = fq_limb()
    one = jnp.broadcast_to(jnp.asarray(f.one_np), (L, batch))
    zero = jnp.zeros((L, batch), jnp.uint32)
    return one, one, zero


def select_point(cond, p, q):
    f = fq_limb()
    return tuple(f.select(cond, a, b) for a, b in zip(p, q))


def double(p):
    """Jacobian doubling (dbl-2009-l shape, a=0); identity-safe (Z=0 in ->
    Z=0 out)."""
    f = fq_limb()
    X1, Y1, Z1 = p
    A = f.mul(X1, X1)
    B = f.mul(Y1, Y1)
    C = f.mul(B, B)
    t = f.add(X1, B)
    D = f.sub(f.sub(f.mul(t, t), A), C)
    D = f.add(D, D)
    E = f.add(f.add(A, A), A)
    F = f.mul(E, E)
    X3 = f.sub(F, f.add(D, D))
    eight_c = f.add(C, C)
    eight_c = f.add(eight_c, eight_c)
    eight_c = f.add(eight_c, eight_c)
    Y3 = f.sub(f.mul(E, f.sub(D, X3)), eight_c)
    Z3 = f.mul(f.add(Y1, Y1), Z1)
    return (X3, Y3, Z3)


def _use_fused_add() -> bool:
    import os

    flag = os.environ.get("SWTPU_FUSED_ADD")
    if flag is not None:
        return flag == "1"
    # opt-in until validated on live hardware in this build's CI loop;
    # the composed path is the default oracle
    return False


def add(p, q):
    """Complete (branchless) Jacobian addition — [24, B] coordinate triples.

    On TPU the whole formula runs as ONE fused Pallas kernel
    (:mod:`.g1_fused_pallas`); the composed per-op path below is the
    oracle and the CPU/virtual-mesh fallback (``SWTPU_FUSED_ADD=0/1``
    overrides)."""
    if _use_fused_add():
        from .g1_fused_pallas import TILE as FUSED_TILE, make_fused_add

        B = p[0].shape[1]
        pad = -B % FUSED_TILE
        if pad:
            p = tuple(jnp.pad(a, ((0, 0), (0, pad))) for a in p)
            q = tuple(jnp.pad(a, ((0, 0), (0, pad))) for a in q)
        out = make_fused_add()(p, q)
        if pad:
            out = tuple(a[:, :B] for a in out)
        return out
    return _add_composed(p, q)


def madd(p, q_affine):
    """Complete mixed addition: Jacobian ``p`` + affine ``q = (X2, Y2)``
    (madd-2007-bl, Z2 = 1; x = y = 0 encodes the affine identity — (0, ±1)
    is the only on-curve x=0 point and it is outside the prime subgroup).

    The bucket-accumulate step of the MSM: SRS tables are normalized to
    Z = 1 (kzg10 setup/load), so each gathered point is 2 coordinates
    instead of 3 (−33% gather bytes) and the general add is 11 muls
    instead of 16.  With ``SWTPU_FUSED_ADD=1`` on TPU the whole formula
    runs as ONE fused Pallas kernel (:mod:`.g1_fused_pallas`
    make_fused_madd); the composed path below is the oracle."""
    if _use_fused_add():
        from .g1_fused_pallas import TILE as FUSED_TILE, make_fused_madd

        B = p[0].shape[1]
        pad = -B % FUSED_TILE
        if pad:
            p = tuple(jnp.pad(a, ((0, 0), (0, pad))) for a in p)
            q_affine = tuple(jnp.pad(a, ((0, 0), (0, pad))) for a in q_affine)
        out = make_fused_madd()(p, q_affine)
        if pad:
            out = tuple(a[:, :B] for a in out)
        return out
    return _madd_composed(p, q_affine)


def _madd_composed(p, q_affine):
    f = fq_limb()
    X1, Y1, Z1 = p
    X2, Y2 = q_affine
    Z1Z1 = f.mul(Z1, Z1)
    U2 = f.mul(X2, Z1Z1)
    S2 = f.mul(f.mul(Y2, Z1), Z1Z1)
    H = f.sub(U2, X1)
    rr = f.sub(S2, Y1)
    HH = f.mul(H, H)
    I = f.add(f.add(HH, HH), f.add(HH, HH))
    J = f.mul(H, I)
    r2 = f.add(rr, rr)
    V = f.mul(X1, I)
    X3 = f.sub(f.sub(f.mul(r2, r2), J), f.add(V, V))
    YJ = f.mul(Y1, J)
    Y3 = f.sub(f.mul(r2, f.sub(V, X3)), f.add(YJ, YJ))
    Zsum = f.add(Z1, H)
    Z3 = f.sub(f.sub(f.mul(Zsum, Zsum), Z1Z1), HH)
    general = (X3, Y3, Z3)

    h_zero = f.is_zero(H)
    r_zero = f.is_zero(rr)
    p_ident = f.is_zero(Z1)
    q_ident = f.is_zero(X2) & f.is_zero(Y2)
    dbl = double(p)
    B = X3.shape[1]
    one = jnp.broadcast_to(jnp.asarray(fq_limb().one_np), (L, B))

    out = select_point(h_zero & r_zero & ~p_ident & ~q_ident, dbl, general)
    out = select_point(h_zero & ~r_zero & ~p_ident & ~q_ident, identity(B), out)
    out = select_point(p_ident, (X2, Y2, one), out)
    out = select_point(q_ident, p, out)
    return out


def affine_madd(acc, q_affine, valid):
    """Branchless complete AFFINE + affine addition — the batch-affine MSM
    accumulate step (VERDICT r3 #3; the device twin of the host C++
    ``swtpu_g1_msm_affine`` scheme, csrc/swtpu_native.cpp).

    ``acc``/``q_affine``: (X, Y) pairs of [24, B] Montgomery limbs with
    x = y = 0 encoding the identity; ``valid``: [B] lane mask (invalid
    lanes keep ``acc``).  One shared batched inversion (Montgomery tree +
    single Fermat-powering kernel) replaces the per-lane division:

        λ   = (y2−y1)/(x2−x1)          (general;  3x1²/(2y1) when doubling)
        x3  = λ² − x1 − x2
        y3  = λ(x1−x3) − y1

    ≈ 4 muls + ~3 amortized inversion muls per lane vs the 11-mul mixed
    add — the edge rows (identities, equal-x) resolve via selects with the
    denominator masked to 1 so they never poison the inversion tree.
    Bit-exact with the madd path (tests/test_msm_device.py)."""
    f = fq_limb()
    x1, y1 = acc
    x2, y2 = q_affine
    B = x1.shape[1]

    acc_inf = f.is_zero(x1) & f.is_zero(y1)
    q_inf = (f.is_zero(x2) & f.is_zero(y2)) | ~valid
    dx = f.sub(x2, x1)
    dy = f.sub(y2, y1)
    x_eq = f.is_zero(dx)
    dbl = x_eq & f.is_zero(dy) & ~acc_inf & ~q_inf

    x1sq = f.mul(x1, x1)
    num = f.select(dbl, f.add(f.dbl(x1sq), x1sq), dy)   # 3x1² | y2−y1
    den = f.select(dbl, f.dbl(y1), dx)                  # 2y1  | x2−x1
    # lanes whose result comes from a select, or whose denominator is 0
    # (adding P to −P, doubling a 2-torsion point): invert 1 instead
    degenerate = acc_inf | q_inf | f.is_zero(den)
    one = jnp.broadcast_to(jnp.asarray(f.one_np), (L, B))
    inv = f.batch_inverse(f.select(degenerate, one, den))

    lam = f.mul(num, inv)
    x3 = f.sub(f.sub(f.mul(lam, lam), x1), x2)
    y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)

    # identity output: x1 == x2 with y1 != y2 (P + (−P)), or doubling a
    # y = 0 point — both have den == 0 among the non-identity lanes
    iden_out = f.is_zero(den) & ~acc_inf & ~q_inf
    zero = jnp.zeros((L, B), jnp.uint32)
    rx = f.select(iden_out, zero, x3)
    ry = f.select(iden_out, zero, y3)
    rx = f.select(acc_inf, x2, rx)
    ry = f.select(acc_inf, y2, ry)
    rx = f.select(q_inf, x1, rx)
    ry = f.select(q_inf, y1, ry)
    return rx, ry


def affine_to_jacobian(acc):
    """(X, Y) with x = y = 0 identity -> Jacobian (X, Y, Z) with Z = 0
    identity (the fold/suffix stages' representation)."""
    f = fq_limb()
    x, y = acc
    B = x.shape[1]
    is_id = f.is_zero(x) & f.is_zero(y)
    one = jnp.broadcast_to(jnp.asarray(f.one_np), (L, B))
    zero = jnp.zeros((L, B), jnp.uint32)
    ix, iy, iz = identity(B)
    return (
        f.select(is_id, ix, x),
        f.select(is_id, iy, y),
        f.select(is_id, zero, one),
    )


def _add_composed(p, q):
    f = fq_limb()
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = f.mul(Z1, Z1)
    Z2Z2 = f.mul(Z2, Z2)
    U1 = f.mul(X1, Z2Z2)
    U2 = f.mul(X2, Z1Z1)
    S1 = f.mul(f.mul(Y1, Z2), Z2Z2)
    S2 = f.mul(f.mul(Y2, Z1), Z1Z1)
    H = f.sub(U2, U1)
    rr = f.sub(S2, S1)
    rr2 = f.add(rr, rr)
    I = f.mul(f.add(H, H), f.add(H, H))
    J = f.mul(H, I)
    V = f.mul(U1, I)
    X3 = f.sub(f.sub(f.mul(rr2, rr2), J), f.add(V, V))
    SJ = f.mul(S1, J)
    Y3 = f.sub(f.mul(rr2, f.sub(V, X3)), f.add(SJ, SJ))
    Zsum = f.add(Z1, Z2)
    Z3 = f.mul(f.sub(f.sub(f.mul(Zsum, Zsum), Z1Z1), Z2Z2), H)
    general = (X3, Y3, Z3)

    h_zero = f.is_zero(H)
    r_zero = f.is_zero(rr)
    p_ident = f.is_zero(Z1)
    q_ident = f.is_zero(Z2)
    dbl = double(p)
    ident = identity(X3.shape[1])

    # same x: equal points -> double, opposite -> identity
    out = select_point(h_zero & r_zero, dbl, general)
    out = select_point(h_zero & ~r_zero & ~p_ident & ~q_ident, ident, out)
    out = select_point(q_ident, p, out)
    out = select_point(p_ident, q, out)
    return out


# -------------------------------------------------------- host bridge ----


def points_to_limb_major(points) -> tuple:
    """Host G1Points -> ([24, N],)*3 device arrays (Montgomery form),
    Jacobian coordinates preserved byte-for-byte (the g1_limb.add oracle
    and the byte-exact fixed-base table use this)."""
    R = Fq.PARAMS.montgomery_r
    n = len(points)
    out = []
    for coord in range(3):
        arr = np.zeros((L, n), dtype=np.uint32)
        for i, pt in enumerate(points):
            v = (pt.X, pt.Y, pt.Z)[coord] * R % Q
            for t in range(L):
                arr[t, i] = (v >> (16 * t)) & 0xFFFF
        out.append(jnp.asarray(arr))
    return tuple(out)


def points_to_limb_major_affine(points) -> tuple:
    """Host G1Points -> ([24, N],)*3 device arrays normalized to the MSM
    affine invariant (Z = 1; the identity packs as x = y = z = 0) — the
    layout ``msm_device``/the sharded MSM require for mixed addition."""
    from ..curves.bls12_377 import G1Point

    norm = []
    for pt in points:
        if pt.is_identity():
            norm.append(G1Point(0, 0, 0))
        else:
            x, y = pt.to_affine()
            norm.append(G1Point(x, y, 1))
    return points_to_limb_major(norm)


def native_points_to_limb_major(points_native: np.ndarray):
    """[N, 18] u64 Jacobian Montgomery (the native SRS layout) ->
    one [2, 24, N] uint32 device array of the X/Y planes — a pure
    view/transpose, no bigints; stacked so the MSM gathers both
    coordinates in one take.

    Input must satisfy the affine invariant (Z == 1, identity rows all
    zero — ``native.g1_ensure_normalized``); the MSM accumulate performs
    mixed adds against the X/Y planes ONLY, so the all-ones Z plane is
    not shipped (a 3.1 M-point SRS table drops 905 -> 603 MB, ~13 s of
    one-time upload on the 24 MB/s tunnel).  The invariant is asserted
    here lib-free (pure numpy) so a stale Jacobian table can never reach
    the device silently (ADVICE r3 #1)."""
    rows = np.ascontiguousarray(points_native, dtype="<u8").reshape(-1, 18)
    mont_one = np.zeros(6, dtype="<u8")
    r = Fq.PARAMS.montgomery_r % Q
    for t in range(6):
        mont_one[t] = (r >> (64 * t)) & 0xFFFFFFFFFFFFFFFF
    z_is_one = (rows[:, 12:18] == mont_one).all(axis=1)
    row_is_zero = (rows == 0).all(axis=1)
    if not bool((z_is_one | row_is_zero).all()):
        raise ValueError(
            "point table violates the affine invariant (Z != 1): "
            "normalize with native.g1_ensure_normalized first"
        )
    u16 = rows.view("<u2").reshape(-1, 3, L)
    coords = u16[:, :2].astype(np.uint32).transpose(1, 2, 0)  # [2, 24, N]
    return jnp.asarray(coords)


def points_from_limb_major(batch) -> list:
    from ..curves.bls12_377 import G1Point

    rinv = pow(Fq.PARAMS.montgomery_r, -1, Q)
    coords = []
    for arr in batch:
        a = np.asarray(jax.device_get(arr)).astype(np.uint64)
        n = a.shape[1]
        vals = []
        for i in range(n):
            v = 0
            for t in range(L - 1, -1, -1):
                v = (v << 16) | int(a[t, i])
            vals.append(v * rinv % Q)
        coords.append(vals)
    xs, ys, zs = coords
    return [G1Point(x, y, z) for x, y, z in zip(xs, ys, zs)]
