"""KZG10 polynomial commitments with MarlinKZG-style degree bounds.

Replaces ``ark_poly_commit::marlin_pc::MarlinKZG10``
(SURVEY.md §2.3; reference instantiation ``src/marlin/mod.rs:12``).

* universal setup: powers-of-tau SRS over G1 (+ H, βH in G2), sampled from
  the deterministic RNG
* commit: MSM of coefficients against the powers; a degree bound d adds a
  *shifted* commitment to X^(D-d)·p — enforcing deg p ≤ d because the
  shifted polynomial must stay within the SRS
* batch open at a point z: one witness W = [Σ ξ^i (p_i(X)-p_i(z))/(X-z)]·G
  where degree-bounded polys contribute their shifted twin with claimed
  value z^(D-d)·p(z)
* batch check: e(Σ ξ^i C_i - [Σ ξ^i v_i]·G - r(z)·γG, H) == e(W, βH - zH)

**Hiding mode** (MarlinKZG10's zk layer): the SRS carries a second table of
powers γG, τγG, ... (small — only up to the blinding degree).  A hiding
commitment is C = p(τ)G + r(τ)γG with r a random blinding polynomial of
degree hiding_bound+1; the batch opening witness gains the combined
blinding quotient on the γ-table and the proof carries the combined
blinding evaluation r(z) (``random_v``).  Non-hiding commitments are the
r = 0 special case, so both kinds mix freely in one batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..curves.bls12_377 import G1Point, G2Point
from ..errors import ensure
from ..curves.pairing import multi_pairing
from ..curves.fq_tower import Fq12
from ..fields.bls12_377 import Fr, FR_MODULUS
from ..fields.frvec import FrVec
from ..poly.dense import DensePoly
from .msm import FixedBaseMSM, msm

P = FR_MODULUS


#: degree of the blinding polynomials (hiding_bound=1 opening per point,
#: +1 as in ark-poly-commit's ``Randomness::rand``)
HIDING_POLY_DEGREE = 2
#: γ-power table length: enough for blinding polys of degree HIDING_POLY_DEGREE
NUM_GAMMA_POWERS = HIDING_POLY_DEGREE + 1


class UniversalSRS:
    """Powers of tau: [G, τG, τ²G, ...], H, τH, plus the γ-powers
    [γG, τγG, ...] for hiding commitments.

    Primary storage is the native [N, 18]-u64 Jacobian array when the C++
    runtime built it (one conversion, reused by every commit MSM); the
    Python point list is materialized lazily otherwise.
    """

    def __init__(self, powers_of_g=None, h=None, beta_h=None, powers_native=None,
                 powers_of_gamma_g=None):
        self._powers_list = powers_of_g
        self.powers_native = powers_native
        self._device_powers = None
        self.h = h
        self.beta_h = beta_h
        self.powers_of_gamma_g = powers_of_gamma_g

    @property
    def gamma_g(self) -> G1Point:
        return self.powers_of_gamma_g[0]

    @property
    def powers_of_g(self) -> list[G1Point]:
        if self._powers_list is None:
            from ..native import _points_from_native

            self._powers_list = _points_from_native(self.powers_native)
        return self._powers_list

    @property
    def num_powers(self) -> int:
        if self.powers_native is not None:
            return self.powers_native.shape[0]
        return len(self._powers_list)

    def power(self, i: int) -> G1Point:
        """Single SRS power τ^i·G without materializing the Python list."""
        if self._powers_list is not None:
            return self._powers_list[i]
        from ..native import _points_from_native

        return _points_from_native(self.powers_native[i : i + 1])[0]

    def first_power(self) -> G1Point:
        return self.power(0)

    @property
    def max_degree(self) -> int:
        return self.num_powers - 1

    def device_powers(self):
        """SRS G1 powers as device-resident limb-major arrays (([24, N],)*3,
        uploaded once and cached — the device Pippenger commit path).
        Normalized to the affine invariant first (mixed-add accumulate)."""
        if getattr(self, "_device_powers", None) is None:
            from .. import native
            from ..ops.g1_limb import native_points_to_limb_major

            self._device_powers = native_points_to_limb_major(
                native.g1_ensure_normalized(self.powers_native)
            )
        return self._device_powers


@dataclass
class Commitment:
    comm: G1Point
    shifted_comm: Optional[G1Point] = None
    degree_bound: Optional[int] = None

    def serialize(self) -> bytes:
        out = self.comm.serialize_compressed()
        out += b"\x01" if self.shifted_comm is not None else b"\x00"
        if self.shifted_comm is not None:
            out += self.shifted_comm.serialize_compressed()
        return out


#: transparent SRS memo: ``setup`` is deterministic given (max_degree, τ, γ),
#: and the reference's workloads regenerate the *same* SRS constantly — e.g.
#: simple-payments samples a fresh SRS from a fresh ``test_rng`` per
#: transaction (reference examples/simple-payments/transaction.rs:96).  The
#: rng is always advanced identically (τ, γ are drawn before the lookup), so
#: caching the heavy powers-of-tau computation is unobservable.
_SRS_MEMO: dict[tuple[int, int, int], UniversalSRS] = {}
_SRS_MEMO_MAX = 2


def setup(max_degree: int, rng) -> UniversalSRS:
    """Sample τ, γ and build the powers tables (fixed-base windowed muls).

    The group generators are the pinned curve generators (arkworks samples
    random group elements here; semantics identical, vectors differ)."""
    tau = Fr.rand(rng).value
    gamma = Fr.rand(rng).value
    memo_key = (max_degree, tau, gamma)
    cached = _SRS_MEMO.get(memo_key)
    if cached is not None:
        return cached
    srs = _load_srs_disk(memo_key)
    if srs is None:
        srs = _setup_uncached(max_degree, tau, gamma)
        _save_srs_disk(memo_key, srs)
    if len(_SRS_MEMO) >= _SRS_MEMO_MAX:
        _SRS_MEMO.pop(next(iter(_SRS_MEMO)))
    _SRS_MEMO[memo_key] = srs
    return srs


# --------------------------- disk checkpoint of the powers table -------------
#
# The artifact is deterministic given (max_degree, τ, γ) — the memo key — so
# a per-machine disk cache is as transparent as the in-process memo but also
# amortizes SRS generation across processes (the reference workloads pay it
# per run: ~minutes at the (100k, 25k, 300k) scale).  Only the native
# [N, 18]-u64 layout is cached (the fast path); disable with
# ``SWTPU_SRS_DISK_CACHE=0`` or point elsewhere with ``SWTPU_SRS_CACHE_DIR``.

# Format 2: the powers table is stored pre-normalized (Z == 1, identity
# rows all zero) — the layout invariant the batch-affine host MSM and the
# mixed-add device accumulate both rely on.  Format-1 checkpoints (which
# could hold Jacobian Z != 1 rows) hash to different paths and are simply
# regenerated (ADVICE r3 #1).
_SRS_DISK_FORMAT = 2
_SRS_DISK_MAX_FILES = 4


def _srs_disk_path(memo_key) -> "str | None":
    import hashlib
    import os
    import tempfile

    if os.environ.get("SWTPU_SRS_DISK_CACHE") == "0":
        return None
    cache_dir = os.environ.get(
        "SWTPU_SRS_CACHE_DIR",
        os.path.join(tempfile.gettempdir(), "swtpu_srs_cache"),
    )
    tag = hashlib.sha256(repr((_SRS_DISK_FORMAT, *memo_key)).encode()).hexdigest()[:24]
    return os.path.join(cache_dir, f"srs_{memo_key[0]}_{tag}.npz")


def _save_srs_disk(memo_key, srs: UniversalSRS) -> None:
    import os

    import numpy as np

    path = _srs_disk_path(memo_key)
    if path is None or srs.powers_native is None:
        return
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        cache_dir = os.path.dirname(path)
        existing = sorted(
            (
                os.path.join(cache_dir, f)
                for f in os.listdir(cache_dir)
                if f.startswith("srs_") and f.endswith(".npz") and ".tmp." not in f
            ),
            key=os.path.getmtime,
        )
        while len(existing) >= _SRS_DISK_MAX_FILES:
            os.unlink(existing.pop(0))  # oldest first
        small = np.frombuffer(
            srs.h.serialize_compressed()
            + srs.beta_h.serialize_compressed()
            + b"".join(p.serialize_compressed() for p in srs.powers_of_gamma_g),
            dtype=np.uint8,
        )
        tmp = f"{path}.{os.getpid()}.tmp.npz"
        np.savez(tmp, powers=srs.powers_native, small=small,
                 n_gamma=np.int64(len(srs.powers_of_gamma_g)))
        os.replace(tmp, path)
    except OSError:
        pass


def _load_srs_disk(memo_key) -> "UniversalSRS | None":
    import numpy as np

    path = _srs_disk_path(memo_key)
    if path is None:
        return None
    try:
        with np.load(path) as data:
            powers = np.ascontiguousarray(data["powers"])
            small = data["small"].tobytes()
            n_gamma = int(data["n_gamma"])
    except (OSError, KeyError, ValueError):
        return None
    h = G2Point.deserialize_compressed(small[:96])
    beta_h = G2Point.deserialize_compressed(small[96:192])
    gamma_powers = [
        G1Point.deserialize_compressed(small[192 + 48 * i : 192 + 48 * (i + 1)])
        for i in range(n_gamma)
    ]
    return UniversalSRS(h=h, beta_h=beta_h, powers_native=powers,
                        powers_of_gamma_g=gamma_powers)


def _setup_uncached(max_degree: int, tau: int, gamma: int) -> UniversalSRS:
    g = G1Point.generator()
    scalars = []
    cur = 1
    for _ in range(max_degree + 1):
        scalars.append(cur)
        cur = cur * tau % P
    from .. import native

    h = G2Point.generator()
    beta_h = h.scalar_mul(tau)
    table = FixedBaseMSM(g, window_bits=8)
    gamma_powers = [
        table.mul(gamma * pow(tau, i, P) % P) for i in range(NUM_GAMMA_POWERS)
    ]
    if native.available():
        from ..ops import accel

        if accel.use_device_fixed_base(len(scalars)):
            from ..fields.frvec import FrVec
            from ..ops.srs_device import fixed_base_powers_device

            std = FrVec.from_ints(scalars).to_std_array()
            powers_native = fixed_base_powers_device(g, std)
        else:
            powers_native = native.g1_fixed_base_raw(g, scalars)
        # store Z == 1: the batch-affine MSM consumes the table directly and
        # the disk checkpoint then round-trips pre-normalized
        powers_native = native.g1_normalize_arr(powers_native)
        return UniversalSRS(h=h, beta_h=beta_h, powers_native=powers_native,
                            powers_of_gamma_g=gamma_powers)
    powers = [table.mul(s) for s in scalars]
    return UniversalSRS(powers_of_g=powers, h=h, beta_h=beta_h,
                        powers_of_gamma_g=gamma_powers)


def _srs_msm(srs: UniversalSRS, coeffs, offset: int = 0) -> G1Point:
    """MSM of coefficients (FrVec or int list) against SRS powers
    [offset, offset+len)."""
    n = len(coeffs)
    if n == 0:
        return G1Point.identity()
    vec = coeffs if isinstance(coeffs, FrVec) else FrVec.from_ints(coeffs)
    from .. import native
    from ..ops import accel
    from ..utils.observability import PROVER_TIMER

    if srs.powers_native is not None and accel.use_sharded_msm(n):
        mesh_axis = accel.prover_mesh()
        if mesh_axis is not None:
            from ..parallel.msm_sharded import sharded_msm_native

            with PROVER_TIMER.region("srs_msm.sharded"):
                return sharded_msm_native(
                    mesh_axis[0], mesh_axis[1], srs.powers_native,
                    vec.to_std_array(), offset=offset,
                )
    if srs.powers_native is not None and accel.use_device_msm(n):
        from ..ops import msm_pippenger

        with PROVER_TIMER.region("srs_msm.device"):
            # Montgomery-form entry: mont->std + digit derivation run on
            # device (one Pallas multiply by literal 1), so the host ships
            # u16 Montgomery limbs — or nothing at all when the coeffs are
            # already device-resident from an NTT chain
            return msm_pippenger.msm_device_mont(
                srs.device_powers(), vec, offset=offset
            )
    if native.available():
        with PROVER_TIMER.region("srs_msm.from_mont"):
            scalars_std = native.fr_from_mont_arr(vec.a)
        if srs.powers_native is not None:
            with PROVER_TIMER.region("srs_msm.native"):
                # batch-affine accumulation (~1.8x the Jacobian path);
                # normalization is one batched inversion, amortized across
                # every commit/open against this SRS — store the result
                # back so a copying normalization is never re-paid
                srs.powers_native = native.g1_ensure_normalized(srs.powers_native)
                return native.g1_msm_affine_arr(
                    srs.powers_native[offset : offset + n], scalars_std
                )
    with PROVER_TIMER.region("srs_msm.python"):
        return msm(srs.powers_of_g[offset : offset + n], vec.to_ints())


@dataclass
class Randomness:
    """Blinding polynomials of one hiding commitment (and its shifted twin)."""

    blind: DensePoly
    shifted_blind: Optional[DensePoly] = None

    @staticmethod
    def empty(has_shift: bool = False) -> "Randomness":
        return Randomness(
            blind=DensePoly.zero(),
            shifted_blind=DensePoly.zero() if has_shift else None,
        )

    @staticmethod
    def rand(rng, has_shift: bool = False) -> "Randomness":
        blind = DensePoly([Fr.rand(rng).value for _ in range(HIDING_POLY_DEGREE + 1)])
        shifted = (
            DensePoly([Fr.rand(rng).value for _ in range(HIDING_POLY_DEGREE + 1)])
            if has_shift
            else None
        )
        return Randomness(blind=blind, shifted_blind=shifted)


def _gamma_msm(srs: UniversalSRS, coeffs: list[int]) -> G1Point:
    ensure(len(coeffs) <= len(srs.powers_of_gamma_g), "blinding degree exceeds γ-table")
    return msm(srs.powers_of_gamma_g[: len(coeffs)], coeffs)


def commit(srs: UniversalSRS, poly: DensePoly, degree_bound: Optional[int] = None,
           hiding_rng=None) -> Commitment | tuple[Commitment, Randomness]:
    """Commit to ``poly``; with ``hiding_rng`` the commitment is hiding and a
    ``(Commitment, Randomness)`` pair is returned (the prover must keep the
    randomness for ``batch_open``)."""
    ensure(poly.degree() <= srs.max_degree, "polynomial exceeds SRS degree")
    c = _srs_msm(srs, poly.vec) if not poly.is_zero() else G1Point.identity()
    rand = None
    if hiding_rng is not None:
        rand = Randomness.rand(hiding_rng, has_shift=degree_bound is not None)
        c = c.add(_gamma_msm(srs, rand.blind.coeffs))
    shifted = None
    if degree_bound is not None:
        ensure(poly.degree() <= degree_bound,
               f"polynomial degree {poly.degree()} exceeds bound {degree_bound}")
        shift = srs.max_degree - degree_bound
        shifted = (
            _srs_msm(srs, poly.vec, offset=shift)
            if not poly.is_zero()
            else G1Point.identity()
        )
        if rand is not None:
            shifted = shifted.add(_gamma_msm(srs, rand.shifted_blind.coeffs))
    comm = Commitment(comm=c, shifted_comm=shifted, degree_bound=degree_bound)
    return (comm, rand) if hiding_rng is not None else comm


def batch_open(
    srs: UniversalSRS,
    labeled: list[tuple[DensePoly, Commitment | None, int, Optional[int]]],
    point: int,
    xi: int,
    rands: Optional[list[Optional[Randomness]]] = None,
) -> tuple[G1Point, int]:
    """Combined witness for all polys (and shifted twins) at ``point``.

    Degree-bounded polys use ark marlin_pc's adjusted-commitment
    formulation (ark-poly-commit 0.3 ``marlin_pc``, consumed by the
    reference at src/marlin/mod.rs:12): the shifted twin opens
    X^s·(p(X) − v) at ``point`` with claimed value 0, whose quotient is
    X^s·q(X) with q = (p − v)/(X − point) — committed as an *offset* MSM
    over the top s..s+deg(q) SRS powers, never as a densified
    max_degree-length polynomial.  The verifier adjusts the shifted
    commitment by −v·τ^s·G (``batch_check`` / vk shift powers).

    The ξ-weight schedule (main term, then shifted term, per entry in
    order) is canonical and shared with ``batch_check``.

    Returns ``(W, random_v)``: the opening witness (G- and γ-components
    summed) and the combined blinding evaluation r(point) the verifier
    needs for the hiding check (0 when nothing is hiding)."""
    import numpy as np

    from .. import native
    from ..utils.observability import PROVER_TIMER

    base_terms: list[tuple[int, DensePoly]] = []
    shifted_terms: list[tuple[int, DensePoly, int]] = []  # (weight, poly, shift)
    blind_terms: list[tuple[int, DensePoly]] = []
    weight = 1
    for i, (poly, _comm, value, bound) in enumerate(labeled):
        rand = rands[i] if rands is not None else None
        if rand is not None and not rand.blind.is_zero():
            blind_terms.append((weight, rand.blind))
        base_terms.append((weight, poly))
        weight = weight * xi % P
        if bound is not None:
            shifted_terms.append((weight, poly, srs.max_degree - bound))
            if (rand is not None and rand.shifted_blind is not None
                    and not rand.shifted_blind.is_zero()):
                blind_terms.append((weight, rand.shifted_blind))
            weight = weight * xi % P

    with PROVER_TIMER.region("kzg.batch_open.combine"):
        if native.available():
            max_len = max((len(p.vec) for _, p in base_terms), default=0)
            acc = np.zeros((max(max_len, 1), 4), dtype="<u8")
            for w, poly in base_terms:
                if not poly.is_zero():
                    # axpy in the Montgomery domain: acc += Mont(c)·Mont(w)·R⁻¹
                    native.fr_axpy_arr(acc, poly.vec.a, FrVec.mont_scalar(w))
            combined = DensePoly(FrVec(acc))
        else:
            combined = DensePoly.zero()
            for w, poly in base_terms:
                combined = combined + poly.scale(w)
        combined_blind = DensePoly.zero()
        for w, blind in blind_terms:
            combined_blind = combined_blind + blind.scale(w)
    with PROVER_TIMER.region("kzg.batch_open.divide"):
        witness, _rem = combined.divide_by_linear(point)
    with PROVER_TIMER.region("kzg.batch_open.msm"):
        w_point = _srs_msm(srs, witness.vec) if not witness.is_zero() else G1Point.identity()
        for w, poly, shift in shifted_terms:
            quot, _rem = poly.divide_by_linear(point)
            if not quot.is_zero():
                w_point = w_point.add(_srs_msm(srs, quot.vec.scale(w), offset=shift))
    random_v = 0
    if not combined_blind.is_zero():
        random_v = combined_blind.evaluate(point)
        blind_witness, _ = combined_blind.divide_by_linear(point)
        if not blind_witness.is_zero():
            w_point = w_point.add(_gamma_msm(srs, blind_witness.coeffs))
    return w_point, random_v


def batch_check(
    srs_g: G1Point,
    h: G2Point,
    beta_h: G2Point,
    max_degree: int,
    labeled: list[tuple[None, Commitment, int, Optional[int]]],
    point: int,
    witness: G1Point,
    xi: int,
    gamma_g: Optional[G1Point] = None,
    random_v: int = 0,
    shift_powers: Optional[dict[int, G1Point]] = None,
) -> bool:
    """e(C_combined - v·G - r(z)·γG, H) == e(W, βH - zH).

    ``shift_powers`` maps each degree bound d to τ^(D−d)·G (carried in the
    verifying key, as in ark marlin_pc): the shifted commitment is adjusted
    to C' − v·τ^(D−d)·G and contributes claimed value 0 — the verifier
    counterpart of ``batch_open``'s offset-quotient formulation."""
    combined_c = G1Point.identity()
    combined_v = 0
    weight = 1
    for _poly, comm_obj, value, bound in labeled:
        ensure(comm_obj is not None, "batch check requires every commitment")
        combined_c = combined_c.add(comm_obj.comm.scalar_mul(weight))
        combined_v = (combined_v + weight * value) % P
        weight = weight * xi % P
        if bound is not None:
            ensure(comm_obj.shifted_comm is not None,
                   "degree-bounded commitment lacks its shifted part")
            ensure(shift_powers is not None and bound in shift_powers,
                   "degree-bound check requires the shift power in the verifying key")
            adjusted = comm_obj.shifted_comm
            if value % P:
                adjusted = adjusted.add(
                    shift_powers[bound].scalar_mul(value % P).neg()
                )
            combined_c = combined_c.add(adjusted.scalar_mul(weight))
            weight = weight * xi % P
    lhs = combined_c.add(srs_g.scalar_mul(combined_v).neg())
    if random_v % P:
        ensure(gamma_g is not None, "hiding check requires γG in the verifying key")
        lhs = lhs.add(gamma_g.scalar_mul(random_v % P).neg())
    # beta_h - z·h
    beta_minus_z_h = beta_h.add(h.scalar_mul(point).neg())
    result = multi_pairing([(lhs, h), (witness.neg(), beta_minus_z_h)])
    return result == Fq12.one()
