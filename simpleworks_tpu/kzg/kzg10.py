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
* batch check: e(Σ ξ^i C_i - [Σ ξ^i v_i]·G, H) == e(W, βH - zH)

Commitments are deterministic (no hiding randomness): these proofs attest
validity, not zero-knowledge — the zk hiding layer is a planned extension
(documented deviation from MarlinKZG's hiding mode).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from ..curves.bls12_377 import G1Point, G2Point
from ..curves.pairing import multi_pairing
from ..curves.fq_tower import Fq12
from ..fields.bls12_377 import Fr, FR_MODULUS
from ..poly.dense import DensePoly
from .msm import FixedBaseMSM, msm

P = FR_MODULUS


class UniversalSRS:
    """Powers of tau: [G, τG, τ²G, ...], H, τH.

    Primary storage is the native [N, 18]-u64 Jacobian array when the C++
    runtime built it (one conversion, reused by every commit MSM); the
    Python point list is materialized lazily otherwise.
    """

    def __init__(self, powers_of_g=None, h=None, beta_h=None, powers_native=None):
        self._powers_list = powers_of_g
        self.powers_native = powers_native
        self.h = h
        self.beta_h = beta_h

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

    def first_power(self) -> G1Point:
        if self._powers_list is not None:
            return self._powers_list[0]
        from ..native import _points_from_native

        return _points_from_native(self.powers_native[:1])[0]

    @property
    def max_degree(self) -> int:
        return self.num_powers - 1


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


def setup(max_degree: int, rng) -> UniversalSRS:
    """Sample τ and build the powers table (fixed-base windowed muls).

    The group generators are the pinned curve generators (arkworks samples
    random group elements here; semantics identical, vectors differ)."""
    tau = Fr.rand(rng).value
    g = G1Point.generator()
    scalars = []
    cur = 1
    for _ in range(max_degree + 1):
        scalars.append(cur)
        cur = cur * tau % P
    from .. import native

    h = G2Point.generator()
    beta_h = h.scalar_mul(tau)
    if native.available():
        powers_native = native.g1_fixed_base_raw(g, scalars)
        return UniversalSRS(h=h, beta_h=beta_h, powers_native=powers_native)
    table = FixedBaseMSM(g, window_bits=8)
    powers = [table.mul(s) for s in scalars]
    return UniversalSRS(powers_of_g=powers, h=h, beta_h=beta_h)


def _srs_msm(srs: UniversalSRS, coeffs: list[int], offset: int = 0) -> G1Point:
    """MSM of coefficients against SRS powers [offset, offset+len)."""
    if not coeffs:
        return G1Point.identity()
    if srs.powers_native is not None:
        from ..native import available as native_available, g1_msm_raw

        if native_available():
            return g1_msm_raw(
                srs.powers_native[offset : offset + len(coeffs)], coeffs
            )
    return msm(srs.powers_of_g[offset : offset + len(coeffs)], coeffs)


def commit(srs: UniversalSRS, poly: DensePoly, degree_bound: Optional[int] = None) -> Commitment:
    assert poly.degree() <= srs.max_degree, "polynomial exceeds SRS degree"
    c = _srs_msm(srs, poly.coeffs) if not poly.is_zero() else G1Point.identity()
    shifted = None
    if degree_bound is not None:
        assert poly.degree() <= degree_bound, (poly.degree(), degree_bound)
        shift = srs.max_degree - degree_bound
        shifted = (
            _srs_msm(srs, poly.coeffs, offset=shift)
            if not poly.is_zero()
            else G1Point.identity()
        )
    return Commitment(comm=c, shifted_comm=shifted, degree_bound=degree_bound)


def _batch_terms(labeled: list[tuple[DensePoly | None, Commitment | None, int, Optional[int]]],
                 max_degree: int, point: int, xi: int):
    """Yield (poly, comm, value) triples including shifted twins, with the
    ξ-power weights, in a canonical order shared by prover and verifier.

    ``labeled`` entries: (poly or None, comm or None, claimed value, bound).
    """
    weight = 1
    for poly, comm_obj, value, bound in labeled:
        yield weight, poly, (comm_obj.comm if comm_obj else None), value
        weight = weight * xi % P
        if bound is not None:
            shift = max_degree - bound
            shifted_value = pow(point, shift, P) * value % P
            shifted_poly = poly.shift_up(shift) if poly is not None else None
            yield weight, shifted_poly, (comm_obj.shifted_comm if comm_obj else None), shifted_value
            weight = weight * xi % P


def batch_open(
    srs: UniversalSRS,
    labeled: list[tuple[DensePoly, Commitment | None, int, Optional[int]]],
    point: int,
    xi: int,
) -> G1Point:
    """Combined witness for all polys (and shifted twins) at ``point``."""
    terms = list(_batch_terms(labeled, srs.max_degree, point, xi))
    total = sum(len(p.coeffs) for _, p, _, _ in terms)
    if total >= 4096:
        from ..native import available as native_available, fr_combine

        if native_available():
            combined = DensePoly(
                fr_combine([(p.coeffs, w) for w, p, _, _ in terms if not p.is_zero()])
            )
        else:
            combined = DensePoly.zero()
            for weight, poly, _comm, _value in terms:
                combined = combined + poly.scale(weight)
    else:
        combined = DensePoly.zero()
        for weight, poly, _comm, _value in terms:
            combined = combined + poly.scale(weight)
    witness, _rem = combined.divide_by_linear(point)
    if witness.is_zero():
        return G1Point.identity()
    return _srs_msm(srs, witness.coeffs)


def batch_check(
    srs_g: G1Point,
    h: G2Point,
    beta_h: G2Point,
    max_degree: int,
    labeled: list[tuple[None, Commitment, int, Optional[int]]],
    point: int,
    witness: G1Point,
    xi: int,
) -> bool:
    """e(C_combined - v·G, H) == e(W, βH - zH)."""
    combined_c = G1Point.identity()
    combined_v = 0
    for weight, _poly, comm, value in _batch_terms(labeled, max_degree, point, xi):
        assert comm is not None
        combined_c = combined_c.add(comm.scalar_mul(weight))
        combined_v = (combined_v + weight * value) % P
    lhs = combined_c.add(srs_g.scalar_mul(combined_v).neg())
    # beta_h - z·h
    beta_minus_z_h = beta_h.add(h.scalar_mul(point).neg())
    result = multi_pairing([(lhs, h), (witness.neg(), beta_minus_z_h)])
    return result == Fq12.one()
