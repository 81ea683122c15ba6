"""Marlin AHP: indexer, prover and verifier equations.

The algebraic holographic proof underlying the reference's proof system
(``ark-marlin``, Entropy1729 fork — SURVEY.md §2.3 'Marlin AHP').  Built
from the Marlin paper with ark-marlin's two-sumcheck R1CS shape:

* **outer (lin-check) sumcheck over H**: for random α, η_A, η_B, η_C
    q₁(X) = u_H(α,X)·(η_A ẑ_A + η_B ẑ_B + η_C ẑ_A ẑ_B)(X) − t(X)·ẑ(X)
  has zero sum over H, decomposed as q₁ = h₁·v_H + X·g₁ with deg g₁ ≤ n−2;
  t(X) interpolates  ι ↦ Σ_M η_M Σ_{κ} u_H(α,κ)·M[κ][ι]  over H.
* **inner (matrix) sumcheck over K**: proves σ₂ = t(β) against the indexed
  row/col/val/row_col polynomials via the rational sumcheck
    σ₂ = Σ_{k∈K} a(k)/b(k),  b̂_M = αβ − α·col_M − β·row_M + row_col_M,
    a = v_H(α)v_H(β)·Σ_M η_M val_M·Π_{N≠M} b̂_N,
  with f̂ = X·g₂ + σ₂/m and  a − b̂_A b̂_B b̂_C·f̂ = h₂·v_K  (deg g₂ ≤ m−2).
  ``row_col`` interpolates row·col on K (committed separately, as in
  ark-marlin 0.3): b̂_M has degree m−1 instead of 2m−2, which caps the
  inner-sumcheck degrees at 3m−3 (vs 6m−6 with the literal product) and
  makes b̂(γ) LINEAR in the opened evaluations.

``val`` stores val·col/n (the u_H(col,col) = n/col normalizer folded in
at indexing time — the choice that makes the rational sum equal the
outer sumcheck's t(β)).  Public inputs are interpolated over the
subgroup X ≤ H of order ℓ = 2^k (X = ⟨h^{n/ℓ}⟩), with ẑ = ŵ·v_X + x̂,
v_X = X^ℓ − 1 sparse; variable columns map to H via ark-marlin's
``reindex_by_subdomain`` stride layout.

**Zero-knowledge** (matching ark-marlin's zk strategy): round 1 randomizes
ŵ, ẑ_A, ẑ_B by adding rᵢ·v_H (rᵢ random constants — vanishing on H, so the
sumcheck identities are untouched while any single off-H evaluation is
uniform), and commits a mask polynomial s(X) of degree 3n−1 with zero
H-sum which is added into the outer sumcheck q₁.  Together with hiding KZG
commitments (:mod:`simpleworks_tpu.kzg.kzg10`) the opened evaluations and
commitments reveal nothing about the witness.

**Data plane**: every prover-side vector is an FrVec numpy limb array
(native C++ batch kernels, device NTTs through the domain's routed
transforms) — no Python-bigint hot loops.  Round 3 evaluates the inner
numerator a − b·f̂ on one 8m domain instead of chaining coefficient-space
polynomial products.

Deviations from ark-marlin, documented: self-consistent (not
byte-compatible) transcripts — see docs/compatibility.md.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..errors import ensure
from ..fields.bls12_377 import FR_MODULUS
from ..fields.frvec import FrVec
from ..poly.dense import DensePoly
from ..poly.domain import Radix2Domain

P = FR_MODULUS


def batch_inverse(values: list[int]) -> list[int]:
    """Batch inversion of standard-form ints (zeros map to zero)."""
    return FrVec.from_ints(values).inv().to_ints()


def next_pow2(x: int) -> int:
    n = 1
    while n < x:
        n <<= 1
    return n


def _const_vec(c: int, n: int) -> FrVec:
    out = FrVec.zeros(n)
    out.a[:] = FrVec.mont_scalar(c)[0]
    return out


@dataclass
class MatrixArithmetization:
    """Indexed polynomials of one R1CS matrix over domain K
    (ark-marlin 0.3's 4-poly vocabulary: row, col, val, row_col)."""

    row_poly: DensePoly       # K -> H elements
    col_poly: DensePoly
    val_poly: DensePoly       # val · row · col / n²  (u_H diagonal normalizers)
    row_col_poly: DensePoly   # interpolates row·col on K
    row_evals: FrVec          # evaluations on K (prover-side)
    col_evals: FrVec
    val_evals: FrVec
    row_col_evals: FrVec


@dataclass
class IndexInfo:
    num_instance_padded: int  # ℓ (power of two)
    num_instance: int
    domain_h_size: int        # n
    domain_k_size: int        # m
    max_degree: int
    # ark-marlin's IndexInfo field set (num_variables / num_constraints /
    # num_non_zero — the serde + Fiat-Shamir vocabulary, ark-marlin 0.3
    # indexer.rs via reference src/marlin/serialization.rs:14-26).  The
    # domain sizes above are derived: n = next_pow2(max(nc, nv, 2)),
    # m = next_pow2(max(nnz, 2)).
    num_variables: int = 0    # ℓ + |witness| (the formatted column count)
    num_constraints: int = 0
    num_non_zero: int = 0


@dataclass
class Index:
    info: IndexInfo
    matrices: list[MatrixArithmetization]  # [A, B, C]


def max_degree_for(num_constraints: int, num_variables: int, num_non_zero: int) -> int:
    """SRS degree needed: max(3n−1 outer incl. zk mask, 3m−3 inner).

    The outer bound is 3n−1 (not 3n−3) because the zk randomization lifts
    deg ẑ_A·ẑ_B to 2n and the mask polynomial spans the full q₁ degree.
    The inner bound is 3m−3 because b̂_M is the degree-(m−1) row_col
    linearization, not the degree-(2m−2) literal product (module doc)."""
    n = next_pow2(max(num_constraints, num_variables, 2))
    m = next_pow2(max(num_non_zero, 2))
    return max(3 * n - 1, 3 * m - 3)


def _map_columns(cols, num_instance: int, ell: int, n: int) -> np.ndarray:
    """R1CS columns -> H indices, ark-marlin's ``reindex_by_subdomain``
    stride layout: instance variable j sits on the subgroup X = ⟨h^{n/ℓ}⟩
    (H index j·(n/ℓ)); witness variable i fills the non-X slots in order
    (block b = i//(ratio−1) at offset i%(ratio−1)+1).  Vectorized."""
    cols = np.asarray(cols, dtype=np.int64)
    ratio = n // ell
    if ratio == 1:
        # every H slot is an X slot: only possible with zero witnesses
        ensure(int((cols >= num_instance).sum()) == 0,
               "no witness slots when ℓ == n")
        return cols.astype(np.uint32)
    w = cols - num_instance  # witness ordinal (valid where cols >= num_instance)
    w_idx = (w // (ratio - 1)) * ratio + (w % (ratio - 1)) + 1
    return np.where(cols < num_instance, cols * ratio, w_idx).astype(np.uint32)


def index_matrices(cs, raw=None) -> Index:
    """Arithmetize the constraint system's A/B/C (the Marlin indexer core).

    ``raw``: pre-computed ``cs.to_matrices()`` output (the facade computes
    it once for its cache fingerprint and passes it through)."""
    num_instance = cs.num_instance_variables
    ell = next_pow2(num_instance)
    num_cols_h = ell + cs.num_witness_variables
    n = next_pow2(max(cs.num_constraints, num_cols_h, 2))
    domain_h = Radix2Domain(n)
    if raw is None:
        raw = cs.to_matrices()
    m = next_pow2(max(max((len(r[0]) for r in raw), default=1), 2))
    domain_k = Radix2Domain(m)
    n_inv = pow(n, P - 2, P)
    h_elems = domain_h.elements_vec()

    matrices = []
    one_mont = FrVec.mont_scalar(1)[0]
    for rows, cols, coeffs in raw:
        nnz = len(rows)
        rows_np = np.asarray(rows, dtype=np.uint32)
        cols_h = _map_columns(cols, num_instance, ell, n)
        # pad to m with val=0, row=col=1 (any H element keeps b(k) nonzero)
        row_evals = FrVec.zeros(m)
        col_evals = FrVec.zeros(m)
        row_evals.a[:] = one_mont
        col_evals.a[:] = one_mont
        row_evals.a[:nnz] = h_elems.a[rows_np]
        col_evals.a[:nnz] = h_elems.a[cols_h]
        # val normalization val·col/n (= val/u_H(col,col) with u_H(h,h) =
        # n/h): the unique choice making Σ_K scale·val/b(k) = t(β) for the
        # unnormalized-u_H t the outer sumcheck uses (verified against the
        # rational-sumcheck identity; ark-marlin's exact per-entry
        # convention is unverifiable here — docs/compatibility.md)
        vals = FrVec.from_ints(coeffs) * FrVec(col_evals.a[:nnz].copy())
        val_evals = vals.scale(n_inv).pad_to(m)
        row_col_evals = row_evals * col_evals
        matrices.append(
            MatrixArithmetization(
                row_poly=DensePoly(domain_k.ifft_vec(row_evals)),
                col_poly=DensePoly(domain_k.ifft_vec(col_evals)),
                val_poly=DensePoly(domain_k.ifft_vec(val_evals)),
                row_col_poly=DensePoly(domain_k.ifft_vec(row_col_evals)),
                row_evals=row_evals,
                col_evals=col_evals,
                val_evals=val_evals,
                row_col_evals=row_col_evals,
            )
        )
    info = IndexInfo(
        num_instance_padded=ell,
        num_instance=num_instance,
        domain_h_size=n,
        domain_k_size=m,
        max_degree=max(3 * n - 1, 3 * m - 3),
        num_variables=num_cols_h,
        num_constraints=cs.num_constraints,
        num_non_zero=max((len(r[0]) for r in raw), default=1),
    )
    return Index(info=info, matrices=matrices)


# ---------------------------------------------------------------- prover ----


@dataclass
class ProverRound1:
    w_poly: DensePoly
    z_a_poly: DensePoly
    z_b_poly: DensePoly
    z_poly: DensePoly  # full ẑ (kept for round 2)
    z_vector: FrVec


def x_poly_from_instance(instance: list[int], ell: int) -> DensePoly:
    """Interpolate x̂ over the order-ℓ subgroup X = ⟨h^{n/ℓ}⟩ = ⟨g_ℓ⟩
    (instance j sits at g_ℓ^j — the reindex_by_subdomain layout).  One
    size-ℓ iNTT: O(ℓ log ℓ), replacing the O(ℓ²) arbitrary-point
    interpolation the power-prefix layout forced (VERDICT r4 weak #7)."""
    values = FrVec.from_ints(list(instance)).pad_to(ell)
    return DensePoly(Radix2Domain(ell).ifft_vec(values))


def vanishing_x_poly(ell: int) -> DensePoly:
    """v_X(X) = X^ℓ − 1 (X is a subgroup, so the vanishing poly is sparse)."""
    return DensePoly([(P - 1)] + [0] * (ell - 1) + [1])


def prover_round1(index: Index, cs, zk_rands: tuple[int, int, int] | None = None) -> ProverRound1:
    """Witness polynomials; with ``zk_rands = (r_w, r_a, r_b)`` each poly is
    randomized by +r·v_H (vanishing on H — identities over H unchanged,
    single off-H evaluations become uniform; ark-marlin's zk bound b=1)."""
    info = index.info
    n = info.domain_h_size
    domain_h = Radix2Domain(n)
    ell = info.num_instance_padded

    # z over H, reindex_by_subdomain layout: instance j at H index
    # j·(n/ℓ) (the subgroup X), witnesses in the non-X slots in order
    num_vars = info.num_instance + len(cs.witness_assignment)
    var_idx = _map_columns(
        np.arange(num_vars, dtype=np.int64), info.num_instance, ell, n
    )
    values = FrVec.from_ints(
        list(cs.instance_assignment) + list(cs.witness_assignment)
    )
    z = FrVec.zeros(n)
    z.a[var_idx] = values.a

    raw = cs.to_matrices()
    za_zb = []
    for rows, cols, coeffs in raw[:2]:
        rows_np = np.asarray(rows, dtype=np.uint32)
        cols_h = _map_columns(cols, info.num_instance, ell, n)
        za_zb.append(FrVec.spmv(rows_np, cols_h, FrVec.from_ints(coeffs), z, n))
    z_a_evals, z_b_evals = za_zb

    z_poly = DensePoly(domain_h.ifft_vec(z))
    z_a_poly = DensePoly(domain_h.ifft_vec(z_a_evals))
    z_b_poly = DensePoly(domain_h.ifft_vec(z_b_evals))

    # ŵ = (ẑ − x̂) / v_X — v_X = X^ℓ − 1 is sparse, so the exact division
    # is one O(n) vanishing-poly fold (no coset FFTs)
    x_poly = x_poly_from_instance(cs.instance_assignment, ell)
    v_x = vanishing_x_poly(ell)
    num = z_poly - x_poly
    w_vec, rem = Radix2Domain(ell).divide_by_vanishing_vec(num.vec)
    ensure(rem.is_zero(), "ẑ − x̂ does not vanish on X (bad z layout?)")
    w_poly = DensePoly(w_vec)

    if zk_rands is not None:
        r_w, r_a, r_b = zk_rands
        w_poly = w_poly + DensePoly([r_w]).mul_by_vanishing(domain_h)
        z_a_poly = z_a_poly + DensePoly([r_a]).mul_by_vanishing(domain_h)
        z_b_poly = z_b_poly + DensePoly([r_b]).mul_by_vanishing(domain_h)
        # keep ẑ = ŵ·v_X + x̂ consistent with the randomized ŵ
        z_poly = z_poly + v_x.scale(r_w).mul_by_vanishing(domain_h)

    return ProverRound1(w_poly=w_poly, z_a_poly=z_a_poly, z_b_poly=z_b_poly,
                        z_poly=z_poly, z_vector=z)


def sample_mask_poly(info: IndexInfo, rng) -> DensePoly:
    """Random s(X) of degree 3n−1 with Σ_{κ∈H} s(κ) = 0 (the outer-sumcheck
    zk mask; ark-marlin's ``mask_poly``).  Σ_H X^k = 0 unless n | k, so the
    H-sum is n·Σ_j coeffs[j·n]; zero it by fixing coeffs[0]."""
    from ..fields.bls12_377 import Fr

    n = info.domain_h_size
    coeffs = Fr.rand_vec(rng, 3 * n)
    stride_sum = sum(coeffs[j] for j in range(n, 3 * n, n)) % P
    coeffs[0] = (-stride_sum) % P
    return DensePoly(coeffs)


@dataclass
class ProverRound2:
    t_poly: DensePoly
    g_1_poly: DensePoly
    h_1_poly: DensePoly


def prover_round2(index: Index, cs, r1: ProverRound1, alpha: int, etas: list[int],
                  mask_poly: DensePoly | None = None) -> ProverRound2:
    info = index.info
    n = info.domain_h_size
    domain_h = Radix2Domain(n)
    v_h_alpha = domain_h.evaluate_vanishing(alpha)

    # u_H(α, h^i) = v_H(α) / (α − h^i) for all i (batch inverted)
    h_elems = domain_h.elements_vec()
    u_alpha = h_elems.rsub_scalar(alpha).inv().scale(v_h_alpha)

    # t evals over H: t[colH] += η_M · u_H(α, rowH) · val
    t_evals = FrVec.zeros(n)
    raw = cs.to_matrices()
    for eta, (rows, cols, coeffs) in zip(etas, raw):
        rows_np = np.asarray(rows, dtype=np.uint32)
        cols_h = _map_columns(cols, info.num_instance, info.num_instance_padded, n)
        contrib = FrVec.spmv(cols_h, rows_np, FrVec.from_ints(coeffs),
                             u_alpha.scale(eta), n)
        t_evals = t_evals + contrib
    t_poly = DensePoly(domain_h.ifft_vec(t_evals))

    # q1 on an extended domain (deg q1 ≤ 3n−1 incl. the zk mask)
    domain_q = Radix2Domain(4 * n)
    za_e = domain_q.fft_vec(r1.z_a_poly.vec)
    zb_e = domain_q.fft_vec(r1.z_b_poly.vec)
    z_e = domain_q.fft_vec(r1.z_poly.vec)
    t_e = domain_q.fft_vec(t_poly.vec)
    # u_H(α, X) on the extended domain (direct rational formula):
    #   u = (v_H(α) − v_H(x)) / (α − x);  v_H(x) = x^n − 1 = (g_q^n)^i − 1
    q_elems = domain_q.elements_vec()
    x_pow_n = FrVec.powers(pow(domain_q.group_gen, n, P), 4 * n)
    u_num = x_pow_n.rsub_scalar((v_h_alpha + 1) % P)  # v_H(α) − (x^n − 1)
    u_e = u_num * q_elems.rsub_scalar(alpha).inv()

    eta_a, eta_b, eta_c = etas
    # η_A ẑ_A + η_B ẑ_B + η_C ẑ_A ẑ_B  =  ẑ_A·(η_A + η_C ẑ_B) + η_B ẑ_B
    lin = (za_e * (zb_e.scale(eta_c) + _const_vec(eta_a, 4 * n))) + zb_e.scale(eta_b)
    q1_e = u_e * lin - t_e * z_e
    if mask_poly is not None:
        q1_e = q1_e + domain_q.fft_vec(mask_poly.vec)
    q1 = domain_q.ifft_vec(q1_e)
    h1_vec, rem = domain_h.divide_by_vanishing_vec(q1)
    rem = rem.pad_to(n)
    ensure(rem[0] == 0, "outer sumcheck: non-zero H-sum (unsatisfied circuit?)")
    g_1 = DensePoly(rem[1:])
    return ProverRound2(t_poly=t_poly, g_1_poly=g_1, h_1_poly=DensePoly(h1_vec))


@dataclass
class ProverRound3:
    g_2_poly: DensePoly
    h_2_poly: DensePoly
    sigma_2: int


def prover_round3(index: Index, alpha: int, beta: int, etas: list[int]) -> ProverRound3:
    info = index.info
    n, m = info.domain_h_size, info.domain_k_size
    domain_h = Radix2Domain(n)
    domain_k = Radix2Domain(m)
    v_h_alpha = domain_h.evaluate_vanishing(alpha)
    v_h_beta = domain_h.evaluate_vanishing(beta)
    scale = v_h_alpha * v_h_beta % P

    # b_M on K: (α − row_M)(β − col_M); f = scale · Σ_M η_M val'_M / b_M
    b_on_k = [
        mat.row_evals.rsub_scalar(alpha) * mat.col_evals.rsub_scalar(beta)
        for mat in index.matrices
    ]
    f_evals = FrVec.zeros(m)
    for eta, mat, b in zip(etas, index.matrices, b_on_k):
        f_evals = (mat.val_evals.scale(eta) * b.inv()) + f_evals
    f_evals = f_evals.scale(scale)
    sigma_2 = f_evals.sum()
    f_poly = DensePoly(domain_k.ifft_vec(f_evals))
    f0 = f_poly.vec[0] if not f_poly.is_zero() else 0
    ensure(f0 == sigma_2 * pow(m, P - 2, P) % P,
           "inner sumcheck: f̂ constant term != σ₂/m")
    g_2 = DensePoly(f_poly.vec[1:]) if len(f_poly.vec) > 1 else DensePoly.zero()

    # numerator N = a − b̂_A b̂_B b̂_C·f̂ with the degree-(m−1) row_col
    # linearizations b̂_M = αβ − α·col_M − β·row_M + row_col_M (== b_M on
    # K, so f/σ₂ above are unchanged): deg N ≤ 4m−4, evaluated once on a
    # 4m domain, then a single iNTT + divide-by-v_K.  Halves every
    # transform vs the literal-product b (deg 6m−6 on an 8m domain).
    domain_e = Radix2Domain(next_pow2(max(4 * m - 3, 2)))
    alpha_beta = alpha * beta % P
    b_e = []
    vals_e = []
    for mat in index.matrices:
        r_e = domain_e.fft_vec(mat.row_poly.vec)
        c_e = domain_e.fft_vec(mat.col_poly.vec)
        rc_e = domain_e.fft_vec(mat.row_col_poly.vec)
        b_hat = (
            rc_e - c_e.scale(alpha) - r_e.scale(beta)
        ) + _const_vec(alpha_beta, len(rc_e))
        b_e.append(b_hat)
        vals_e.append(domain_e.fft_vec(mat.val_poly.vec))
    a_e = (
        vals_e[0].scale(etas[0] * scale % P) * b_e[1] * b_e[2]
        + vals_e[1].scale(etas[1] * scale % P) * b_e[0] * b_e[2]
        + vals_e[2].scale(etas[2] * scale % P) * b_e[0] * b_e[1]
    )
    f_e = domain_e.fft_vec(f_poly.vec)
    num_e = a_e - b_e[0] * b_e[1] * b_e[2] * f_e
    numerator = domain_e.ifft_vec(num_e)
    h2_vec, rem = domain_k.divide_by_vanishing_vec(numerator)
    ensure(rem.is_zero(), "inner sumcheck: division remainder non-zero")
    return ProverRound3(g_2_poly=g_2, h_2_poly=DensePoly(h2_vec), sigma_2=sigma_2)


# ---------------------------------------------------------------- verifier ----


def verify_outer_sumcheck(
    info: IndexInfo,
    instance: list[int],
    alpha: int,
    etas: list[int],
    beta: int,
    evals: dict[str, int],
) -> bool:
    n = info.domain_h_size
    domain_h = Radix2Domain(n)
    v_h_alpha = domain_h.evaluate_vanishing(alpha)
    v_h_beta = domain_h.evaluate_vanishing(beta)
    u_ab = (v_h_alpha - v_h_beta) * pow((alpha - beta) % P, P - 2, P) % P
    # ℓ derived from the instance as given (ark re-derives the input
    # domain from the passed public input; a wrong input count makes x̂
    # inconsistent with the proof and the equation below rejects)
    ell = next_pow2(max(len(instance), 1))
    x_poly = x_poly_from_instance(instance, ell)
    v_x_beta = (pow(beta, ell, P) - 1) % P  # v_X = X^ℓ − 1
    z_beta = (evals["w"] * v_x_beta + x_poly.evaluate(beta)) % P
    eta_a, eta_b, eta_c = etas
    lhs = (
        evals.get("mask", 0)
        + u_ab
        * ((eta_a * evals["z_a"] + eta_b * evals["z_b"] + eta_c * evals["z_a"] % P * evals["z_b"]) % P)
        - evals["t"] * z_beta
    ) % P
    rhs = (evals["h_1"] * v_h_beta + beta * evals["g_1"]) % P
    return lhs == rhs


def verify_inner_sumcheck(
    info: IndexInfo,
    alpha: int,
    beta: int,
    etas: list[int],
    gamma: int,
    sigma_2: int,
    evals: dict[str, int],
) -> bool:
    n, m = info.domain_h_size, info.domain_k_size
    domain_h = Radix2Domain(n)
    domain_k = Radix2Domain(m)
    scale = domain_h.evaluate_vanishing(alpha) * domain_h.evaluate_vanishing(beta) % P
    names = ["a", "b", "c"]
    # b̂_M(γ) is LINEAR in the opened evaluations (the committed row_col
    # replaces the off-K product row(γ)·col(γ) — ark-marlin's formulation)
    b_vals = [
        (alpha * beta - alpha * evals[f"col_{nm}"] - beta * evals[f"row_{nm}"]
         + evals[f"row_col_{nm}"]) % P
        for nm in names
    ]
    a_gamma = 0
    for i, nm in enumerate(names):
        term = etas[i] * evals[f"val_{nm}"] % P * scale % P
        for j in range(3):
            if j != i:
                term = term * b_vals[j] % P
        a_gamma = (a_gamma + term) % P
    b_gamma = b_vals[0] * b_vals[1] % P * b_vals[2] % P
    f_gamma = (gamma * evals["g_2"] + sigma_2 * pow(m, P - 2, P)) % P
    lhs = (a_gamma - b_gamma * f_gamma) % P
    rhs = evals["h_2"] * domain_k.evaluate_vanishing(gamma) % P
    return lhs == rhs
