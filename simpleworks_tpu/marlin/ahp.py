"""Marlin AHP: indexer, prover and verifier equations.

The algebraic holographic proof underlying the reference's proof system
(``ark-marlin``, Entropy1729 fork — SURVEY.md §2.3 'Marlin AHP').  Built
from the Marlin paper with ark-marlin's two-sumcheck R1CS shape:

* **outer (lin-check) sumcheck over H**: for random α, η_A, η_B, η_C
    q₁(X) = u_H(α,X)·(η_A ẑ_A + η_B ẑ_B + η_C ẑ_A ẑ_B)(X) − t(X)·ẑ(X)
  has zero sum over H, decomposed as q₁ = h₁·v_H + X·g₁ with deg g₁ ≤ n−2;
  t(X) interpolates  ι ↦ Σ_M η_M Σ_{κ} u_H(α,κ)·M[κ][ι]  over H.
* **inner (matrix) sumcheck over K**: proves σ₂ = t(β) against the indexed
  row/col/val polynomials via the rational sumcheck
    σ₂ = Σ_{k∈K} a(k)/b(k),  b = Π_M (α−row_M)(β−col_M),
    a = v_H(α)v_H(β)·Σ_M η_M val'_M·Π_{N≠M}(α−row_N)(β−col_N),
  with f̂ = X·g₂ + σ₂/m and  a − b·f̂ = h₂·v_K  (deg g₂ ≤ m−2).

``val'`` stores val·col/n (the Lagrange-kernel normalizer folded in at
indexing time).  Public inputs are interpolated over the first ℓ = 2^k
elements of H, with ẑ = ŵ·v_X + x̂.

**Zero-knowledge** (matching ark-marlin's zk strategy): round 1 randomizes
ŵ, ẑ_A, ẑ_B by adding rᵢ·v_H (rᵢ random constants — vanishing on H, so the
sumcheck identities are untouched while any single off-H evaluation is
uniform), and commits a mask polynomial s(X) of degree 3n−1 with zero
H-sum which is added into the outer sumcheck q₁.  Together with hiding KZG
commitments (:mod:`simpleworks_tpu.kzg.kzg10`) the opened evaluations and
commitments reveal nothing about the witness.

Deviations from ark-marlin, documented: x̂ over a power-prefix of H instead
of a subgroup; self-consistent (not byte-compatible) transcripts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..errors import ensure
from ..fields.bls12_377 import FR_MODULUS
from ..poly.dense import DensePoly
from ..poly.domain import Radix2Domain

P = FR_MODULUS


def batch_inverse(values: list[int]) -> list[int]:
    """Montgomery batch inversion (all values nonzero)."""
    n = len(values)
    if n == 0:
        return []
    prefix = [1] * (n + 1)
    for i, v in enumerate(values):
        prefix[i + 1] = prefix[i] * v % P
    inv_all = pow(prefix[n], P - 2, P)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = prefix[i] * inv_all % P
        inv_all = inv_all * values[i] % P
    return out


def next_pow2(x: int) -> int:
    n = 1
    while n < x:
        n <<= 1
    return n


@dataclass
class MatrixArithmetization:
    """Indexed polynomials of one R1CS matrix over domain K."""

    row_poly: DensePoly   # K -> H elements
    col_poly: DensePoly
    val_poly: DensePoly   # val · col / n  (normalizer folded in)
    row_evals: list[int]  # evaluations on K (prover-side)
    col_evals: list[int]
    val_evals: list[int]


@dataclass
class IndexInfo:
    num_instance_padded: int  # ℓ (power of two)
    num_instance: int
    domain_h_size: int        # n
    domain_k_size: int        # m
    max_degree: int


@dataclass
class Index:
    info: IndexInfo
    matrices: list[MatrixArithmetization]  # [A, B, C]


def max_degree_for(num_constraints: int, num_variables: int, num_non_zero: int) -> int:
    """SRS degree needed: max(3n−1 outer incl. zk mask, 6m−6 inner).

    The outer bound is 3n−1 (not 3n−3) because the zk randomization lifts
    deg ẑ_A·ẑ_B to 2n and the mask polynomial spans the full q₁ degree."""
    n = next_pow2(max(num_constraints, num_variables, 2))
    m = next_pow2(max(num_non_zero, 2))
    return max(3 * n - 1, 6 * m - 6)


def _map_column(col: int, num_instance: int, ell: int) -> int:
    """R1CS column -> H index: instance stays, witnesses shift past the
    padded instance block."""
    return col if col < num_instance else ell + (col - num_instance)


def index_matrices(cs) -> Index:
    """Arithmetize the constraint system's A/B/C (the Marlin indexer core)."""
    num_instance = cs.num_instance_variables
    ell = next_pow2(num_instance)
    num_cols_h = ell + cs.num_witness_variables
    n = next_pow2(max(cs.num_constraints, num_cols_h, 2))
    domain_h = Radix2Domain(n)
    raw = cs.to_matrices()
    m = next_pow2(max(max((len(r[0]) for r in raw), default=1), 2))
    domain_k = Radix2Domain(m)
    n_inv = pow(n, P - 2, P)

    matrices = []
    h_elems = domain_h.elements()
    for rows, cols, coeffs in raw:
        row_evals, col_evals, val_evals = [], [], []
        for r, c, v in zip(rows, cols, coeffs):
            row_evals.append(h_elems[r])
            col_elem = h_elems[_map_column(c, num_instance, ell)]
            col_evals.append(col_elem)
            val_evals.append(v * col_elem % P * n_inv % P)
        # pad to m with val=0, row=col=1 (any H element keeps b(k) nonzero)
        pad = m - len(row_evals)
        row_evals += [1] * pad
        col_evals += [1] * pad
        val_evals += [0] * pad
        matrices.append(
            MatrixArithmetization(
                row_poly=DensePoly(domain_k.ifft(row_evals)),
                col_poly=DensePoly(domain_k.ifft(col_evals)),
                val_poly=DensePoly(domain_k.ifft(val_evals)),
                row_evals=row_evals,
                col_evals=col_evals,
                val_evals=val_evals,
            )
        )
    nnz = max(len(r[0]) for r in raw) if any(raw[i][0] for i in range(3)) else 1
    info = IndexInfo(
        num_instance_padded=ell,
        num_instance=num_instance,
        domain_h_size=n,
        domain_k_size=m,
        max_degree=max(3 * n - 1, 6 * m - 6),
    )
    return Index(info=info, matrices=matrices)


# ---------------------------------------------------------------- prover ----


@dataclass
class ProverRound1:
    w_poly: DensePoly
    z_a_poly: DensePoly
    z_b_poly: DensePoly
    z_poly: DensePoly  # full ẑ (kept for round 2)
    z_vector: list[int]


def x_padding_domain(info: IndexInfo, domain_h: Radix2Domain) -> list[int]:
    """The interpolation points of the public input: first ℓ powers of h."""
    return domain_h.elements()[: info.num_instance_padded]


def x_poly_from_instance(instance: list[int], info: IndexInfo, domain_h: Radix2Domain) -> DensePoly:
    """Interpolate x̂ over the first ℓ elements of H (small ℓ; O(ℓ²))."""
    pts = x_padding_domain(info, domain_h)
    values = list(instance) + [0] * (info.num_instance_padded - len(instance))
    # Lagrange interpolation over arbitrary points
    poly = DensePoly.zero()
    for i, (xi, yi) in enumerate(zip(pts, values)):
        if yi == 0:
            continue
        num = DensePoly([1])
        denom = 1
        for j, xj in enumerate(pts):
            if j == i:
                continue
            num = num * DensePoly([(-xj) % P, 1])
            denom = denom * ((xi - xj) % P) % P
        poly = poly + num.scale(yi * pow(denom, P - 2, P) % P)
    return poly


def vanishing_x_poly(info: IndexInfo, domain_h: Radix2Domain) -> DensePoly:
    """v_X(X) = Π_{i<ℓ} (X − h^i)."""
    poly = DensePoly([1])
    for pt in x_padding_domain(info, domain_h):
        poly = poly * DensePoly([(-pt) % P, 1])
    return poly


def prover_round1(index: Index, cs, zk_rands: tuple[int, int, int] | None = None) -> ProverRound1:
    """Witness polynomials; with ``zk_rands = (r_w, r_a, r_b)`` each poly is
    randomized by +r·v_H (vanishing on H — identities over H unchanged,
    single off-H evaluations become uniform; ark-marlin's zk bound b=1)."""
    info = index.info
    n = info.domain_h_size
    domain_h = Radix2Domain(n)
    ell = info.num_instance_padded

    # z over H: [instance, 0-pad to ℓ, witnesses, 0-pad to n]
    z = list(cs.instance_assignment)
    z += [0] * (ell - len(z))
    z += list(cs.witness_assignment)
    z += [0] * (n - len(z))

    raw = cs.to_matrices()
    z_a_evals = [0] * n
    z_b_evals = [0] * n
    for evals, (rows, cols, coeffs) in zip((z_a_evals, z_b_evals), raw[:2]):
        for r, c, v in zip(rows, cols, coeffs):
            evals[r] = (evals[r] + v * z[_map_column(c, info.num_instance, ell)]) % P

    z_poly = DensePoly(domain_h.ifft(z))
    z_a_poly = DensePoly(domain_h.ifft(z_a_evals))
    z_b_poly = DensePoly(domain_h.ifft(z_b_evals))

    # ŵ = (ẑ − x̂) / v_X  (exact division; computed on a coset)
    x_poly = x_poly_from_instance(cs.instance_assignment, info, domain_h)
    v_x = vanishing_x_poly(info, domain_h)
    num = z_poly - x_poly
    shift = 22  # multiplicative generator — gH avoids both H and roots of v_X
    num_evals = domain_h.coset_fft(num.coeffs, shift)
    vx_evals = domain_h.coset_fft(v_x.coeffs, shift)
    w_evals = [a * b % P for a, b in zip(num_evals, batch_inverse(vx_evals))]
    w_poly = DensePoly(domain_h.coset_ifft(w_evals, shift))

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
    h_elems = domain_h.elements()
    v_h_alpha = domain_h.evaluate_vanishing(alpha)

    # u_H(α, h^i) = v_H(α) / (α − h^i) for all i (batch inverted)
    denoms = [(alpha - e) % P for e in h_elems]
    u_alpha = [v_h_alpha * inv % P for inv in batch_inverse(denoms)]

    # t evals over H: t[colH] += η_M · u_H(α, rowH) · val
    t_evals = [0] * n
    raw = cs.to_matrices()
    for eta, (rows, cols, coeffs) in zip(etas, raw):
        for r, c, v in zip(rows, cols, coeffs):
            ci = _map_column(c, info.num_instance, info.num_instance_padded)
            t_evals[ci] = (t_evals[ci] + eta * u_alpha[r] % P * v) % P
    t_poly = DensePoly(domain_h.ifft(t_evals))

    # q1 on an extended domain (deg q1 ≤ 3n−3)
    domain_q = Radix2Domain(4 * n)
    q_elems = domain_q.elements()
    za_e = domain_q.fft(r1.z_a_poly.coeffs)
    zb_e = domain_q.fft(r1.z_b_poly.coeffs)
    z_e = domain_q.fft(r1.z_poly.coeffs)
    t_e = domain_q.fft(t_poly.coeffs)
    # u_H(α, X) on the extended domain (direct rational formula)
    u_denoms = [(alpha - x) % P for x in q_elems]
    u_e = [
        (v_h_alpha - domain_h.evaluate_vanishing(x)) * inv % P
        for x, inv in zip(q_elems, batch_inverse(u_denoms))
    ]
    eta_a, eta_b, eta_c = etas
    q1_e = [
        (u * ((eta_a * za + eta_b * zb + eta_c * za % P * zb) % P) - t * z) % P
        for u, za, zb, z, t in zip(u_e, za_e, zb_e, z_e, t_e)
    ]
    if mask_poly is not None:
        mask_e = domain_q.fft(mask_poly.coeffs)
        q1_e = [(q + s) % P for q, s in zip(q1_e, mask_e)]
    q1 = DensePoly(domain_q.ifft(q1_e))
    h1_coeffs, rem = domain_h.divide_by_vanishing(q1.coeffs)
    rem = rem + [0] * (n - len(rem))
    ensure(rem[0] == 0, "outer sumcheck: non-zero H-sum (unsatisfied circuit?)")
    g_1 = DensePoly(rem[1:])
    return ProverRound2(t_poly=t_poly, g_1_poly=g_1, h_1_poly=DensePoly(h1_coeffs))


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

    # b_M polynomials (coefficient form) and evals on K
    b_polys = []
    b_on_k = []
    for mat in index.matrices:
        bm = (DensePoly([alpha]) - mat.row_poly) * (DensePoly([beta]) - mat.col_poly)
        b_polys.append(bm)
        b_on_k.append(
            [
                (alpha - r) * (beta - c) % P
                for r, c in zip(mat.row_evals, mat.col_evals)
            ]
        )

    # a(X) = scale · Σ_M η_M val_M · Π_{N≠M} b_N
    a_poly = DensePoly.zero()
    for i, mat in enumerate(index.matrices):
        term = mat.val_poly.scale(etas[i] * scale % P)
        for j, bp in enumerate(b_polys):
            if j != i:
                term = term * bp
        a_poly = a_poly + term
    b_poly = b_polys[0] * b_polys[1] * b_polys[2]

    # f on K, σ₂ = Σ f  (denominators batch-inverted)
    inv_b = [batch_inverse(b_on_k[i]) for i in range(3)]
    f_evals = []
    for k in range(m):
        acc = 0
        for i, mat in enumerate(index.matrices):
            acc = (acc + etas[i] * mat.val_evals[k] % P * inv_b[i][k]) % P
        f_evals.append(acc * scale % P)
    sigma_2 = sum(f_evals) % P
    f_poly = DensePoly(domain_k.ifft(f_evals))
    ensure((f_poly.coeffs[0] if f_poly.coeffs else 0) == sigma_2 * pow(m, P - 2, P) % P,
           "inner sumcheck: f̂ constant term != σ₂/m")
    g_2 = DensePoly(f_poly.coeffs[1:])

    numerator = a_poly - b_poly * f_poly
    h2_coeffs, rem = domain_k.divide_by_vanishing(numerator.coeffs)
    ensure(not rem, "inner sumcheck: division remainder non-zero")
    return ProverRound3(g_2_poly=g_2, h_2_poly=DensePoly(h2_coeffs), sigma_2=sigma_2)


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
    x_poly = x_poly_from_instance(instance, info, domain_h)
    v_x = vanishing_x_poly(info, domain_h)
    z_beta = (evals["w"] * v_x.evaluate(beta) + x_poly.evaluate(beta)) % P
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
    b_vals = [
        (alpha - evals[f"row_{nm}"]) * (beta - evals[f"col_{nm}"]) % P for nm in names
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
