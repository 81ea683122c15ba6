"""Device-resident Marlin prover: the TPU is the prover's home.

Mirrors :func:`simpleworks_tpu.marlin.prove` byte-for-byte (same RNG draw
order, same Fiat-Shamir transcript, bit-exact kernels) but keeps the
polynomial plane ON the device across every round
(:mod:`simpleworks_tpu.fields.dvec` arrays): fft → pointwise → ifft →
divide chains never round-trip the host, commits consume device-resident
Montgomery coefficients directly
(:func:`simpleworks_tpu.ops.msm_pippenger.msm_device_mont` derives the
Pippenger digits on device), and the batch openings combine + divide on
device too.  Host traffic per prove is the witness/mask upload
(~(6n)·32 B), spmv outputs, and scalar fetches — not the ~100 MB/prove of
per-call offload (VERDICT r4 #1; the accel routing rationale at
``ops/accel.py`` documents the link economics this inverts).

Reference hot path being replaced: the AHP rounds + KZG commits inside
``MarlinInst::prove`` (``/root/reference/src/marlin/mod.rs:75``).

Engagement: ``marlin.prove`` delegates here when
``accel.use_device_prover(n)`` says so (healthy probed device + size
threshold, or ``SWTPU_DEVICE_PROVER=1``).  Proof bytes are identical to
the host path (tests/test_device_prover.py pins this on the CPU backend).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..errors import ensure
from ..fields import dvec
from ..fields.bls12_377 import FR_MODULUS, Fr
from ..fields.frvec import FrVec
from ..kzg import kzg10
from ..kzg.kzg10 import Commitment, Randomness
from ..ops.msm_pippenger import msm_device_mont
from ..poly.dense import DensePoly
from ..poly.domain import Radix2Domain
from ..utils.observability import PROVER_TIMER
from . import ahp

P = FR_MODULUS


def _trace(msg: str) -> None:
    import os
    import sys
    import time

    if os.environ.get("SWTPU_TRACE"):
        print(f"[device-prover {time.strftime('%H:%M:%S')}] {msg}",
              file=sys.stderr, flush=True)


def _sparse_poly_dev(width: int, entries: list[tuple[int, int]]):
    """[16, width] device array with Montgomery columns set at the given
    (position, value) entries — r·v_H-style sparse addends built without
    uploading a full-width zero buffer."""
    out = jnp.zeros((16, width), jnp.uint32)
    if not entries:
        return out
    pos = [p for p, _ in entries]
    cols = np.concatenate([dvec.mont_scalar_np(v) for _, v in entries], axis=1)
    return out.at[:, jnp.asarray(pos)].set(jnp.asarray(cols))


def _device_index(pk):
    """Per-matrix device arrays of the index (uploaded once per pk,
    reused across proves): K-evals for the f/b computation, coefficient
    arrays for the 4m-domain numerator transforms."""
    cached = getattr(pk, "_device_index", None)
    if cached is not None:
        return cached
    mats = []
    for mat in pk.index.matrices:
        mats.append(
            {
                "row_evals": dvec.from_frvec(mat.row_evals),
                "col_evals": dvec.from_frvec(mat.col_evals),
                "val_evals": dvec.from_frvec(mat.val_evals),
                "row": dvec.from_frvec(mat.row_poly.vec),
                "col": dvec.from_frvec(mat.col_poly.vec),
                "val": dvec.from_frvec(mat.val_poly.vec),
                "row_col": dvec.from_frvec(mat.row_col_poly.vec),
            }
        )
    pk._device_index = mats
    return mats


def _commit_dev(srs, poly_d, degree_bound=None, hiding_rng=None, width_hint=None):
    """KZG commit of a device-resident coefficient array (trailing zeros
    are free: zero scalars own no Pippenger bucket entries).  Mirrors
    kzg10.commit's RNG draw order for the hiding randomness."""
    n = int(poly_d.shape[1]) if width_hint is None else width_hint
    ensure(n - 1 <= srs.max_degree, "polynomial exceeds SRS degree")
    points = srs.device_powers()
    c = (
        msm_device_mont(points, poly_d[:, :n])
        if n
        else kzg10.G1Point.identity()
    )
    rand = None
    if hiding_rng is not None:
        rand = Randomness.rand(hiding_rng, has_shift=degree_bound is not None)
        c = c.add(kzg10._gamma_msm(srs, rand.blind.coeffs))
    shifted = None
    if degree_bound is not None:
        ensure(n - 1 <= degree_bound, "device poly width exceeds degree bound")
        shift = srs.max_degree - degree_bound
        shifted = (
            msm_device_mont(points, poly_d[:, :n], offset=shift)
            if n
            else kzg10.G1Point.identity()
        )
        if rand is not None:
            shifted = shifted.add(kzg10._gamma_msm(srs, rand.shifted_blind.coeffs))
    return Commitment(comm=c, shifted_comm=shifted, degree_bound=degree_bound), rand


from functools import lru_cache


@lru_cache(maxsize=16)
def _combine_fn(widths: tuple, maxw: int):
    """One jitted ξ-weighted axpy over all polynomials of a batch opening
    (weights arrive as a runtime [k, 16, 1] Montgomery stack)."""

    def run(weights, *arrs):
        acc = jnp.zeros((16, maxw), jnp.uint32)
        for i, a in enumerate(arrs):
            acc = dvec.add(
                acc,
                dvec.mul(
                    dvec.pad_to(a, maxw),
                    jnp.broadcast_to(weights[i], (16, maxw)),
                ),
            )
        return acc

    return jax.jit(run)


@lru_cache(maxsize=16)
def _eval_many_fn(widths: tuple, maxw: int):
    """One jitted program evaluating every poly: per-poly multiply by the
    shared powers table + chunked raw limb sums (no modular tree) — ONE
    dispatch + ONE fetch instead of ~20 dispatches per polynomial, which
    cost ~90 ms each through the tunnel (39 s of a 103 s prove)."""

    def run(pw, *arrs):
        sums = [
            dvec.sum_limbs_raw(dvec.mul(dvec.pad_to(a, maxw), pw))
            for a in arrs
        ]
        return jnp.stack(sums)  # [k, 16, K] u32 partial sums

    return jax.jit(run)


def _evaluate_many(polys_d: list, z: int) -> list[int]:
    """Evaluate several device coefficient arrays at z with one shared
    powers build, one fused device program, and ONE host fetch."""
    if not polys_d:
        return []
    widths = tuple(int(p.shape[1]) for p in polys_d)
    maxw = max(widths)
    pw = dvec.powers_vec(z, maxw)
    raw = np.asarray(
        jax.device_get(_eval_many_fn(widths, maxw)(pw, *polys_d))
    )
    return [dvec.limb_sums_to_int(raw[k]) for k in range(len(polys_d))]


def _batch_open_dev(srs, labeled_dev, point: int, xi: int, rands=None):
    """Device twin of kzg10.batch_open: same ξ-weight schedule, combine +
    divide on device, witness/shifted MSMs from resident arrays; blinding
    (tiny polys) stays host."""
    base_terms = []     # (weight, dev_array)
    shifted_terms = []  # (weight, dev_array, shift)
    blind_terms = []
    weight = 1
    for i, (poly_d, _comm, _value, bound) in enumerate(labeled_dev):
        rand = rands[i] if rands is not None else None
        if rand is not None and not rand.blind.is_zero():
            blind_terms.append((weight, rand.blind))
        base_terms.append((weight, poly_d))
        weight = weight * xi % P
        if bound is not None:
            shifted_terms.append((weight, poly_d, srs.max_degree - bound))
            if (rand is not None and rand.shifted_blind is not None
                    and not rand.shifted_blind.is_zero()):
                blind_terms.append((weight, rand.shifted_blind))
            weight = weight * xi % P

    with PROVER_TIMER.region("kzg.batch_open.combine"):
        max_len = max(int(p.shape[1]) for _, p in base_terms)
        widths = tuple(int(p.shape[1]) for _, p in base_terms)
        weights = jnp.asarray(
            np.stack([dvec.mont_scalar_np(w) for w, _ in base_terms])
        )
        acc = _combine_fn(widths, max_len)(
            weights, *(p for _, p in base_terms)
        )
        combined_blind = DensePoly.zero()
        for w, blind in blind_terms:
            combined_blind = combined_blind + blind.scale(w)
    with PROVER_TIMER.region("kzg.batch_open.divide"):
        witness_d, _rem = dvec.divide_by_linear(acc, dvec.mont_scalar_np(point), z_int=point)
    with PROVER_TIMER.region("kzg.batch_open.msm"):
        points = srs.device_powers()
        w_point = msm_device_mont(points, witness_d)
        for w, poly_d, shift in shifted_terms:
            quot_d, _ = dvec.divide_by_linear(poly_d, dvec.mont_scalar_np(point), z_int=point)
            if quot_d.shape[1]:
                quot_scaled = dvec.scale(quot_d, dvec.mont_scalar_np(w))
                w_point = w_point.add(
                    msm_device_mont(points, quot_scaled, offset=shift)
                )
    random_v = 0
    if not combined_blind.is_zero():
        random_v = combined_blind.evaluate(point)
        blind_witness, _ = combined_blind.divide_by_linear(point)
        if not blind_witness.is_zero():
            w_point = w_point.add(kzg10._gamma_msm(srs, blind_witness.coeffs))
    return w_point, random_v


def prove_device(pk, cs, rng):
    """Device-plane twin of marlin.prove (same transcript, same bytes)."""
    from . import (
        BETA_POLYS,
        GAMMA_POLYS,
        PROTOCOL_NAME,
        MarlinProof,
        _degree_bounds,
        _fixup_num_instance,
        _serialize_instance,
    )
    from .fiat_shamir import FiatShamirRng

    idx, srs, info = pk.index, pk.srs, pk.index.info
    _fixup_num_instance(info, cs)
    n, m = info.domain_h_size, info.domain_k_size
    ell = info.num_instance_padded
    domain_h = Radix2Domain(n)
    domain_k = Radix2Domain(m)
    bounds = _degree_bounds(info)
    dev_index = _device_index(pk)

    fs = FiatShamirRng(
        PROTOCOL_NAME + pk.vk.transcript_bytes()
        + _serialize_instance(cs.instance_assignment)
    )

    zk_rands = tuple(Fr.rand(rng).value for _ in range(3))
    r_w, r_a, r_b = zk_rands

    # ---------------------------------------------------------- round 1 ----
    with PROVER_TIMER.region("ahp.round1"):
        num_vars = info.num_instance + len(cs.witness_assignment)
        var_idx = ahp._map_columns(
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
            cols_h = ahp._map_columns(cols, info.num_instance, ell, n)
            za_zb.append(
                FrVec.spmv(rows_np, cols_h, FrVec.from_ints(coeffs), z, n)
            )
        z_d = dvec.from_frvec(z)
        za_e_d = dvec.from_frvec(za_zb[0])
        zb_e_d = dvec.from_frvec(za_zb[1])
        z_poly_d = dvec.ifft(z_d, n)
        z_a_d = dvec.ifft(za_e_d, n)
        z_b_d = dvec.ifft(zb_e_d, n)
        x_poly = ahp.x_poly_from_instance(cs.instance_assignment, ell)
        x_d = dvec.pad_to(dvec.from_frvec(x_poly.vec.pad_to(ell)), n)
        w_d, rem = dvec.divide_by_vanishing(dvec.sub(z_poly_d, x_d), ell)
        ensure(
            not np.asarray(jax.device_get(jnp.any(rem != 0))),
            "ẑ − x̂ does not vanish on X (bad z layout?)",
        )
        # zk randomization: +r·v_H (and ẑ += r_w·v_X·v_H)
        w_d = dvec.add(
            dvec.pad_to(w_d, n + 1),
            _sparse_poly_dev(n + 1, [(0, (P - r_w) % P), (n, r_w)]),
        )
        z_a_d = dvec.add(
            dvec.pad_to(z_a_d, n + 1),
            _sparse_poly_dev(n + 1, [(0, (P - r_a) % P), (n, r_a)]),
        )
        z_b_d = dvec.add(
            dvec.pad_to(z_b_d, n + 1),
            _sparse_poly_dev(n + 1, [(0, (P - r_b) % P), (n, r_b)]),
        )
        # (X^ℓ−1)(X^n−1)·r_w = r_w·(1 − X^ℓ − X^n + X^{n+ℓ})
        z_poly_d = dvec.add(
            dvec.pad_to(z_poly_d, n + ell + 1),
            _sparse_poly_dev(
                n + ell + 1,
                [(0, r_w), (ell, (P - r_w) % P), (n, (P - r_w) % P),
                 (n + ell, r_w)],
            ),
        )
        mask_poly = ahp.sample_mask_poly(info, rng)
        mask_d = dvec.from_frvec(mask_poly.vec)

    _trace("round1 done")
    comms: dict[str, Commitment] = {}
    rands: dict[str, Randomness] = {}
    polys_d = {"w": w_d, "z_a": z_a_d, "z_b": z_b_d, "mask": mask_d}
    with PROVER_TIMER.region("kzg.commit.round1"):
        comms["w"], rands["w"] = _commit_dev(srs, w_d, hiding_rng=rng)
        comms["z_a"], rands["z_a"] = _commit_dev(srs, z_a_d, hiding_rng=rng)
        comms["z_b"], rands["z_b"] = _commit_dev(srs, z_b_d, hiding_rng=rng)
        comms["mask"], rands["mask"] = _commit_dev(srs, mask_d, hiding_rng=rng)
    _trace("round1 commits done")
    fs.absorb(b"".join(comms[nm].serialize() for nm in ["w", "z_a", "z_b", "mask"]))
    alpha = fs.squeeze_field_element()
    etas = fs.squeeze_field_elements(3)

    # ---------------------------------------------------------- round 2 ----
    with PROVER_TIMER.region("ahp.round2"):
        v_h_alpha = domain_h.evaluate_vanishing(alpha)
        # u_H(α, h^i) on the host (the t spmv consumes it there anyway)
        h_elems = domain_h.elements_vec()
        u_alpha = h_elems.rsub_scalar(alpha).inv().scale(v_h_alpha)
        t_evals = FrVec.zeros(n)
        for eta, (rows, cols, coeffs) in zip(etas, raw):
            rows_np = np.asarray(rows, dtype=np.uint32)
            cols_h = ahp._map_columns(cols, info.num_instance, ell, n)
            t_evals = t_evals + FrVec.spmv(
                cols_h, rows_np, FrVec.from_ints(coeffs), u_alpha.scale(eta), n
            )
        t_d = dvec.ifft(dvec.from_frvec(t_evals), n)

        nq = 4 * n
        domain_q = Radix2Domain(nq)
        za_e = dvec.fft(z_a_d, nq)
        zb_e = dvec.fft(z_b_d, nq)
        z_e = dvec.fft(z_poly_d, nq)
        t_e = dvec.fft(t_d, nq)
        # u_H(α, X) on the 4n domain: (v_H(α) − (x^n − 1)) / (α − x)
        q_elems = dvec.powers_vec(domain_q.group_gen, nq)
        x_pow_n = dvec.powers_vec(pow(domain_q.group_gen, n, P), nq)
        u_num = dvec.rsub_scalar(x_pow_n, dvec.mont_scalar_np((v_h_alpha + 1) % P))
        u_e = dvec.mul(u_num, dvec.inv(dvec.rsub_scalar(q_elems, dvec.mont_scalar_np(alpha))))
        eta_a, eta_b, eta_c = etas
        lin = dvec.add(
            dvec.mul(
                za_e,
                dvec.add(
                    dvec.scale(zb_e, dvec.mont_scalar_np(eta_c)),
                    dvec.const_vec(eta_a, nq),
                ),
            ),
            dvec.scale(zb_e, dvec.mont_scalar_np(eta_b)),
        )
        q1_e = dvec.sub(dvec.mul(u_e, lin), dvec.mul(t_e, z_e))
        q1_e = dvec.add(q1_e, dvec.fft(mask_d, nq))
        q1 = dvec.ifft(q1_e, nq)
        h1_d, rem1 = dvec.divide_by_vanishing(q1, n)
        rem1 = dvec.pad_to(rem1, n)
        ensure(
            not np.asarray(jax.device_get(jnp.any(rem1[:, :1] != 0))),
            "outer sumcheck: non-zero H-sum (unsatisfied circuit?)",
        )
        g_1_d = rem1[:, 1:]
    _trace("round2 done")
    polys_d["t"] = t_d
    polys_d["g_1"] = g_1_d
    polys_d["h_1"] = h1_d
    with PROVER_TIMER.region("kzg.commit.round2"):
        comms["t"], _ = _commit_dev(srs, t_d)
        comms["g_1"], rands["g_1"] = _commit_dev(
            srs, g_1_d, degree_bound=bounds["g_1"], hiding_rng=rng
        )
        comms["h_1"], rands["h_1"] = _commit_dev(srs, h1_d, hiding_rng=rng)
    _trace("round2 commits done")
    fs.absorb(b"".join(comms[nm].serialize() for nm in ["t", "g_1", "h_1"]))
    beta = fs.squeeze_field_element()

    # ---------------------------------------------------------- round 3 ----
    with PROVER_TIMER.region("ahp.round3"):
        v_h_beta = domain_h.evaluate_vanishing(beta)
        scale_ab = v_h_alpha * v_h_beta % P
        b_on_k = [
            dvec.mul(
                dvec.rsub_scalar(mt["row_evals"], dvec.mont_scalar_np(alpha)),
                dvec.rsub_scalar(mt["col_evals"], dvec.mont_scalar_np(beta)),
            )
            for mt in dev_index
        ]
        f_evals = jnp.zeros((16, m), jnp.uint32)
        for eta, mt, b in zip(etas, dev_index, b_on_k):
            f_evals = dvec.add(
                f_evals,
                dvec.mul(
                    dvec.scale(mt["val_evals"], dvec.mont_scalar_np(eta)),
                    dvec.inv(b),
                ),
            )
        f_evals = dvec.scale(f_evals, dvec.mont_scalar_np(scale_ab))
        sigma_2 = dvec.limb_sums_to_int(
            np.asarray(jax.device_get(dvec.sum_limbs_raw(f_evals)))
        )
        f_d = dvec.ifft(f_evals, m)
        f0 = dvec.scalar_to_int(f_d[:, :1])
        ensure(
            f0 == sigma_2 * pow(m, P - 2, P) % P,
            "inner sumcheck: f̂ constant term != σ₂/m",
        )
        g_2_d = f_d[:, 1:]

        ne = ahp.next_pow2(max(4 * m - 3, 2))
        alpha_beta_np = dvec.mont_scalar_np(alpha * beta % P)
        b_e = []
        vals_e = []
        for mt in dev_index:
            r_e = dvec.fft(mt["row"], ne)
            c_e = dvec.fft(mt["col"], ne)
            rc_e = dvec.fft(mt["row_col"], ne)
            b_hat = dvec.add(
                dvec.sub(
                    dvec.sub(rc_e, dvec.scale(c_e, dvec.mont_scalar_np(alpha))),
                    dvec.scale(r_e, dvec.mont_scalar_np(beta)),
                ),
                jnp.broadcast_to(jnp.asarray(alpha_beta_np), (16, ne)),
            )
            b_e.append(b_hat)
            vals_e.append(dvec.fft(mt["val"], ne))
        a_e = dvec.add(
            dvec.add(
                dvec.mul(
                    dvec.scale(vals_e[0], dvec.mont_scalar_np(etas[0] * scale_ab % P)),
                    dvec.mul(b_e[1], b_e[2]),
                ),
                dvec.mul(
                    dvec.scale(vals_e[1], dvec.mont_scalar_np(etas[1] * scale_ab % P)),
                    dvec.mul(b_e[0], b_e[2]),
                ),
            ),
            dvec.mul(
                dvec.scale(vals_e[2], dvec.mont_scalar_np(etas[2] * scale_ab % P)),
                dvec.mul(b_e[0], b_e[1]),
            ),
        )
        f_e = dvec.fft(f_d, ne)
        num_e = dvec.sub(
            a_e, dvec.mul(dvec.mul(dvec.mul(b_e[0], b_e[1]), b_e[2]), f_e)
        )
        numerator = dvec.ifft(num_e, ne)
        h2_d, rem2 = dvec.divide_by_vanishing(numerator, m)
        ensure(
            not np.asarray(jax.device_get(jnp.any(rem2 != 0))),
            "inner sumcheck: division remainder non-zero",
        )
    _trace("round3 done")
    polys_d["g_2"] = g_2_d
    polys_d["h_2"] = h2_d
    with PROVER_TIMER.region("kzg.commit.round3"):
        comms["g_2"], _ = _commit_dev(srs, g_2_d, degree_bound=bounds["g_2"])
        comms["h_2"], _ = _commit_dev(srs, h2_d)
    _trace("round3 commits done")
    fs.absorb(b"".join(comms[nm].serialize() for nm in ["g_2", "h_2"]))
    gamma = fs.squeeze_field_element()

    for mt, name in zip(dev_index, ["a", "b", "c"]):
        polys_d[f"row_{name}"] = mt["row"]
        polys_d[f"col_{name}"] = mt["col"]
        polys_d[f"val_{name}"] = mt["val"]
        polys_d[f"row_col_{name}"] = mt["row_col"]

    evaluations: dict[str, int] = {}
    with PROVER_TIMER.region("evaluations"):
        beta_vals = _evaluate_many([polys_d[nm] for nm in BETA_POLYS], beta)
        gamma_vals = _evaluate_many([polys_d[nm] for nm in GAMMA_POLYS], gamma)
        for nm, v in zip(BETA_POLYS, beta_vals):
            evaluations[nm] = v
        for nm, v in zip(GAMMA_POLYS, gamma_vals):
            evaluations[nm] = v
    _trace("evaluations done")
    ensure(evaluations["t"] == sigma_2 % P, "inner sumcheck claim != opened t(β)")

    from . import EVALUATION_ORDER

    fs.absorb(b"".join(Fr(evaluations[nm]).serialize() for nm in EVALUATION_ORDER))
    xi = fs.squeeze_field_element()

    all_comms = dict(comms)
    all_comms.update(pk.vk.index_commitments)
    beta_batch = [
        (polys_d[nm], all_comms[nm], evaluations[nm], bounds[nm])
        for nm in BETA_POLYS
    ]
    gamma_batch = [
        (polys_d[nm], all_comms[nm], evaluations[nm], bounds[nm])
        for nm in GAMMA_POLYS
    ]
    beta_rands = [rands.get(nm) for nm in BETA_POLYS]
    gamma_rands = [rands.get(nm) for nm in GAMMA_POLYS]
    with PROVER_TIMER.region("kzg.batch_open"):
        pc_beta, rand_beta = _batch_open_dev(srs, beta_batch, beta, xi, rands=beta_rands)
        _trace("beta open done")
        pc_gamma, rand_gamma = _batch_open_dev(srs, gamma_batch, gamma, xi, rands=gamma_rands)
        _trace("gamma open done")

    return MarlinProof(
        commitments=comms,
        evaluations=evaluations,
        pc_proof_beta=pc_beta,
        pc_proof_gamma=pc_gamma,
        pc_rand_beta=rand_beta,
        pc_rand_gamma=rand_gamma,
    )
