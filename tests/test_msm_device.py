"""Device Pippenger MSM (ops/msm_pippenger) vs host oracle — bit-exact
group elements, identity/zero-scalar edge cases, offset windows."""

import numpy as np
import pytest

from simpleworks_tpu.curves.bls12_377 import G1Point
from simpleworks_tpu.fields.bls12_377 import FR_MODULUS
from simpleworks_tpu.fields.frvec import FrVec
from simpleworks_tpu.kzg.msm import msm
from simpleworks_tpu.ops import g1_limb, msm_pippenger

rng = np.random.default_rng(11)


def scalars_to_std(scalars):
    return FrVec.from_ints(scalars).to_std_array()


def make_points(n):
    g = G1Point.generator()
    return [g.scalar_mul(i * 7919 + 3) for i in range(n)]


def test_window_digits_reconstruct():
    scalars = [int.from_bytes(rng.bytes(31), "little") % FR_MODULUS for _ in range(9)]
    std = scalars_to_std(scalars)
    for c in (8, 13):
        digits = msm_pippenger.window_digits(std, c)
        for i, s in enumerate(scalars):
            rebuilt = sum(int(digits[w, i]) << (w * c) for w in range(digits.shape[0]))
            assert rebuilt == s


def test_limb_major_roundtrip_and_add():
    pts = make_points(6)
    lm = g1_limb.points_to_limb_major(pts)
    back = g1_limb.points_from_limb_major(lm)
    for p, q in zip(pts, back):
        assert p == q
    # batched add vs host: pts[i] + pts[(i+1)%6]
    import jax.numpy as jnp

    rolled = tuple(jnp.roll(a, -1, axis=1) for a in lm)
    s = g1_limb.add(lm, rolled)
    expected = [pts[i].add(pts[(i + 1) % 6]) for i in range(6)]
    for p, q in zip(g1_limb.points_from_limb_major(s), expected):
        assert p == q


def test_limb_major_add_edge_cases():
    g = G1Point.generator()
    p2 = g.double()
    cases = [
        (g, g),                      # equal -> double
        (g, g.neg()),                # opposite -> identity
        (G1Point.identity(), p2),    # left identity
        (p2, G1Point.identity()),    # right identity
        (G1Point.identity(), G1Point.identity()),
    ]
    lhs = g1_limb.points_to_limb_major([a for a, _ in cases])
    rhs = g1_limb.points_to_limb_major([b for _, b in cases])
    out = g1_limb.points_from_limb_major(g1_limb.add(lhs, rhs))
    for (a, b), got in zip(cases, out):
        assert got == a.add(b), (a, b)


@pytest.mark.parametrize("schedule", ["device", "host"])
@pytest.mark.parametrize("n,c", [(33, 8), (64, 6)])
def test_msm_device_matches_host(n, c, schedule):
    pts = make_points(n)
    scalars = [int.from_bytes(rng.bytes(33), "little") % FR_MODULUS for _ in range(n)]
    scalars[0] = 0          # zero scalar skipped
    scalars[-1] = 1         # unit scalar
    pts[2] = pts[1]         # duplicate point -> bucket doubling via madd
    lm = g1_limb.points_to_limb_major_affine(pts)
    got = msm_pippenger.msm_device(lm, scalars_to_std(scalars), c=c, schedule=schedule)
    assert got == msm(pts, scalars)


@pytest.mark.parametrize("schedule", ["device", "host"])
def test_msm_device_offset(schedule):
    pts = make_points(12)
    lm = g1_limb.points_to_limb_major_affine(pts)
    scalars = [i + 1 for i in range(8)]
    got = msm_pippenger.msm_device(
        lm, scalars_to_std(scalars), c=8, offset=4, schedule=schedule
    )
    assert got == msm(pts[4:12], scalars)


def test_device_schedule_grid_covers_host_grid():
    """The device-built grid must place every (window, nonzero-digit) point
    exactly once; compare bucket memberships (order-free) vs the host
    scheduler on an awkward size."""
    import jax.numpy as jnp

    n, c = 21, 8
    scalars = [int.from_bytes(rng.bytes(33), "little") % FR_MODULUS for _ in range(n)]
    std = scalars_to_std(scalars)
    digits = msm_pippenger.window_digits(std, c)
    d_small = digits.astype(np.uint8)
    for window_ids, segs, b_g, depth in msm_pippenger.build_schedule_meta(digits, c):
        idx, valid = msm_pippenger.device_grid_from_digits(
            jnp.asarray(d_small[window_ids]).astype(jnp.int32), n, depth, segs, b_g, 0
        )
        idx = np.asarray(idx).reshape(depth, len(window_ids), segs, b_g)
        valid = np.asarray(valid).reshape(depth, len(window_ids), segs, b_g)
        for slot, w in enumerate(window_ids):
            for d in range(b_g):
                members = sorted(idx[:, slot, :, d][valid[:, slot, :, d]].tolist())
                expected = sorted(np.nonzero(digits[w] == d)[0].tolist()) if d > 0 else []
                assert members == expected, (w, d)


def test_affine_madd_edge_cases():
    """The batch-affine accumulate step (g1_limb.affine_madd, VERDICT r3
    #3) against the host oracle on every edge row: identities on either
    side, doubling (equal points), P + (−P), and invalid lanes — the
    cases the shared batched inversion must mask, not divide by."""
    import jax.numpy as jnp

    g = G1Point.generator()
    p3, p5 = g.scalar_mul(3), g.scalar_mul(5)
    ident = G1Point.identity()
    cases = [
        (p3, p5, True),          # generic add
        (p3, p3, True),          # doubling
        (p3, p3.neg(), True),    # P + (−P) -> identity
        (ident, p5, True),       # left identity
        (p3, ident, True),       # right identity
        (ident, ident, True),    # both identity
        (p3, p5, False),         # invalid lane keeps acc
        (ident, p5, False),      # invalid lane keeps identity acc
    ]
    acc_pts = [a for a, _b, _v in cases]
    q_pts = [b for _a, b, _v in cases]
    valid = jnp.asarray([v for _a, _b, v in cases])
    acc2 = g1_limb.points_to_limb_major_affine(acc_pts)[:2]
    q2 = g1_limb.points_to_limb_major_affine(q_pts)[:2]
    rx, ry = g1_limb.affine_madd(acc2, q2, valid)
    got = g1_limb.points_from_limb_major(
        g1_limb.affine_to_jacobian((rx, ry))
    )
    for (a, b, v), res in zip(cases, got):
        expected = a.add(b) if v else a
        assert res == expected, (a, b, v)


def test_msm_accum_affine_matches_madd():
    """The affine and madd accumulate modes produce identical group
    elements (the madd path is the retained oracle)."""
    n, c = 40, 8
    pts = make_points(n)
    pts[3] = pts[2]  # duplicate -> doubling inside a bucket chain
    pts[5] = pts[4].neg()
    scalars = [int.from_bytes(rng.bytes(33), "little") % FR_MODULUS for _ in range(n)]
    scalars[4] = scalars[5] = 7  # P and −P share every window digit
    lm = g1_limb.points_to_limb_major_affine(pts)
    std = scalars_to_std(scalars)
    expected = msm(pts, scalars)
    import os

    for mode in ("affine", "madd"):
        os.environ["SWTPU_MSM_ACCUM"] = mode
        try:
            got = msm_pippenger.msm_device(lm, std, c=c, schedule="device")
        finally:
            os.environ.pop("SWTPU_MSM_ACCUM", None)
        assert got == expected, mode


def test_msm_device_midsize_2_12():
    """Mid-size default-suite case (VERDICT r3 #8): n = 2^12 through the
    device schedule — depth grouping, segs > 1, and the batch-affine
    inversion tree all activate at this size (toy n barely reaches them)."""
    n = 1 << 12
    from simpleworks_tpu import native

    if not native.available():
        pytest.skip("native runtime not built (host table generation)")
    g = G1Point.generator()
    pts_native = native.g1_fixed_base_raw(
        g, [(i * 6364136223846793005 + 1442695040888963407) % FR_MODULUS
            for i in range(n)]
    )
    pts_native = native.g1_ensure_normalized(pts_native)
    scalars = [int.from_bytes(rng.bytes(33), "little") % FR_MODULUS for _ in range(n)]
    scalars[0] = 0
    std = scalars_to_std(scalars)
    expected = native.g1_msm_affine_arr(pts_native, std)
    lm = g1_limb.native_points_to_limb_major(pts_native)
    got = msm_pippenger.msm_device(lm, std, c=8, schedule="device")
    assert got == expected


def test_fixed_base_powers_device_matches_native():
    """Device SRS generation (ops/srs_device) vs the native fixed-base
    table — bit-identical [N, 18] arrays."""
    from simpleworks_tpu import native
    from simpleworks_tpu.ops.srs_device import fixed_base_powers_device

    if not native.available():
        pytest.skip("native runtime not built")
    g = G1Point.generator()
    scalars = [int.from_bytes(rng.bytes(33), "little") % FR_MODULUS for _ in range(37)]
    scalars[0] = 0
    scalars[1] = 1
    std = FrVec.from_ints(scalars).to_std_array()
    got = fixed_base_powers_device(g, std)
    expected = native.g1_fixed_base_raw(g, scalars)
    assert np.array_equal(np.asarray(got), expected)


def test_fused_add_matches_composed_and_host(monkeypatch):
    """The single-launch fused Jacobian-add kernel (ops/g1_fused_pallas) is
    bit-exact with the composed path and the host oracle, including
    identity/double/inverse edge cases.  TPU-only: the Pallas-interpreter
    fallback's XLA CPU compile of the unrolled limb body is unbounded in
    practice (>9 min, >11 GB on a 2-vCPU host)."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("fused-add kernel compile is impractical off-TPU")
    import jax.numpy as jnp

    from simpleworks_tpu.ops.g1_fused_pallas import TILE, make_fused_add

    g = G1Point.generator()
    pts_p = [g.scalar_mul(i * 7919 + 3) for i in range(8)]
    pts_q = [g.scalar_mul(i * 104729 + 11) for i in range(8)]
    pts_p[0] = G1Point.identity()
    pts_q[1] = G1Point.identity()
    pts_q[2] = pts_p[2]          # doubling
    pts_q[3] = pts_p[3].neg()    # P + (-P) = identity
    reps = TILE // 8
    P3 = tuple(jnp.tile(a, (1, reps)) for a in g1_limb.points_to_limb_major(pts_p))
    Q3 = tuple(jnp.tile(a, (1, reps)) for a in g1_limb.points_to_limb_major(pts_q))
    out = make_fused_add()(P3, Q3)
    got = g1_limb.points_from_limb_major(tuple(a[:, :8] for a in out))
    composed = g1_limb.points_from_limb_major(
        tuple(a[:, :8] for a in g1_limb._add_composed(P3, Q3))
    )
    host = [a.add(b) for a, b in zip(pts_p, pts_q)]
    assert got == composed == host

    # fused MIXED add (the MSM accumulate's hot op) vs composed and host
    from simpleworks_tpu.ops.g1_fused_pallas import make_fused_madd

    Q2 = tuple(
        jnp.tile(a, (1, reps))
        for a in g1_limb.points_to_limb_major_affine(pts_q)[:2]
    )
    mout = make_fused_madd()(P3, Q2)
    mgot = g1_limb.points_from_limb_major(tuple(a[:, :8] for a in mout))
    mcomposed = g1_limb.points_from_limb_major(
        tuple(a[:, :8] for a in g1_limb._madd_composed(P3, Q2))
    )
    assert mgot == mcomposed == host


@pytest.mark.parametrize("c", [
    8,
    # c=13/16: thousands of buckets for a 40-point test are pathological
    # shapes for the virtual-8-device XLA:CPU client (tens of minutes);
    # covered by the slow suite + the real-device bench legs instead
    pytest.param(13, marks=pytest.mark.slow),
])
def test_msm_device_mont_matches_host(c):
    """The Montgomery-form entry (digits derived on device from [16, N]
    u32 mont limbs via a multiply-by-1) is bit-exact with the standard
    Pippenger oracle at every window size, including from an
    already-device-resident array."""
    import jax.numpy as jnp

    n = 40
    pts = make_points(n)
    scalars = [int.from_bytes(rng.bytes(33), "little") % FR_MODULUS for _ in range(n)]
    scalars[0] = 0
    scalars[3] = 1
    lm = g1_limb.points_to_limb_major_affine(pts)
    vec = FrVec.from_ints(scalars)
    got = msm_pippenger.msm_device_mont(lm, vec, c=c)
    expect = msm(pts, scalars)
    assert got == expect
    # device-array input path (what an NTT chain hands over)
    mont_dev = jnp.asarray(vec.a.view("<u2").reshape(n, 16).T.copy()).astype(
        jnp.uint32
    )
    assert msm_pippenger.msm_device_mont(lm, mont_dev, c=c) == expect


def test_msm_device_mont_offset():
    pts = make_points(20)
    lm = g1_limb.points_to_limb_major_affine(pts)
    scalars = [i * 31 + 5 for i in range(10)]
    got = msm_pippenger.msm_device_mont(lm, FrVec.from_ints(scalars), offset=6, c=8)
    assert got == msm(pts[6:16], scalars)
