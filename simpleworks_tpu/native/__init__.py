"""ctypes bindings for the native host runtime (csrc/swtpu_native.cpp).

Build: ``make native`` (or ``python -m simpleworks_tpu.native.build``).
All entry points degrade gracefully: ``available()`` is False when the
shared library hasn't been built, and callers fall back to the pure-Python
host paths.
"""

from __future__ import annotations

import ctypes
import os
from functools import lru_cache
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent / "libswtpu_native.so"


class _FpCtx(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int),
        ("p", ctypes.c_uint64 * 6),
        ("r2", ctypes.c_uint64 * 6),
        ("inv", ctypes.c_uint64),
        ("one", ctypes.c_uint64 * 6),
    ]


@lru_cache(maxsize=1)
def _lib():
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    u64p = ctypes.POINTER(ctypes.c_uint64)
    ctxp = ctypes.POINTER(_FpCtx)
    lib.swtpu_fp_mul_batch.argtypes = [ctxp, u64p, u64p, u64p, ctypes.c_size_t]
    lib.swtpu_fp_add_batch.argtypes = [ctxp, u64p, u64p, u64p, ctypes.c_size_t]
    lib.swtpu_fp_sub_batch.argtypes = [ctxp, u64p, u64p, u64p, ctypes.c_size_t]
    lib.swtpu_fp_to_mont.argtypes = [ctxp, u64p, u64p, ctypes.c_size_t]
    lib.swtpu_fp_from_mont.argtypes = [ctxp, u64p, u64p, ctypes.c_size_t]
    lib.swtpu_fp_powers.argtypes = [ctxp, u64p, u64p, ctypes.c_size_t]
    lib.swtpu_ntt.argtypes = [ctxp, u64p, ctypes.c_size_t, u64p]
    lib.swtpu_scale.argtypes = [ctxp, u64p, ctypes.c_size_t, u64p]
    lib.swtpu_g1_msm.argtypes = [ctxp, u64p, u64p, ctypes.c_size_t, ctypes.c_int, u64p]
    lib.swtpu_g1_msm_affine.argtypes = [ctxp, u64p, u64p, ctypes.c_size_t, ctypes.c_int, u64p]
    lib.swtpu_g1_normalize.argtypes = [ctxp, u64p, ctypes.c_size_t]
    lib.swtpu_g1_fixed_base.argtypes = [ctxp, u64p, u64p, ctypes.c_size_t, u64p]
    lib.swtpu_g1_add_batch.argtypes = [ctxp, u64p, u64p, u64p, ctypes.c_size_t]
    return lib


def available() -> bool:
    if os.environ.get("SWTPU_NATIVE") == "0":
        return False
    return _lib() is not None


def _require_lib():
    """The loaded library, or a typed error if the native runtime is absent
    (callers gate on ``available()``; this guard survives ``python -O``)."""
    from ..errors import SimpleworksError

    lib = _lib()
    if lib is None:
        raise SimpleworksError(
            "native runtime not built: run `make native` or gate on native.available()"
        )
    return lib


def _make_ctx(params) -> _FpCtx:
    n = params.repr_bits // 64
    ctx = _FpCtx()
    ctx.n = n
    p = params.modulus
    r2 = params.montgomery_r**2 % p
    one = params.montgomery_r % p
    for i in range(6):
        ctx.p[i] = (p >> (64 * i)) & (2**64 - 1)
        ctx.r2[i] = (r2 >> (64 * i)) & (2**64 - 1)
        ctx.one[i] = (one >> (64 * i)) & (2**64 - 1)
    ctx.inv = (-pow(p, -1, 1 << 64)) % (1 << 64)
    return ctx


@lru_cache(maxsize=4)
def _ctx_for(name: str) -> _FpCtx:
    from ..fields.bls12_377 import Fq, Fr, FrEd

    return _make_ctx({"fr": Fr, "fq": Fq, "fr_ed": FrEd}[name].PARAMS)


def ints_to_limbs64(values, n_limbs: int) -> np.ndarray:
    buf = b"".join(int(v).to_bytes(8 * n_limbs, "little") for v in values)
    return np.frombuffer(buf, dtype="<u8").reshape(len(values), n_limbs).copy()


def limbs64_to_ints(arr: np.ndarray) -> list[int]:
    data = arr.astype("<u8").tobytes()
    stride = arr.shape[1] * 8
    return [
        int.from_bytes(data[i * stride : (i + 1) * stride], "little")
        for i in range(arr.shape[0])
    ]


def _u64p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def fp_mul_batch(field: str, a: list[int], b: list[int]) -> list[int]:
    """Standard-form in/out batched modular multiplication."""
    lib = _require_lib()
    ctx = _ctx_for(field)
    n = ctx.n
    aa = ints_to_limbs64(a, n)
    bb = ints_to_limbs64(b, n)
    am = np.empty_like(aa)
    bm = np.empty_like(bb)
    lib.swtpu_fp_to_mont(ctypes.byref(ctx), _u64p(aa), _u64p(am), len(a))
    lib.swtpu_fp_to_mont(ctypes.byref(ctx), _u64p(bb), _u64p(bm), len(b))
    out = np.empty_like(aa)
    lib.swtpu_fp_mul_batch(ctypes.byref(ctx), _u64p(am), _u64p(bm), _u64p(out), len(a))
    res = np.empty_like(aa)
    lib.swtpu_fp_from_mont(ctypes.byref(ctx), _u64p(out), _u64p(res), len(a))
    return limbs64_to_ints(res)


def ntt_fr(values: list[int], omega: int, scale: int | None = None) -> list[int]:
    """Natural-order NTT over Fr with root ``omega`` (standard form in/out).
    ``scale`` (e.g. n^{-1} for the inverse transform) applied afterwards."""
    from ..fields.bls12_377 import Fr, FR_MODULUS

    lib = _require_lib()
    ctx = _ctx_for("fr")
    n = len(values)
    R = Fr.PARAMS.montgomery_r
    data = ints_to_limbs64([v * R % FR_MODULUS for v in values], 4)
    # stage twiddles: for len = 2,4,...,n: w_len^j, j < len/2 (Montgomery)
    tw_vals = []
    length = 2
    while length <= n:
        w = pow(omega, n // length, FR_MODULUS)
        cur = 1
        for _ in range(length // 2):
            tw_vals.append(cur * R % FR_MODULUS)
            cur = cur * w % FR_MODULUS
        length <<= 1
    tws = ints_to_limbs64(tw_vals, 4)
    lib.swtpu_ntt(ctypes.byref(ctx), _u64p(data), n, _u64p(tws))
    if scale is not None:
        s = ints_to_limbs64([scale * R % FR_MODULUS], 4)
        lib.swtpu_scale(ctypes.byref(ctx), _u64p(data), n, _u64p(s))
    rinv = pow(R, -1, FR_MODULUS)
    return [v * rinv % FR_MODULUS for v in limbs64_to_ints(data)]


def _points_to_native(points) -> np.ndarray:
    """G1Points -> [N, 18] u64 Jacobian Montgomery."""
    from ..fields.bls12_377 import Fq, FQ_MODULUS

    R = Fq.PARAMS.montgomery_r
    rows = []
    for p in points:
        rows.extend([p.X * R % FQ_MODULUS, p.Y * R % FQ_MODULUS, p.Z * R % FQ_MODULUS])
    return ints_to_limbs64(rows, 6).reshape(len(points), 18)


def _points_from_native(arr: np.ndarray):
    from ..curves.bls12_377 import G1Point
    from ..fields.bls12_377 import Fq, FQ_MODULUS

    rinv = pow(Fq.PARAMS.montgomery_r, -1, FQ_MODULUS)
    flat = limbs64_to_ints(arr.reshape(-1, 6))
    out = []
    for i in range(0, len(flat), 3):
        out.append(
            G1Point(flat[i] * rinv % FQ_MODULUS, flat[i + 1] * rinv % FQ_MODULUS,
                    flat[i + 2] * rinv % FQ_MODULUS)
        )
    return out


def _msm_window_bits(n: int) -> int:
    """Pippenger window scaled to the input size (bucket running-sum cost
    2^c must not dwarf the N point adds — c=13 for 300 points spent ~1 s
    walking empty buckets).  From 2^20 up, c=16 wins on the batch-affine
    path (measured on the 2-vCPU host: 2^21 c=16 94k pts/s vs c=13 75k,
    back-to-back in one process); at 2^19 c=13/15 tie within host noise
    (c=14 is reproducibly worse than both), so the smaller window keeps
    bucket memory down."""
    if n >= (1 << 20):
        return 16
    return max(2, min(13, n.bit_length() - 2))


def g1_msm(points, scalars: list[int], window_bits: int | None = None):
    """Pippenger MSM (native)."""
    lib = _require_lib()
    ctx = _ctx_for("fq")
    if window_bits is None:
        window_bits = _msm_window_bits(len(points))
    pts = _points_to_native(points)
    scs = ints_to_limbs64([int(s) for s in scalars], 4)
    out = np.zeros((1, 18), dtype="<u8")
    lib.swtpu_g1_msm(
        ctypes.byref(ctx), _u64p(pts), _u64p(scs), len(points), window_bits, _u64p(out)
    )
    return _points_from_native(out)[0]


def g1_fixed_base(base, scalars: list[int]):
    """out[i] = scalars[i]·base via the native windowed table."""
    lib = _require_lib()
    ctx = _ctx_for("fq")
    b = _points_to_native([base])
    scs = ints_to_limbs64([int(s) for s in scalars], 4)
    out = np.zeros((len(scalars), 18), dtype="<u8")
    lib.swtpu_g1_fixed_base(ctypes.byref(ctx), _u64p(b), _u64p(scs), len(scalars), _u64p(out))
    return _points_from_native(out)


def g1_fixed_base_raw(base, scalars: list[int]) -> np.ndarray:
    """out[i] = scalars[i]·base as a raw native array [N, 18] (Jacobian
    Montgomery) — the SRS storage format."""
    lib = _require_lib()
    ctx = _ctx_for("fq")
    b = _points_to_native([base])
    scs = ints_to_limbs64([int(s) for s in scalars], 4)
    out = np.zeros((len(scalars), 18), dtype="<u8")
    lib.swtpu_g1_fixed_base(ctypes.byref(ctx), _u64p(b), _u64p(scs), len(scalars), _u64p(out))
    return out


def g1_msm_raw(points_native: np.ndarray, scalars: list[int],
               window_bits: int | None = None):
    """Pippenger MSM over a preconverted native point array (no per-call
    point conversion — the SRS commit path)."""
    lib = _require_lib()
    ctx = _ctx_for("fq")
    if window_bits is None:
        window_bits = _msm_window_bits(points_native.shape[0])
    pts = np.ascontiguousarray(points_native, dtype="<u8")
    scs = ints_to_limbs64([int(s) for s in scalars], 4)
    out = np.zeros((1, 18), dtype="<u8")
    lib.swtpu_g1_msm(
        ctypes.byref(ctx), _u64p(pts), _u64p(scs), pts.shape[0], window_bits, _u64p(out)
    )
    return _points_from_native(out)[0]


def g1_normalize_arr(points_native: np.ndarray) -> np.ndarray:
    """Batch-normalize a [N, 18] Jacobian Montgomery array to Z == 1 in
    place (identity rows become x = y = z = 0); returns the same array.
    One Montgomery batched inversion — the precondition for
    ``g1_msm_affine_arr``."""
    lib = _require_lib()
    ctx = _ctx_for("fq")
    pts = np.ascontiguousarray(points_native, dtype="<u8")
    lib.swtpu_g1_normalize(ctypes.byref(ctx), _u64p(pts), pts.shape[0])
    return pts


def g1_ensure_normalized(points_native: np.ndarray) -> np.ndarray:
    """Normalize a [N, 18] Jacobian array to Z == 1 unless it already is
    (cheap vectorized check — SRS tables loaded from pre-normalized disk
    checkpoints skip the inversion)."""
    from ..fields.bls12_377 import Fq, FQ_MODULUS

    one = ints_to_limbs64([Fq.PARAMS.montgomery_r % FQ_MODULUS], 6)[0]
    z = points_native[:, 12:18]
    if np.array_equal(z, np.broadcast_to(one, z.shape)):
        return points_native
    return g1_normalize_arr(points_native)


def g1_msm_affine_arr(points_native: np.ndarray, scalars_std: np.ndarray,
                      window_bits: int | None = None):
    """Batch-affine Pippenger MSM over a *normalized* [N, 18] point array
    (Z == 1, see :func:`g1_normalize_arr`) and standard-form scalar limbs
    [N, 4].  Bucket accumulation runs in affine coordinates with one
    batched inversion per round (~6 field muls per point add vs ~16 on the
    Jacobian path) — identical group output to :func:`g1_msm_arr`."""
    lib = _require_lib()
    ctx = _ctx_for("fq")
    if window_bits is None:
        window_bits = _msm_window_bits(points_native.shape[0])
    pts = np.ascontiguousarray(points_native, dtype="<u8")
    scs = np.ascontiguousarray(scalars_std, dtype="<u8")
    out = np.zeros((1, 18), dtype="<u8")
    lib.swtpu_g1_msm_affine(
        ctypes.byref(ctx), _u64p(pts), _u64p(scs), pts.shape[0], window_bits, _u64p(out)
    )
    return _points_from_native(out)[0]


def _register_extras(lib):
    import ctypes as _ct

    u64p = _ct.POINTER(_ct.c_uint64)
    ctxp = _ct.POINTER(_FpCtx)
    lib.swtpu_fp_axpy.argtypes = [ctxp, u64p, u64p, u64p, _ct.c_size_t]
    lib.swtpu_fp_horner.argtypes = [ctxp, u64p, _ct.c_size_t, u64p, u64p]


def fr_combine(polys_with_weights) -> list[int]:
    """Σ w_i · p_i over Fr (standard-form coeff lists in/out) — the KZG
    batch-open combiner."""
    from ..fields.bls12_377 import Fr, FR_MODULUS

    lib = _require_lib()
    _register_extras(lib)
    ctx = _ctx_for("fr")
    R = Fr.PARAMS.montgomery_r
    n = max((len(p) for p, _ in polys_with_weights), default=0)
    if n == 0:
        return []
    acc = np.zeros((n, 4), dtype="<u8")
    for coeffs, weight in polys_with_weights:
        if not coeffs:
            continue
        pm = ints_to_limbs64([c * R % FR_MODULUS for c in coeffs], 4)
        wm = ints_to_limbs64([weight * R % FR_MODULUS], 4)
        lib.swtpu_fp_axpy(ctypes.byref(ctx), _u64p(acc), _u64p(pm), _u64p(wm), len(coeffs))
    # acc = Mont(c)·Mont(w)·R^{-1} summed = Mont(Σ w·c): one R factor to undo
    rinv = pow(R, -1, FR_MODULUS)
    return [v * rinv % FR_MODULUS for v in limbs64_to_ints(acc)]


def fr_horner(coeffs: list[int], z: int) -> int:
    """Polynomial evaluation at z over Fr (standard form)."""
    from ..fields.bls12_377 import Fr, FR_MODULUS

    if not coeffs:
        return 0
    lib = _require_lib()
    _register_extras(lib)
    ctx = _ctx_for("fr")
    R = Fr.PARAMS.montgomery_r
    cm = ints_to_limbs64([c * R % FR_MODULUS for c in coeffs], 4)
    zm = ints_to_limbs64([z * R % FR_MODULUS], 4)
    out = np.zeros((1, 4), dtype="<u8")
    lib.swtpu_fp_horner(ctypes.byref(ctx), _u64p(cm), len(coeffs), _u64p(zm), _u64p(out))
    rinv = pow(R, -1, FR_MODULUS)
    return limbs64_to_ints(out)[0] * rinv % FR_MODULUS


# ------------------------------------------------------------------------
# Array-level Fr kernels (numpy [N, 4] u64 Montgomery arrays in/out, zero
# bigint conversion) — the data plane behind fields.frvec.FrVec.
# ------------------------------------------------------------------------

_ARR_REGISTERED = False


def _register_arr(lib):
    global _ARR_REGISTERED
    if _ARR_REGISTERED:
        return
    u64p = ctypes.POINTER(ctypes.c_uint64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    ctxp = ctypes.POINTER(_FpCtx)
    lib.swtpu_fp_inv_batch.argtypes = [ctxp, u64p, u64p, u64p, ctypes.c_size_t]
    lib.swtpu_fp_spmv.argtypes = [
        ctxp, ctypes.c_size_t, u32p, u32p, u64p, u64p, u64p,
    ]
    lib.swtpu_fp_scalar_sub_vec.argtypes = [ctxp, u64p, u64p, u64p, ctypes.c_size_t]
    lib.swtpu_fp_div_linear.argtypes = [ctxp, u64p, ctypes.c_size_t, u64p, u64p, u64p]
    lib.swtpu_fp_mul_add_batch.argtypes = [ctxp, u64p, u64p, u64p, u64p, ctypes.c_size_t]
    _register_extras(lib)
    _ARR_REGISTERED = True


def _u32p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _c(arr: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(arr, dtype="<u8")


def fr_binop_arr(op: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise mont-form op over [N, 4] arrays: 'mul' | 'add' | 'sub'."""
    lib = _require_lib()
    ctx = _ctx_for("fr")
    a, b = _c(a), _c(b)
    out = np.empty_like(a)
    fn = {"mul": lib.swtpu_fp_mul_batch, "add": lib.swtpu_fp_add_batch,
          "sub": lib.swtpu_fp_sub_batch}[op]
    fn(ctypes.byref(ctx), _u64p(a), _u64p(b), _u64p(out), a.shape[0])
    return out


def fr_mul_add_arr(a: np.ndarray, b: np.ndarray, d: np.ndarray) -> np.ndarray:
    """out = a*b + d elementwise (Montgomery form)."""
    lib = _require_lib()
    _register_arr(lib)
    ctx = _ctx_for("fr")
    a, b, d = _c(a), _c(b), _c(d)
    out = np.empty_like(a)
    lib.swtpu_fp_mul_add_batch(
        ctypes.byref(ctx), _u64p(a), _u64p(b), _u64p(d), _u64p(out), a.shape[0]
    )
    return out


def fr_to_mont_arr(a_std: np.ndarray) -> np.ndarray:
    lib = _require_lib()
    ctx = _ctx_for("fr")
    a_std = _c(a_std)
    out = np.empty_like(a_std)
    lib.swtpu_fp_to_mont(ctypes.byref(ctx), _u64p(a_std), _u64p(out), a_std.shape[0])
    return out


def fr_from_mont_arr(a_mont: np.ndarray) -> np.ndarray:
    lib = _require_lib()
    ctx = _ctx_for("fr")
    a_mont = _c(a_mont)
    out = np.empty_like(a_mont)
    lib.swtpu_fp_from_mont(ctypes.byref(ctx), _u64p(a_mont), _u64p(out), a_mont.shape[0])
    return out


def fr_scale_arr(a: np.ndarray, factor_mont: np.ndarray) -> np.ndarray:
    """a * factor elementwise-by-scalar (Montgomery); returns a new array."""
    lib = _require_lib()
    ctx = _ctx_for("fr")
    out = _c(a).copy()
    f = _c(factor_mont)
    lib.swtpu_scale(ctypes.byref(ctx), _u64p(out), out.shape[0], _u64p(f))
    return out


def fr_powers_arr(base_mont: np.ndarray, count: int) -> np.ndarray:
    """[count, 4]: base^0..base^(count-1) (Montgomery in/out)."""
    lib = _require_lib()
    ctx = _ctx_for("fr")
    out = np.empty((count, 4), dtype="<u8")
    b = _c(base_mont)
    lib.swtpu_fp_powers(ctypes.byref(ctx), _u64p(b), _u64p(out), count)
    return out


_P_MINUS_2 = None


def fr_inv_arr(a: np.ndarray) -> np.ndarray:
    """Batch inversion (Montgomery in/out); zeros map to zero."""
    global _P_MINUS_2
    from ..fields.bls12_377 import FR_MODULUS

    lib = _require_lib()
    _register_arr(lib)
    ctx = _ctx_for("fr")
    if _P_MINUS_2 is None:
        _P_MINUS_2 = ints_to_limbs64([FR_MODULUS - 2], 4)
    a = _c(a)
    out = np.empty_like(a)
    lib.swtpu_fp_inv_batch(
        ctypes.byref(ctx), _u64p(a), _u64p(_P_MINUS_2), _u64p(out), a.shape[0]
    )
    return out


def fr_scalar_sub_arr(scalar_mont: np.ndarray, a: np.ndarray) -> np.ndarray:
    """out[i] = scalar - a[i] (Montgomery)."""
    lib = _require_lib()
    _register_arr(lib)
    ctx = _ctx_for("fr")
    a = _c(a)
    s = _c(scalar_mont)
    out = np.empty_like(a)
    lib.swtpu_fp_scalar_sub_vec(ctypes.byref(ctx), _u64p(s), _u64p(a), _u64p(out), a.shape[0])
    return out


def fr_spmv_arr(rows: np.ndarray, cols: np.ndarray, coeffs_mont: np.ndarray,
                x_mont: np.ndarray, out_len: int) -> np.ndarray:
    """out[rows[i]] += coeffs[i]·x[cols[i]] over [out_len, 4] (Montgomery)."""
    lib = _require_lib()
    _register_arr(lib)
    ctx = _ctx_for("fr")
    rows = np.ascontiguousarray(rows, dtype=np.uint32)
    cols = np.ascontiguousarray(cols, dtype=np.uint32)
    coeffs_mont = _c(coeffs_mont)
    x_mont = _c(x_mont)
    out = np.zeros((out_len, 4), dtype="<u8")
    lib.swtpu_fp_spmv(
        ctypes.byref(ctx), rows.shape[0], _u32p(rows), _u32p(cols),
        _u64p(coeffs_mont), _u64p(x_mont), _u64p(out),
    )
    return out


def fr_div_linear_arr(coeffs_mont: np.ndarray, z_mont: np.ndarray):
    """Synthetic division by (X − z): (quotient [N-1,4], remainder [1,4])."""
    lib = _require_lib()
    _register_arr(lib)
    ctx = _ctx_for("fr")
    coeffs_mont = _c(coeffs_mont)
    n = coeffs_mont.shape[0]
    quot = np.zeros((max(n - 1, 1), 4), dtype="<u8")
    rem = np.zeros((1, 4), dtype="<u8")
    z = _c(z_mont)
    lib.swtpu_fp_div_linear(
        ctypes.byref(ctx), _u64p(coeffs_mont), n, _u64p(z), _u64p(quot), _u64p(rem)
    )
    return quot[: n - 1], rem


def fr_horner_arr(coeffs_mont: np.ndarray, z_mont: np.ndarray) -> np.ndarray:
    """Evaluate at z (Montgomery in/out) -> [1, 4]."""
    lib = _require_lib()
    _register_arr(lib)
    ctx = _ctx_for("fr")
    coeffs_mont = _c(coeffs_mont)
    z = _c(z_mont)
    out = np.zeros((1, 4), dtype="<u8")
    lib.swtpu_fp_horner(
        ctypes.byref(ctx), _u64p(coeffs_mont), coeffs_mont.shape[0], _u64p(z), _u64p(out)
    )
    return out


def fr_axpy_arr(acc_mont: np.ndarray, poly_mont: np.ndarray, w_mont: np.ndarray) -> None:
    """acc[:len(poly)] += w · poly, in place (Montgomery)."""
    lib = _require_lib()
    _register_arr(lib)
    ctx = _ctx_for("fr")
    assert acc_mont.flags["C_CONTIGUOUS"]
    poly_mont = _c(poly_mont)
    w = _c(w_mont)
    lib.swtpu_fp_axpy(ctypes.byref(ctx), _u64p(acc_mont), _u64p(poly_mont), _u64p(w), poly_mont.shape[0])


_NTT_TWIDDLE_CACHE: dict = {}


def fr_ntt_arr(data_mont: np.ndarray, omega: int, scale: int | None = None) -> np.ndarray:
    """Natural-order radix-2 NTT over a [n, 4] Montgomery array (new array).
    Twiddle tables cached per (n, omega)."""
    from ..fields.bls12_377 import Fr, FR_MODULUS

    lib = _require_lib()
    ctx = _ctx_for("fr")
    data = _c(data_mont).copy()
    n = data.shape[0]
    key = (n, omega)
    tws = _NTT_TWIDDLE_CACHE.get(key)
    if tws is None:
        R = Fr.PARAMS.montgomery_r
        stages = []
        length = 2
        while length <= n:
            w = pow(omega, n // length, FR_MODULUS)
            wm = ints_to_limbs64([w * R % FR_MODULUS], 4)
            stages.append(fr_powers_arr(wm, length // 2))
            length <<= 1
        tws = np.concatenate(stages) if stages else np.zeros((0, 4), dtype="<u8")
        _NTT_TWIDDLE_CACHE[key] = tws
    lib.swtpu_ntt(ctypes.byref(ctx), _u64p(data), n, _u64p(tws))
    if scale is not None:
        R = Fr.PARAMS.montgomery_r
        from ..fields.bls12_377 import FR_MODULUS as _P

        s = ints_to_limbs64([scale * R % _P], 4)
        lib.swtpu_scale(ctypes.byref(ctx), _u64p(data), n, _u64p(s))
    return data


def g1_msm_arr(points_native: np.ndarray, scalars_std: np.ndarray,
               window_bits: int | None = None):
    """Pippenger MSM over preconverted points [N, 18] and standard-form
    scalar limbs [N, 4] (no bigint conversion — the FrVec commit path)."""
    lib = _require_lib()
    ctx = _ctx_for("fq")
    if window_bits is None:
        window_bits = _msm_window_bits(points_native.shape[0])
    pts = np.ascontiguousarray(points_native, dtype="<u8")
    scs = np.ascontiguousarray(scalars_std, dtype="<u8")
    out = np.zeros((1, 18), dtype="<u8")
    lib.swtpu_g1_msm(
        ctypes.byref(ctx), _u64p(pts), _u64p(scs), pts.shape[0], window_bits, _u64p(out)
    )
    return _points_from_native(out)[0]
