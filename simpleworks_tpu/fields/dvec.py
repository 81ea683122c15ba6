"""DVec: the device-resident polynomial plane over BLS12-377 Fr.

VERDICT r4 #1: the prover's polynomial state previously lived on the host
between AHP rounds, shipping ~32 B/element over the host↔device link for
every NTT/commit — on an axon-tunneled chip (~40 MB/s) that link gated
the TPU out of most prove work.  This module makes the chip the prover's
home: field vectors as ``[16, N]``-u32 Montgomery limb arrays that STAY
on the device across fft → pointwise → ifft → divide → commit chains
(reference hot path: the AHP rounds of ``MarlinInst::prove``,
``/root/reference/src/marlin/mod.rs:75``).

Every op has two traced implementations behind one surface:

* **TPU**: Pallas kernels (`ops/mont_mul_pallas`) + the MXU DFT-as-matmul
  NTT (`ops/ntt_mxu`) — the production path;
* **CPU/virtual**: pure-XLA twins (`fields/device.DeviceField`, the XLA
  butterfly NTT) — bit-exact, used by tests and the multi-chip dryrun.

Sequential-looking polynomial ops are reformulated as log-depth device
programs: divide-by-vanishing is a strided suffix sum
(``associative_scan`` with the modular add), divide-by-linear composes
affine Horner maps associatively, and evaluation is a powers build +
multiply + tree reduction.  All ops are bit-exact with the FrVec host
oracles (tests/test_dvec.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from .bls12_377 import FR_MODULUS, Fr
from .device import DeviceField

from ..ops.accel import enable_persistent_compile_cache

enable_persistent_compile_cache()

P = FR_MODULUS
L = 16  # 16-bit limbs per element
_TILE = 512  # Pallas batch tile (ops/mont_mul_pallas.TILE)


@lru_cache(maxsize=1)
def _df() -> DeviceField:
    return DeviceField(Fr.PARAMS)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def mont_scalar_np(value: int) -> np.ndarray:
    """[16, 1] u32 Montgomery limb column of one scalar."""
    m = int(value) % P * Fr.PARAMS.montgomery_r % P
    return np.array(
        [[(m >> (16 * t)) & 0xFFFF] for t in range(L)], dtype=np.uint32
    )


# ------------------------------------------------------------ elementwise ----


@lru_cache(maxsize=4)
def _elementwise_ops(on_tpu: bool):
    """(mul, add, sub) on [16, N]-u32 Montgomery arrays (traced fns)."""
    if on_tpu:
        from ..ops.mont_mul_pallas import make_mod_addsub, make_mont_mul

        mul = make_mont_mul(Fr.PARAMS)
        add, sub = make_mod_addsub(Fr.PARAMS)
        return mul, add, sub
    df = _df()
    return (
        lambda a, b: df.mul(a.T, b.T).T,
        lambda a, b: df.add(a.T, b.T).T,
        lambda a, b: df.sub(a.T, b.T).T,
    )


def _quant_width(n: int) -> int:
    """Quantize a batch width to a 2-significant-bit grid (≥ one Pallas
    tile): every distinct width is a separate XLA/Mosaic compile — on the
    tunneled backend a REMOTE one — so the dozen polynomial widths of a
    prove collapse onto ≤4 shapes per octave."""
    if n <= _TILE:
        return _TILE
    step = 1 << max(9, n.bit_length() - 3)
    return ((n + step - 1) // step) * step


def _tile_safe(op):
    """Pad the batch axis to the quantized width, run, slice back — lets
    every op accept arbitrary widths (powers build, scan interiors)."""

    def run(a, b):
        n = a.shape[1]
        if n == 0:
            return a
        qn = _quant_width(n)
        if qn == n:
            return op(a, b)
        pad = qn - n
        return op(
            jnp.pad(a, ((0, 0), (0, pad))), jnp.pad(b, ((0, 0), (0, pad)))
        )[:, :n]

    return run


def mul(a, b):
    return _tile_safe(_elementwise_ops(_on_tpu())[0])(a, b)


def add(a, b):
    return _tile_safe(_elementwise_ops(_on_tpu())[1])(a, b)


def sub(a, b):
    return _tile_safe(_elementwise_ops(_on_tpu())[2])(a, b)


def scale(a, scalar_mont):
    """a · s with s a [16, 1] Montgomery limb column (numpy or jnp)."""
    return mul(a, jnp.broadcast_to(jnp.asarray(scalar_mont), a.shape))


def rsub_scalar(a, scalar_mont):
    """s − a elementwise."""
    return sub(jnp.broadcast_to(jnp.asarray(scalar_mont), a.shape), a)


def inv(a):
    """Elementwise inverse via Fermat (x^(p−2); zeros stay zero)."""
    return pow_const(a, P - 2)


@lru_cache(maxsize=8)
def _pow_fn(on_tpu: bool, exponent: int):
    if on_tpu:
        from ..ops.mont_mul_pallas import make_mont_pow

        return make_mont_pow(Fr.PARAMS, exponent)
    df = _df()

    def run(a):
        return df.pow_host_exponent(a.T, exponent).T

    return jax.jit(run)


def pow_const(a, exponent: int):
    fn = _pow_fn(_on_tpu(), exponent)
    n = a.shape[1]
    if not _on_tpu():
        return fn(a)
    qn = _quant_width(n)
    if qn == n:
        return fn(a)
    return fn(jnp.pad(a, ((0, 0), (0, qn - n))))[:, :n]


# ---------------------------------------------------------------- reshape ----


def pad_to(a, n: int):
    cur = a.shape[1]
    if cur >= n:
        return a
    return jnp.pad(a, ((0, 0), (0, n - cur)))


def const_vec(value: int, n: int):
    """[16, n] Montgomery array of one repeated constant."""
    return jnp.broadcast_to(jnp.asarray(mont_scalar_np(value)), (L, n))


# --------------------------------------------------------------- log-depth ----


def _addcarry_pair(x, y):
    """Modular add of two [16, ...] limb stacks (carry chain + cond-sub) —
    the associative combine for scans/reductions.  Pure jnp (runs inside
    associative_scan on both backends)."""
    mask = jnp.uint32(0xFFFF)
    p_limbs = jnp.asarray(
        np.array(
            [[(P >> (16 * t)) & 0xFFFF] for t in range(L)], dtype=np.uint32
        )
    )
    carry = jnp.zeros_like(x[0:1])
    res = []
    for i in range(L):
        v = x[i : i + 1] + y[i : i + 1] + carry
        res.append(v & mask)
        carry = v >> 16
    r = jnp.concatenate(res, axis=0)
    borrow = jnp.zeros_like(carry)
    diff = []
    pb = jnp.broadcast_to(p_limbs.reshape((L,) + (1,) * (r.ndim - 1)), r.shape)
    for i in range(L):
        d = r[i : i + 1] - pb[i : i + 1] - borrow
        diff.append(d & mask)
        borrow = (d >> 31) & 1
    d = jnp.concatenate(diff, axis=0)
    return jnp.where((carry > 0) | (borrow == 0), d, r)


_SUM_CHUNK = 4096  # 4096 · (2^16 − 1) < 2^28: u32-safe partial sums


def sum_limbs_raw(a):
    """Σ over the batch axis as RAW per-limb partial sums -> [16, K] u32,
    ONE device op.  Chunked so partials stay < 2^28 (jax runs in 32-bit
    mode by default — a u64 jnp.sum silently wraps at 2^32, which passed
    small-circuit tests and corrupted σ₂ at m = 2^18).  Pair with
    :func:`limb_sums_to_int`: the tiny [16, K] fetch replaces ~20 halving
    dispatches per reduction."""
    n = a.shape[1]
    k = -(-max(n, 1) // _SUM_CHUNK)
    padded = pad_to(a, k * _SUM_CHUNK).reshape(L, k, _SUM_CHUNK)
    return jnp.sum(padded, axis=2, dtype=jnp.uint32)


def limb_sums_to_int(sums: np.ndarray) -> int:
    """[16, K] u32 raw partial limb sums -> standard-form int of the
    Montgomery sum (host-side exact fold + one Montgomery correction)."""
    arr = np.asarray(sums, dtype=np.uint64)
    m = 0
    for t in range(L - 1, -1, -1):
        m = (m << 16) + int(arr[t].sum())
    return m % P * pow(Fr.PARAMS.montgomery_r, -1, P) % P


def sum_reduce(a):
    """Σ over the batch axis -> [16, 1] (log-depth halving tree)."""
    n = a.shape[1]
    if n == 0:
        return jnp.zeros((L, 1), jnp.uint32)
    while n > 1:
        half = n // 2
        lo, hi = a[:, :half], a[:, half : 2 * half]
        red = _addcarry_pair(lo, hi)
        if n % 2:
            red = jnp.concatenate([red, a[:, n - 1 :]], axis=1)
            n = half + 1
        else:
            n = half
        a = red
    return a


def divide_by_vanishing(a, ell: int):
    """(quotient, remainder) of division by X^ell − 1 on a [16, N] coeff
    array: quotient[i] = Σ_{j>i, j≡i (mod ell)} … — a strided suffix sum,
    here as an associative_scan over the block axis (log-depth)."""
    n = a.shape[1]
    if n <= ell:
        return a[:, :0], a
    k = -(-n // ell)  # ceil blocks
    padded = pad_to(a, k * ell).reshape(L, k, ell)
    # suffix sums over blocks: S_b = Σ_{b' >= b} c_{b'}
    s = jax.lax.associative_scan(_addcarry_pair, padded, axis=1, reverse=True)
    remainder = s[:, 0, :]
    quotient = s[:, 1:, :].reshape(L, (k - 1) * ell)[:, : n - ell]
    return quotient, remainder


def divide_by_linear(a, z_mont, z_int: int | None = None):
    """(quotient [16, N−1], remainder [16, 1]) of division by (X − z).

    Suffix-Horner formulation: with w_t = c_t·z^t and S_j = Σ_{t≥j} w_t,
    the quotient is q_j = z^{−(j+1)}·S_{j+1} and the remainder is
    S_0 = p(z).  Two powers builds + two multiplies + ONE suffix-sum
    associative_scan whose combine is the cheap modular add — an earlier
    formulation composed Horner affine maps through the full Montgomery
    multiply and its associative_scan graph took tens of minutes of XLA
    compile at n ≈ 4·10⁵.  Requires z ≠ 0 (z is a Fiat-Shamir challenge;
    the z = 0 measure-zero case degenerates to a coefficient shift).

    ``z_int``: standard-form int of z when the caller has it (used to
    build the power tables host-side; required on the TPU path)."""
    n = a.shape[1]
    if n == 0:
        return a, jnp.zeros((L, 1), jnp.uint32)
    if z_int is None:
        raise ValueError("divide_by_linear needs the standard-form point")
    z = z_int % P
    if z == 0:
        return a[:, 1:], a[:, :1]
    w = mul(a, powers_vec(z, n))
    s = jax.lax.associative_scan(_addcarry_pair, w, axis=1, reverse=True)
    z_inv = pow(z, P - 2, P)
    # z^{-(j+1)} for j = 0..n-2
    inv_pows = mul(
        powers_vec(z_inv, n - 1) if n > 1 else jnp.zeros((L, 0), jnp.uint32),
        jnp.broadcast_to(jnp.asarray(mont_scalar_np(z_inv)), (L, max(n - 1, 0))),
    )
    quotient = mul(s[:, 1:], inv_pows)
    remainder = s[:, :1]
    return quotient, remainder


def evaluate(a, z: int):
    """p(z) for a [16, N] coeff array -> [16, 1] Montgomery result
    (powers build: log N vector muls; then one mul + tree reduction)."""
    n = a.shape[1]
    if n == 0:
        return jnp.zeros((L, 1), jnp.uint32)
    return sum_reduce(mul(a, powers_vec(z, n)))


_POWERS_MEMO: dict = {}
_POWERS_MEMO_MAX = 8


def powers_vec(base: int, n: int):
    """[16, n] Montgomery array [1, z, z², …] via log-doubling (~log n
    dispatches).  Memoized on (base, n): a prove builds each challenge's
    table once and reuses it across the evaluations and the opening
    quotient — on a high-latency link every avoided rebuild saves ~1.5 s."""
    key = (base % P, n)
    hit = _POWERS_MEMO.get(key)
    if hit is not None:
        return hit
    out = _powers_vec_uncached(base, n)
    if len(_POWERS_MEMO) >= _POWERS_MEMO_MAX:
        _POWERS_MEMO.pop(next(iter(_POWERS_MEMO)))
    _POWERS_MEMO[key] = out
    return out


def _powers_vec_uncached(base: int, n: int):
    out = jnp.asarray(mont_scalar_np(1))
    width = 1
    while width < n:
        step = min(width, n - width)
        top = pow(base, width, P)
        out = jnp.concatenate(
            [out, mul(out[:, :step], jnp.broadcast_to(
                jnp.asarray(mont_scalar_np(top)), (L, step)))],
            axis=1,
        )
        width += step
    return out


# ------------------------------------------------------------- transforms ----


@lru_cache(maxsize=16)
def _ntt(on_tpu: bool, n: int):
    if on_tpu:
        from ..ops.ntt_mxu import get_mxu_ntt

        ntt = get_mxu_ntt(n)
        # whole-transform jit: the eager 4-step chain dispatches ~12
        # device programs per transform — ~1 s of pure latency on the
        # tunneled attachment; as one program it is a single dispatch
        return jax.jit(ntt.fft_mont), jax.jit(ntt.ifft_mont)
    from ..poly.ntt_device import get_device_ntt

    ntt = get_device_ntt(n)
    return (
        jax.jit(lambda x: ntt.fft_mont(x.T.astype(jnp.uint32)).T),
        jax.jit(lambda x: ntt.ifft_mont(x.T.astype(jnp.uint32)).T),
    )


def fft(a, n: int):
    """coeffs [16, ≤n] -> evaluations [16, n] over the size-n domain
    (natural order, Montgomery in/out)."""
    return _ntt(_on_tpu(), n)[0](pad_to(a, n))


def ifft(a, n: int):
    """evaluations [16, n] -> coeffs (1/n folded in)."""
    return _ntt(_on_tpu(), n)[1](a)


# ------------------------------------------------------------ host bridge ----


def from_frvec(vec) -> jnp.ndarray:
    """FrVec -> device [16, N] u32 (uploaded as u16: half the bytes)."""
    n = len(vec)
    u16 = np.ascontiguousarray(vec.a.view("<u2").reshape(n, L).T)
    return jnp.asarray(u16).astype(jnp.uint32)


def to_frvec(a):
    """Device [16, N] u32 -> FrVec (fetches)."""
    from .frvec import FrVec

    return FrVec.from_device_limbs(np.asarray(jax.device_get(a)).T)


def scalar_to_int(col) -> int:
    """[16, 1] Montgomery column -> standard-form int (fetches)."""
    limbs = np.asarray(jax.device_get(col)).reshape(L)
    m = 0
    for t in range(L - 1, -1, -1):
        m = (m << 16) | int(limbs[t])
    return m * pow(Fr.PARAMS.montgomery_r, -1, P) % P
