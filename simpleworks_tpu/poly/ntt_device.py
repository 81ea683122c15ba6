"""TPU radix-2 NTT over Fr limb vectors — the prover's hot kernel
(SURVEY.md §2.3 'radix-2 NTT' / §2.4 SP axis).

Layout: evaluations as [N, 16] uint32 Montgomery-form limb arrays.  The
transform is an iterative Cooley-Tukey with a bit-reversal gather followed
by log2(N) reshape-based butterfly stages (no gathers inside the loop —
XLA-friendly, static shapes).  Twiddles are precomputed per stage in
Montgomery form.

Produces bit-identical results to the host oracle
(:func:`simpleworks_tpu.poly.domain.ntt_host`): natural-order input and
output, same root-of-unity conventions.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..fields.bls12_377 import FR_MODULUS, Fr, fr_root_of_unity
from ..fields.device import DeviceField
from ..fields.pack import pack_standard, unpack_standard

P = FR_MODULUS


@lru_cache(maxsize=None)
def fr_device_field() -> DeviceField:
    return DeviceField(Fr.PARAMS)


def _bit_reverse_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1).astype(np.int32) << (bits - 1 - b)
    return rev


class DeviceNTT:
    """Precomputed transform for one domain size (forward + inverse)."""

    def __init__(self, n: int):
        assert n & (n - 1) == 0 and n >= 2
        self.n = n
        self.df = fr_device_field()
        omega = fr_root_of_unity(n)
        omega_inv = pow(omega, P - 2, P)
        self.rev = jnp.asarray(_bit_reverse_indices(n))
        self.twiddles_fwd = self._stage_twiddles(omega)
        self.twiddles_inv = self._stage_twiddles(omega_inv)
        n_inv = pow(n, P - 2, P)
        R = Fr.PARAMS.montgomery_r
        self.n_inv_mont = jnp.asarray(
            pack_standard([n_inv * R % P], Fr.PARAMS)[0]
        )
        self._fft_jit = jax.jit(partial(self._transform, inverse=False))
        self._ifft_jit = jax.jit(partial(self._transform, inverse=True))

    def _stage_twiddles(self, omega: int):
        """For stage with half-block size h: [w^0..w^(h-1)], w = omega^(n/2h)."""
        R = Fr.PARAMS.montgomery_r
        tables = []
        length = 2
        while length <= self.n:
            half = length // 2
            w = pow(omega, self.n // length, P)
            vals, cur = [], 1
            for _ in range(half):
                vals.append(cur * R % P)  # Montgomery form
                cur = cur * w % P
            tables.append(jnp.asarray(pack_standard(vals, Fr.PARAMS)))
            length <<= 1
        return tables

    def _transform(self, x: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        df = self.df
        n = self.n
        x = jnp.take(x, self.rev, axis=0)
        tables = self.twiddles_inv if inverse else self.twiddles_fwd
        for stage, tw in enumerate(tables):
            m = 2 << stage
            half = m // 2
            y = x.reshape(n // m, m, -1)
            lo = y[:, :half, :]
            hi = y[:, half:, :]
            t = df.mul(hi, tw[None, :, :])
            x = jnp.concatenate([df.add(lo, t), df.sub(lo, t)], axis=1).reshape(n, -1)
        if inverse:
            x = df.mul(x, jnp.broadcast_to(self.n_inv_mont, x.shape))
        return x

    # -- mont-form device API ------------------------------------------------

    def fft_mont(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._fft_jit(x)

    def ifft_mont(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._ifft_jit(x)

    # -- host int API (bit-exact vs ntt_host) ----------------------------------

    def _to_mont(self, values: list[int]) -> jnp.ndarray:
        std = jnp.asarray(pack_standard(values, Fr.PARAMS))
        return self.df.mul(std, jnp.broadcast_to(self.df.r2_limbs, std.shape))

    def _from_mont(self, arr: jnp.ndarray) -> list[int]:
        one = jnp.zeros_like(arr).at[:, 0].set(1)
        std = self.df.mul(arr, one)
        return unpack_standard(np.asarray(std), Fr.PARAMS)

    def fft(self, coeffs: list[int]) -> list[int]:
        padded = list(coeffs) + [0] * (self.n - len(coeffs))
        return self._from_mont(self.fft_mont(self._to_mont(padded)))

    def ifft(self, evals: list[int]) -> list[int]:
        assert len(evals) == self.n
        return self._from_mont(self.ifft_mont(self._to_mont(evals)))


@lru_cache(maxsize=8)
def get_device_ntt(n: int) -> DeviceNTT:
    return DeviceNTT(n)
