"""Benchmark: BLS12-377 Fr Montgomery-mul throughput per chip (the
north-star kernel metric from BASELINE.json: 'field muls/sec/chip').

Also measures NTT throughput as a secondary (printed to stderr).  The
``vs_baseline`` ratio compares against an estimated single-thread arkworks
CPU rate of 3e7 muls/s (the reference publishes no numbers — BASELINE.md;
arkworks Fr mul ≈ 30ns single-thread is the community ballpark).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

ARKWORKS_CPU_MULS_PER_SEC = 3.0e7


def main() -> None:
    from simpleworks_tpu.fields.bls12_377 import Fr, FR_MODULUS
    from simpleworks_tpu.fields.device import DeviceField
    from simpleworks_tpu.fields.pack import pack_standard
    

    from simpleworks_tpu.ops.mont_mul_pallas import make_mont_mul

    batch = 1 << 19
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 1 << 62, size=batch, dtype=np.int64).tolist()
    R = Fr.PARAMS.montgomery_r
    a = jnp.asarray(pack_standard([v * R % FR_MODULUS for v in vals], Fr.PARAMS)).T.copy()
    b = jnp.roll(a, 1, axis=1)

    mul = make_mont_mul(Fr.PARAMS)  # Pallas VMEM kernel, limb-major layout
    out = mul(a, b)
    out.block_until_ready()  # compile
    iters = 20
    start = time.perf_counter()
    for _ in range(iters):
        out = mul(out, b)
    out.block_until_ready()
    elapsed = time.perf_counter() - start
    mul_throughput = batch * iters / elapsed

    # secondary: MXU NTT throughput (elements transformed / sec); guarded so
    # the headline JSON line always prints
    try:
        from simpleworks_tpu.ops.ntt_mxu import get_mxu_ntt

        n = 1 << 16
        ntt = get_mxu_ntt(n)
        x = a[:, :n]  # limb-major [16, n]
        fwd = jax.jit(ntt.fft_mont)
        y = fwd(x)
        y.block_until_ready()
        start = time.perf_counter()
        ntt_iters = 20
        for _ in range(ntt_iters):
            y = fwd(y)
        y.block_until_ready()
        ntt_elapsed = time.perf_counter() - start
        print(
            f"[bench] mxu ntt n={n}: {ntt_elapsed / ntt_iters * 1e3:.2f} ms/transform "
            f"({n * ntt_iters / ntt_elapsed:.3e} elem/s)",
            file=sys.stderr,
        )
    except Exception as exc:  # pragma: no cover
        print(f"[bench] ntt secondary failed: {exc}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "fr_montmul_throughput_per_chip",
                "value": round(mul_throughput, 1),
                "unit": "muls/sec",
                "vs_baseline": round(mul_throughput / ARKWORKS_CPU_MULS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
