"""MXU (DFT-as-matmul) NTT vs the host oracle.

The kernel path is exercised in interpret mode on CPU (slow — marked);
on TPU hardware the same code runs compiled (bench.py + the TPU smoke
runs used during development are the fast path).
"""

import random

import numpy as np
import pytest

from simpleworks_tpu.fields.bls12_377 import Fr, FR_MODULUS as P
from simpleworks_tpu.fields.pack import pack_standard, unpack_standard
from simpleworks_tpu.poly.domain import Radix2Domain

rnd = random.Random(41)


@pytest.mark.slow
def test_mxu_ntt_matches_host_roundtrip():
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from simpleworks_tpu.ops.ntt_mxu import get_mxu_ntt

    n = 256
    vals = [rnd.randrange(P) for _ in range(n)]
    R = Fr.PARAMS.montgomery_r
    x = jnp.asarray(pack_standard([v * R % P for v in vals], Fr.PARAMS).T.copy())
    ntt = get_mxu_ntt(n)
    with pltpu.force_tpu_interpret_mode():
        out = ntt.fft_mont(x)
        back = ntt.ifft_mont(out)
    rinv = pow(R, -1, P)
    got = [v * rinv % P for v in unpack_standard(np.asarray(out).T, Fr.PARAMS)]
    assert got == Radix2Domain(n).fft(vals)
    rt = [v * rinv % P for v in unpack_standard(np.asarray(back).T, Fr.PARAMS)]
    assert rt == vals


def test_mxu_table_tree_structure():
    from simpleworks_tpu.fields.bls12_377 import fr_root_of_unity
    from simpleworks_tpu.ops.ntt_mxu import _build_level_tables

    tree = _build_level_tables(1 << 13, fr_root_of_unity(1 << 13), 1)
    kind, n1, n2, w1_8, t_mont, sub = tree
    assert kind == "split" and (n1, n2) == (128, 64)
    assert w1_8.shape == (32, 128, 128)
    assert t_mont.shape == (16, 1 << 13)
    assert sub[0] == "base" and sub[1] == 64 and sub[2].shape == (32, 64, 64)
