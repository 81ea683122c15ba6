"""Device NTT vs host oracle (bit-exactness at every size — SURVEY.md §4
'kernel vs native oracle' + hard-part #4 'validate against single-chip NTT
at every size')."""

import random

import pytest

from simpleworks_tpu.fields.bls12_377 import FR_MODULUS
from simpleworks_tpu.poly.domain import Radix2Domain
from simpleworks_tpu.poly.ntt_device import get_device_ntt

P = FR_MODULUS
rnd = random.Random(7)


@pytest.mark.parametrize("n", [2, 8, 64])
def test_device_fft_matches_host(n):
    coeffs = [rnd.randrange(P) for _ in range(n)]
    domain = Radix2Domain(n)
    ntt = get_device_ntt(n)
    assert ntt.fft(coeffs) == domain.fft(coeffs)


@pytest.mark.parametrize("n", [8, 64])
def test_device_ifft_matches_host(n):
    evals = [rnd.randrange(P) for _ in range(n)]
    domain = Radix2Domain(n)
    ntt = get_device_ntt(n)
    assert ntt.ifft(evals) == domain.ifft(evals)


def test_device_round_trip():
    n = 128
    ntt = get_device_ntt(n)
    coeffs = [rnd.randrange(P) for _ in range(n)]
    assert ntt.ifft(ntt.fft(coeffs)) == coeffs


def test_device_fft_midsize_2_12():
    """Mid-size default-suite case (VERDICT r3 #8): n = 2^12 — the twiddle
    staging and stage-loop structure at prover-relevant depth (12 stages),
    checked bit-exact against the host transform both directions."""
    n = 1 << 12
    coeffs = [rnd.randrange(P) for _ in range(n)]
    domain = Radix2Domain(n)
    ntt = get_device_ntt(n)
    fwd = ntt.fft(coeffs)
    assert fwd == domain.fft(coeffs)
    assert ntt.ifft(fwd) == coeffs
