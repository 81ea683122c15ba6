"""Mesh-sharded kernels on the virtual 8-device CPU mesh: sharded NTT vs
host oracle, sharded MSM vs host Pippenger, DP witness checking
(SURVEY.md §2.4 acceptance: identical results at 1 chip vs N chips)."""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from simpleworks_tpu.curves.bls12_377 import G1Point
from simpleworks_tpu.examples import manual_constraints
from simpleworks_tpu.fields.bls12_377 import FR_MODULUS
from simpleworks_tpu.kzg.msm import msm
from simpleworks_tpu.parallel.msm_sharded import sharded_msm_host
from simpleworks_tpu.parallel.ntt_sharded import sharded_ntt_host
from simpleworks_tpu.parallel.witness_dp import sharded_check_host
from simpleworks_tpu.poly.domain import Radix2Domain

#: shard_map programs over the virtual 8-device mesh compile for minutes on
#: a 2-vCPU XLA CPU backend — run as a dedicated CI job (pytest -m mesh),
#: not in the default fast suite
pytestmark = pytest.mark.mesh


@pytest.fixture(scope="module")
def mesh():
    devices = np.array(jax.devices()[:8])
    assert len(devices) == 8, "conftest must force 8 virtual devices"
    return Mesh(devices, ("shard",))


def test_sharded_ntt_matches_host(mesh):
    import random

    rnd = random.Random(3)
    n = 256  # 16 x 16 over 8 devices
    values = [rnd.randrange(FR_MODULUS) for _ in range(n)]
    expected = Radix2Domain(n).fft(values)
    got = sharded_ntt_host(mesh, "shard", values)
    assert got == expected


@pytest.mark.parametrize("schedule", ["device", "host"])
def test_sharded_msm_matches_host(mesh, schedule):
    g = G1Point.generator()
    points = [g.scalar_mul(i + 3) for i in range(16)]
    scalars = [(i * 17 + 5) for i in range(16)]
    expected = msm(points, scalars)
    got = sharded_msm_host(mesh, "shard", points, scalars, schedule=schedule)
    assert got == expected


def test_sharded_msm_uneven_and_wide(mesh):
    """Non-divisible point count (padded) + 33-byte scalars through the
    digits schedule."""
    import random

    rnd = random.Random(7)
    g = G1Point.generator()
    n = 13  # not divisible by 8 devices
    points = [g.scalar_mul(i + 2) for i in range(n)]
    scalars = [rnd.randrange(FR_MODULUS) for _ in range(n)]
    got = sharded_msm_host(mesh, "shard", points, scalars, schedule="device")
    assert got == msm(points, scalars)


def test_sharded_witness_dp(mesh):
    cs = manual_constraints.synthesize(3, 3)
    rows = [
        [1, 3, 3],
        [1, 3, 4],
        [1, 9, 9],
        [1, 2, 3],
        [1, 0, 0],
        [1, 5, 5],
        [1, 5, 6],
        [1, 7, 7],
    ]
    result = sharded_check_host(mesh, "shard", cs, rows)
    assert [bool(r) for r in result] == [True, False, True, False, True, True, False, True]


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.shape == args[0].shape


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_default_mesh_from_config():
    """parallel.default_mesh builds the configured 1-D mesh (axis name and
    device count from FrameworkConfig)."""
    from simpleworks_tpu.config import DEFAULT_CONFIG
    from simpleworks_tpu.parallel import default_mesh

    m = default_mesh()
    assert m.axis_names == (DEFAULT_CONFIG.mesh_axis,)
    assert m.shape[DEFAULT_CONFIG.mesh_axis] == len(jax.devices())
