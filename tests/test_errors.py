"""Soundness-relevant guards are typed errors, not ``assert``s.

The reference enforces these with ``ensure!``/``Result`` (e.g.
``src/marlin/mod.rs:42-44``); ours must survive ``python -O`` — so they
raise :class:`SimpleworksError`, never ``AssertionError``.
"""

import subprocess
import sys

import pytest

from simpleworks_tpu.errors import SimpleworksError, ensure
from simpleworks_tpu.kzg import kzg10
from simpleworks_tpu.poly.dense import DensePoly
from simpleworks_tpu.utils.rng import test_rng


def test_ensure_raises_typed_error():
    ensure(True, "fine")
    with pytest.raises(SimpleworksError, match="boom"):
        ensure(False, "boom")


def test_kzg_degree_guards_are_typed():
    srs = kzg10.setup(8, test_rng())
    with pytest.raises(SimpleworksError):
        kzg10.commit(srs, DensePoly(list(range(1, 12))))
    with pytest.raises(SimpleworksError):
        kzg10.commit(srs, DensePoly([1, 2, 3, 4, 5]), degree_bound=3)


def test_guards_survive_python_O():
    """Under ``python -O`` plain asserts vanish; the KZG degree-bound check
    must still reject (the soundness regression VERDICT r1 flagged)."""
    code = (
        "from simpleworks_tpu.kzg.kzg10 import setup, commit\n"
        "from simpleworks_tpu.poly.dense import DensePoly\n"
        "from simpleworks_tpu.utils.rng import test_rng\n"
        "from simpleworks_tpu.errors import SimpleworksError\n"
        "srs = setup(8, test_rng())\n"
        "try:\n"
        "    commit(srs, DensePoly(list(range(1, 12))))\n"
        "except SimpleworksError:\n"
        "    print('REJECTED')\n"
    )
    out = subprocess.run(
        [sys.executable, "-O", "-c", code], capture_output=True, text=True, timeout=300
    )
    assert out.returncode == 0, out.stderr
    assert "REJECTED" in out.stdout
