"""R1CS core + example-circuit tests (reference examples/test-circuit.rs and
examples/manual-constraints.rs semantics; SURVEY.md §4 patterns 1-2)."""

import numpy as np

from simpleworks_tpu.examples import manual_constraints, test_circuit
from simpleworks_tpu.fields.bls12_377 import ConstraintF
from simpleworks_tpu.r1cs.constraint_system import ONE, ConstraintSystem
from simpleworks_tpu.r1cs.satisfiability import DeviceR1CS


def test_manual_constraints_satisfied():
    cs = manual_constraints.synthesize(3, 3)
    assert cs.is_satisfied()
    assert cs.num_constraints == 1
    assert cs.num_instance_variables == 2  # One + input
    assert cs.num_witness_variables == 1


def test_manual_constraints_unsatisfied():
    cs = manual_constraints.synthesize(3, 4)
    assert not cs.is_satisfied()
    assert cs.which_is_unsatisfied() is not None


def test_test_circuit_satisfied():
    cs = test_circuit.synthesize(1, 1)
    assert cs.is_satisfied()


def test_test_circuit_unsatisfied():
    cs = test_circuit.synthesize(1, 2)
    assert not cs.is_satisfied()


def test_namespace_attribution():
    cs = ConstraintSystem(ConstraintF)
    with cs.namespace("outer"):
        with cs.namespace("inner"):
            a = cs.new_witness_variable(5)
            cs.enforce_constraint(cs.lc((1, a)), cs.lc((1, ONE)), cs.lc((4, ONE)))
    assert cs.which_is_unsatisfied() == "0:outer/inner"


def test_lc_algebra():
    cs = ConstraintSystem(ConstraintF)
    a = cs.new_witness_variable(7)
    lc = cs.lc((2, a)) + cs.lc((3, a))
    assert cs.eval_lc(lc) == 35
    lc2 = lc - cs.lc((5, a))
    assert lc2.is_zero()


def test_matrices_layout():
    cs = manual_constraints.synthesize(3, 3)
    (ar, ac, av), (br, bc, bv), (cr, cc, cv) = cs.to_matrices()
    # A row: input col 1 coeff 1, witness col 2 coeff -1
    assert ar == [0, 0]
    assert ac == [1, 2]
    assert av[0] == 1 and av[1] == ConstraintF.PARAMS.modulus - 1
    assert (br, bc, bv) == ([0], [0], [1])
    assert cr == [] and cc == [] and cv == []


def test_device_satisfiability_batched():
    cs = manual_constraints.synthesize(3, 3)
    dev = DeviceR1CS(cs)
    # batch of assignments [1, input, witness]
    rows = [
        [1, 3, 3],   # satisfied
        [1, 3, 4],   # not
        [1, 7, 7],   # satisfied (same circuit, new witness — the DP axis)
        [1, 0, 1],   # not
    ]
    result = np.asarray(dev.check(rows))
    assert result.tolist() == [True, False, True, False]


def test_device_satisfiability_matches_host_on_gadget_circuit():
    cs = test_circuit.synthesize(42, 42)
    dev = DeviceR1CS(cs)
    z = [cs.full_assignment()]
    assert np.asarray(dev.check(z)).tolist() == [True]
    cs_bad = test_circuit.synthesize(41, 42)
    dev_bad = DeviceR1CS(cs_bad)
    assert np.asarray(dev_bad.check([cs_bad.full_assignment()])).tolist() == [False]
