"""The five reference workloads (reference ``examples/``, ``Cargo.toml:50-60``):

* :mod:`.test_circuit` — two equal UInt8 witnesses
* :mod:`.manual_constraints` — raw R1CS equality circuit
* :mod:`.merkle_tree` — 8-leaf Pedersen Merkle membership
* :mod:`.schnorr_circuit` — in-circuit Schnorr verification
* :mod:`.simple_payments` — account ledger with Marlin-proved transactions
"""
