"""simpleworks_tpu — a TPU-native ZK primitive framework.

A from-scratch re-design of the capabilities of ``lambdaclass/simpleworks``
(and the arkworks stack it delegates to) for TPU hardware: exact host-side
field arithmetic for circuit synthesis and serde, and batched limb-vector
kernels (JAX / XLA / Pallas) for every hot loop — NTT, MSM, Poseidon, Pedersen
hashing, Merkle building and R1CS satisfiability — sharded over device meshes
with JAX collectives.

Layer map (mirrors SURVEY.md §1):

* ``fields``   — BLS12-377 Fr/Fq/FrEd, host exact + device limb kernels (L1 + §2.3)
* ``r1cs``     — constraint system builder & batched satisfiability (§2.3 R1CS core)
* ``gadgets``  — Boolean/UInt8..128/Int8/Address/Field circuit stdlib (L2)
* ``curves``   — ed-on-bls12-377, BLS12-377 G1/G2, pairing (§2.3 curves)
* ``hash``     — Poseidon & Pedersen, native + in-circuit (L3)
* ``merkle``   — Merkle trees + membership circuits (L3)
* ``schnorr``  — Schnorr signatures, native + verify gadget (L3)
* ``poly``     — dense polynomials, radix-2 NTT domains (§2.3 ark-poly)
* ``kzg``      — KZG10 / MarlinKZG polynomial commitments (§2.3 ark-poly-commit)
* ``marlin``   — Marlin AHP prover/verifier facade (L4)
* ``parallel`` — mesh-sharded NTT / MSM / witness batching (§2.4)
* ``examples`` — the five reference workloads (L5)
"""

__version__ = "0.1.0"
