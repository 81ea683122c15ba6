"""Child process of the 2-process multi-host prover smoke
(tests/test_parallel.py::test_prove_bytes_multiprocess — VERDICT r3 #5).

Each child joins a 2-process jax.distributed job (Gloo collectives over
the DCN slot), builds the global 2x4-device mesh, and runs the FULL
sharded Marlin prove — sharded 4-step NTTs + sharded Pippenger MSMs
routed through the production accel router — printing the serialized
proof bytes for the parent to pin against the single-process path.
Every process derives identical host-side data (deterministic RNG), the
precondition ``parallel.multihost.put_global`` documents.
"""

import os
import sys


def _square_chain_cs(n_constraints: int, x: int = 3):
    from simpleworks_tpu.fields.bls12_377 import ConstraintF, FR_MODULUS
    from simpleworks_tpu.r1cs.constraint_system import ONE, ConstraintSystem

    cs = ConstraintSystem(ConstraintF)
    a = cs.new_input_variable(x)
    cur_val = x
    cur = cs.new_witness_variable(cur_val)
    cs.enforce_constraint(cs.lc((1, a)) - cs.lc((1, cur)), cs.lc((1, ONE)), cs.lc())
    for _ in range(n_constraints):
        nxt_val = cur_val * cur_val % FR_MODULUS
        nxt = cs.new_witness_variable(nxt_val)
        cs.enforce_constraint(cs.lc((1, cur)), cs.lc((1, cur)), cs.lc((1, nxt)))
        cur, cur_val = nxt, nxt_val
    return cs, x


def main() -> None:
    coordinator, process_id = sys.argv[1], int(sys.argv[2])
    # 4 local virtual CPU devices per process -> 8 global (must be set
    # before the backend initializes; overrides the 8-device flag a pytest
    # parent exports)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/swtpu_jax_cache")
    from simpleworks_tpu.parallel import multihost

    multihost.initialize(coordinator, num_processes=2, process_id=process_id)
    import numpy as np
    from jax.sharding import Mesh

    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.process_count() == 2

    import simpleworks_tpu.parallel.msm_sharded as ms
    import simpleworks_tpu.parallel.ntt_sharded as ns
    from simpleworks_tpu import marlin
    from simpleworks_tpu.marlin.serialization import serialize_proof
    from simpleworks_tpu.ops import accel

    cs, x = _square_chain_cs(120)
    srs = marlin.universal_setup(128, 128, 128, marlin.generate_rand())
    pk, vk = marlin.index(srs, cs)

    calls = {"ntt": 0, "msm": 0}
    orig_ntt, orig_msm = ns.sharded_transform_vec, ms.sharded_msm_native

    def count_ntt(*args, **kw):
        calls["ntt"] += 1
        return orig_ntt(*args, **kw)

    def count_msm(*args, **kw):
        calls["msm"] += 1
        return orig_msm(*args, **kw)

    ns.sharded_transform_vec = count_ntt
    ms.sharded_msm_native = count_msm
    mesh = Mesh(np.array(jax.devices()), ("shard",))
    # dryrun-style thresholds: only the largest AHP domain shards its NTTs
    # and only the largest MSMs shard — a minimal program set, because two
    # children compile the same programs concurrently on a small host and
    # the XLA:CPU cache does not round-trip (docs/performance.md)
    h_size = pk.index.info.domain_h_size
    accel.SHARDED_NTT_THRESHOLD = 8 * h_size
    accel.SHARDED_MSM_THRESHOLD = 3 * h_size
    accel.set_prover_mesh(mesh, "shard")
    try:
        proof = marlin.prove(pk, cs)
    finally:
        accel.set_prover_mesh(None, "shard")
    assert calls["ntt"] > 0, "sharded NTT never engaged — smoke would be vacuous"
    assert calls["msm"] > 0, "sharded MSM never engaged — smoke would be vacuous"
    assert marlin.verify(vk, [x], proof)
    print("PROOF_HEX:" + serialize_proof(proof).hex(), flush=True)


if __name__ == "__main__":
    main()
