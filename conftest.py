"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on a forced 8-device CPU host platform (the driver separately
dry-runs the multi-chip path via ``__graft_entry__.dryrun_multichip``).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Force CPU even when a TPU platform (e.g. the axon tunnel) is configured:
# tests validate sharding on the virtual 8-device mesh.  The environment's
# sitecustomize imports jax at interpreter startup, so setting the env var
# here is too late — update the live config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
# keep test-scale SRS artifacts out of the machine-wide disk cache
os.environ.setdefault("SWTPU_SRS_CACHE_DIR", "/tmp/swtpu_srs_cache_tests")
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: the unrolled limb kernels are expensive
    # to compile on the 2-vCPU test box; cache across runs.  Per-HOST dir:
    # XLA:CPU AOT artifacts bake in the compile machine's CPU features and
    # run pathologically (or SIGILL) elsewhere — ops/accel.host_cache_dir.
    from simpleworks_tpu.ops.accel import host_cache_dir

    jax.config.update("jax_compilation_cache_dir", host_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
