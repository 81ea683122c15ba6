"""Benchmarks for the three BASELINE.json north-star metrics on one chip:

1. ``fr_montmul_throughput_per_chip`` (headline JSON line) — BLS12-377 Fr
   Montgomery-mul throughput of the Pallas VMEM kernel.  Timed region
   includes a device→host fetch of the dependent result (the tunneled
   backend's ``block_until_ready`` can ack before execution completes —
   docs/performance.md), so the number is defensible; the raw
   no-fetch rate is also reported in ``extra``.
2. ``msm_points_per_sec`` — device Pippenger MSM (ops/msm_pippenger) at
   N = 2^17, end-to-end per call, bit-checked against the native host
   Pippenger, whose throughput is also reported.
3. ``marlin_proofs_per_sec`` — ``marlin.prove`` wall time on the Schnorr
   verification circuit (the simple-payments signature workload,
   reference examples/simple-payments/transaction.rs:89-139) at the
   reference SRS scale (100_000, 25_000, 300_000), with the framework's
   default acceleration routing; SRS+index time reported separately.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
compares the headline against the community-ballpark single-thread
arkworks CPU rate of 3e7 Fr muls/s; per-metric baselines for the extras
(this host's native single-thread MSM, the r1 CPU prove time) live in the
``extra`` object of the same JSON line.

Output protocol: the cumulative headline JSON line is (re)printed after
EVERY leg and again from a SIGTERM handler, so an outer deadline kill
can never erase already-measured legs — the last complete line on
stdout is always the most complete result.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import signal
import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

ARKWORKS_CPU_MULS_PER_SEC = 3.0e7
MSM_N = 1 << 17

#: per-leg wall-clock budgets (seconds).  The tunneled TPU worker can wedge
#: mid-dispatch (observed: a blocked h2d hangs the process forever); every
#: leg therefore runs in its own subprocess and is killed at its deadline.
#: Budgets sum to 25 min so the whole run fits a driver wall budget.
LEG_TIMEOUTS = {
    "probe": 150,
    "montmul": 180,
    "ntt": 180,
    "msm": 420,
    "marlin": 720,
    "marlin_host": 600,
    "scaling": 300,
}

_STATE: dict = {"rate": 0.0, "extra": {}}


def log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def emit() -> None:
    """Print the cumulative headline JSON line (called after every leg and
    on SIGTERM — the last complete stdout line is the round's artifact)."""
    rate = _STATE["rate"]
    print(
        json.dumps(
            {
                "metric": "fr_montmul_throughput_per_chip",
                "value": round(rate, 1),
                "unit": "muls/sec",
                "vs_baseline": round(rate / ARKWORKS_CPU_MULS_PER_SEC, 3),
                "extra": _STATE["extra"],
            }
        ),
        flush=True,
    )


def _on_term(signum, frame):  # noqa: ARG001
    _STATE["extra"]["terminated_early"] = True
    emit()
    sys.exit(1)


def _leg_main(fn_name: str, conn) -> None:
    try:
        if fn_name == "bench_scaling":
            # virtual 8-device CPU mesh (same recipe as conftest.py: the
            # env's sitecustomize imports jax at interpreter start, so the
            # config update is the only reliable pin; XLA_FLAGS is still
            # read at CPU client init, which hasn't happened yet)
            flags = os.environ.get("XLA_FLAGS", "")
            if "xla_force_host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + " --xla_force_host_platform_device_count=8"
                ).strip()
            jax.config.update("jax_platforms", "cpu")
        if os.environ.get("SWTPU_BENCH_FORCE_CPU"):
            # config.update is the only reliable pin: with the axon PJRT
            # plugin registered at interpreter start, an env-var-only
            # JAX_PLATFORMS=cpu still blocks jax.devices() on a wedged
            # tunnel (observed on this host)
            jax.config.update("jax_platforms", "cpu")
        log(f"{fn_name}: backend={jax.default_backend()} devices={jax.devices()}")
        result = globals()[fn_name]()
        conn.send(("ok", result))
    except BaseException:  # noqa: BLE001 — report, parent decides
        conn.send(("err", traceback.format_exc(limit=3)))
    finally:
        conn.close()


def run_leg(name: str, fn_name: str):
    """Run one bench leg in a subprocess with a deadline; returns its result
    or None (timeout/crash logged)."""
    # spawn: a forked child would inherit the parent's (axon) backend state
    ctx = mp.get_context("fork" if os.environ.get("SWTPU_BENCH_FORK") else "spawn")
    parent, child = ctx.Pipe(duplex=False)
    proc = ctx.Process(target=_leg_main, args=(fn_name, child), daemon=True)
    proc.start()
    child.close()
    timeout = LEG_TIMEOUTS.get(name, 600)
    result = None
    if parent.poll(timeout):
        try:
            status, payload = parent.recv()
            if status == "ok":
                result = payload
            else:
                log(f"{name} leg failed:\n{payload}")
        except EOFError:
            log(f"{name} leg died without a result")
    else:
        log(f"{name} leg exceeded {timeout}s — killing (wedged device link?)")
    proc.join(timeout=10)
    if proc.is_alive():
        proc.kill()
        proc.join(timeout=10)
    return result


def bench_device_probe() -> dict:
    """Fast liveness check of the accelerator: the axon tunnel can wedge
    such that jax.devices() blocks forever — this leg's deadline detects it
    so the device legs are skipped instead of burning their budgets, and
    the marlin leg falls back to the host path (still a recorded metric)."""
    d = jax.devices()
    import jax.numpy as jnp

    x = jnp.ones((8, 128))
    assert float(np.asarray((x + 1).sum())) == 2048.0
    return {"backend": jax.default_backend(), "device_kind": d[0].device_kind}


def bench_montmul_host() -> dict:
    """Host-native (threaded C++) Fr Montgomery-mul throughput — the
    wedge-resilient headline fallback: when the device probe fails the
    recorded rate is this real, clearly-labeled number instead of 0.0
    (VERDICT r3 #2a)."""
    from simpleworks_tpu import native
    from simpleworks_tpu.fields.bls12_377 import FR_MODULUS
    from simpleworks_tpu.fields.frvec import FrVec

    if not native.available():
        log("montmul-host: native runtime missing — skipped")
        return {}
    batch = 1 << 19
    rng = np.random.default_rng(1)
    vals = [int(v) for v in rng.integers(0, 1 << 62, size=batch)]
    a = FrVec.from_ints(vals)
    b = FrVec.from_ints(vals[1:] + vals[:1])
    out = a * b  # warm
    iters = 8
    start = time.perf_counter()
    for _ in range(iters):
        out = out * b
    elapsed = time.perf_counter() - start
    rate = batch * iters / elapsed
    # spot-verify one lane against exact host arithmetic
    expect = vals[0] * pow(vals[1], iters + 1, FR_MODULUS) % FR_MODULUS
    assert out.to_ints()[0] == expect, "host mont-mul lane mismatch"
    log(f"fr mont-mul host-native: {rate:.3e} muls/s (verified)")
    return {"rate": rate}


def bench_montmul() -> dict:
    from simpleworks_tpu.fields.bls12_377 import Fr, FR_MODULUS
    from simpleworks_tpu.fields.pack import pack_standard, unpack_standard
    from simpleworks_tpu.ops.mont_mul_pallas import make_mont_mul

    batch = 1 << 19
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 1 << 62, size=batch, dtype=np.int64).tolist()
    R = Fr.PARAMS.montgomery_r
    a = jnp.asarray(pack_standard([v * R % FR_MODULUS for v in vals], Fr.PARAMS)).T.copy()
    b = jnp.roll(a, 1, axis=1)
    from simpleworks_tpu.utils.observability import maybe_jax_profile

    mul = make_mont_mul(Fr.PARAMS)
    out = mul(a, b)
    out.block_until_ready()
    _ = np.asarray(out[:, :2])  # warm the d2h fetch path
    iters = 20
    start = time.perf_counter()
    with maybe_jax_profile("montmul"):
        for _ in range(iters):
            out = mul(out, b)
        out.block_until_ready()
    raw_s = time.perf_counter() - start
    # fetch the dependent result INSIDE the timed region: on the tunneled
    # backend only a d2h fetch truly synchronizes (docs/performance.md), so
    # the defensible number includes it.
    got_np = np.asarray(out[:, :2])
    fetch_s = time.perf_counter() - start
    rate_fetch = batch * iters / fetch_s
    rate_raw = batch * iters / raw_s
    # spot-verify two lanes against exact host arithmetic (guards against a
    # link/backend that acks without computing)
    rinv = pow(R, -1, FR_MODULUS)
    got = unpack_standard(got_np.T, Fr.PARAMS)
    for lane in range(2):
        x = vals[lane] % FR_MODULUS
        y = vals[(lane - 1) % batch] % FR_MODULUS  # b = roll(a, 1)
        expect = x * pow(y, 21, FR_MODULUS) % FR_MODULUS
        assert got[lane] * rinv % FR_MODULUS == expect, "mont-mul lane mismatch"
    log(f"fr mont-mul: {rate_fetch:.3e} muls/s fetch-inclusive "
        f"({rate_raw:.3e} raw, verified)")
    return {"rate": rate_fetch, "raw": rate_raw}


def bench_ntt() -> dict:
    from simpleworks_tpu.fields.bls12_377 import Fr, FR_MODULUS
    from simpleworks_tpu.fields.pack import pack_standard
    from simpleworks_tpu.ops.ntt_mxu import get_mxu_ntt

    n = 1 << 16
    rng = np.random.default_rng(2)
    vals = [int(v) % FR_MODULUS for v in rng.integers(0, 1 << 62, size=n)]
    R = Fr.PARAMS.montgomery_r
    x = jnp.asarray(pack_standard([v * R % FR_MODULUS for v in vals], Fr.PARAMS)).T.copy()
    ntt = get_mxu_ntt(n)
    fwd = jax.jit(ntt.fft_mont)
    y = fwd(x)
    y.block_until_ready()
    _ = np.asarray(y[:, :1])
    iters = 20
    start = time.perf_counter()
    for _ in range(iters):
        y = fwd(y)
    _ = np.asarray(y[:, :1])  # d2h fetch = the only true sync on this link
    elapsed = (time.perf_counter() - start) / iters
    log(f"mxu ntt n={n}: {elapsed * 1e3:.2f} ms/transform ({n / elapsed:.3e} elem/s)")
    return {"mxu_ntt_n65536_ms": round(elapsed * 1e3, 3),
            "mxu_ntt_elems_per_sec": round(n / elapsed, 1)}


def bench_msm() -> dict:
    from simpleworks_tpu import native
    from simpleworks_tpu.curves.bls12_377 import G1Point
    from simpleworks_tpu.fields.bls12_377 import FR_MODULUS as P
    from simpleworks_tpu.fields.frvec import FrVec
    from simpleworks_tpu.ops import g1_limb, msm_pippenger

    if not native.available():
        log("msm: native runtime missing — skipped")
        return {}
    g = G1Point.generator()
    pts_native = native.g1_fixed_base_raw(
        g, [(i * 2862933555777941757 + 3037000493) % P for i in range(MSM_N)]
    )
    rng = np.random.default_rng(3)
    scalars = [int.from_bytes(rng.bytes(33), "little") % P for _ in range(MSM_N)]
    std = FrVec.from_ints(scalars).to_std_array()

    pts_native = native.g1_ensure_normalized(pts_native)
    t0 = time.perf_counter()
    host_res = native.g1_msm_affine_arr(pts_native, std)
    host_s = time.perf_counter() - t0
    log(f"native host msm 2^17 (batch-affine): {host_s:.2f}s ({MSM_N / host_s:.0f} pts/s)")

    pts_dev = jax.device_put(g1_limb.native_points_to_limb_major(pts_native))
    jax.block_until_ready(pts_dev)
    res = msm_pippenger.msm_device(pts_dev, std, c=8)  # compile + warm
    assert res == host_res, "device MSM mismatch vs host Pippenger"
    t0 = time.perf_counter()
    res = msm_pippenger.msm_device(pts_dev, std, c=8)
    dev_s = time.perf_counter() - t0
    assert res == host_res
    log(f"device msm 2^17: {dev_s:.2f}s ({MSM_N / dev_s:.0f} pts/s, bit-exact)")
    out = {
        "msm_points_per_sec": round(MSM_N / dev_s, 1),
        "msm_n": MSM_N,
        "msm_host_native_points_per_sec": round(MSM_N / host_s, 1),
        "msm_device_vs_host_native": round(host_s / dev_s, 2),
    }
    # the production path since r5: Montgomery coefficients already
    # device-resident (the device prover's commits) — no scalar upload
    import jax.numpy as jnp

    mont_dev = jnp.asarray(
        FrVec.from_ints(scalars).a.view("<u2").reshape(MSM_N, 16).T.copy()
    ).astype(jnp.uint32)
    res_m = msm_pippenger.msm_device_mont(pts_dev, mont_dev, c=8)  # warm
    assert res_m == host_res
    t0 = time.perf_counter()
    res_m = msm_pippenger.msm_device_mont(pts_dev, mont_dev, c=8)
    res_s = time.perf_counter() - t0
    assert res_m == host_res
    log(f"device msm 2^17 resident-mont: {res_s:.2f}s "
        f"({MSM_N / res_s:.0f} pts/s, bit-exact)")
    out["msm_resident_points_per_sec"] = round(MSM_N / res_s, 1)
    # first 2^20 number (VERDICT r4 #4): tile the 2^17 table 8x (distinct
    # scalars — the bucket distribution is what matters, not the points)
    big_n = 1 << 20
    big_pts = np.tile(pts_native, (big_n // MSM_N, 1))
    big_scalars = [int.from_bytes(rng.bytes(33), "little") % P for _ in range(big_n)]
    big_std = FrVec.from_ints(big_scalars).to_std_array()
    t0 = time.perf_counter()
    host_big = native.g1_msm_affine_arr(big_pts, big_std)
    host_big_s = time.perf_counter() - t0
    big_dev = jax.device_put(g1_limb.native_points_to_limb_major(big_pts))
    jax.block_until_ready(big_dev)
    res_big = msm_pippenger.msm_device(big_dev, big_std)  # compile + warm
    assert res_big == host_big, "device MSM 2^20 mismatch vs host Pippenger"
    t0 = time.perf_counter()
    res_big = msm_pippenger.msm_device(big_dev, big_std)
    dev_big_s = time.perf_counter() - t0
    assert res_big == host_big
    log(f"device msm 2^20: {dev_big_s:.2f}s ({big_n / dev_big_s:.0f} pts/s, "
        f"host {host_big_s:.2f}s)")
    out["msm_2e20_points_per_sec"] = round(big_n / dev_big_s, 1)
    out["msm_2e20_host_native_points_per_sec"] = round(big_n / host_big_s, 1)
    return out


def bench_marlin_prove() -> dict:
    from simpleworks_tpu import marlin
    from simpleworks_tpu.examples.schnorr_circuit import synthesize
    from simpleworks_tpu.schnorr import schnorr
    from simpleworks_tpu.utils.rng import test_rng

    rng = test_rng()
    params = schnorr.setup(rng)
    pk_s, sk = schnorr.keygen(params, rng)
    message = b"a message to sign"
    sig = schnorr.sign(params, sk, message, rng)
    t0 = time.perf_counter()
    cs = synthesize(params, pk_s, message, sig)
    synth_s = time.perf_counter() - t0
    log(f"circuit synthesized in {synth_s:.1f}s")

    t0 = time.perf_counter()
    srs = marlin.universal_setup(100_000, 25_000, 300_000, marlin.generate_rand())
    srs_s = time.perf_counter() - t0
    log(f"srs in {srs_s:.1f}s")
    t0 = time.perf_counter()
    pk, vk = marlin.index(srs, cs)
    index_s = time.perf_counter() - t0
    log(f"index in {index_s:.1f}s")
    # median-of-N proves (SRS/index warm via the memos): the 2-vCPU host
    # shows ±15-20% run-to-run variance, so a single sample is not
    # defensible evidence (VERDICT r3 #6).  Adaptive: keep proving while
    # the leg budget (720s) safely allows another run, up to 3.
    leg_start = time.perf_counter()
    from simpleworks_tpu.utils.observability import PROVER_TIMER

    totals_before_prove = dict(PROVER_TIMER.totals)
    prove_times = []
    proof = None
    for i in range(3):
        t0 = time.perf_counter()
        proof = marlin.prove(pk, cs)
        prove_times.append(time.perf_counter() - t0)
        log(f"prove[{i}] {prove_times[-1]:.1f}s")
        budget_left = 600 - (time.perf_counter() - leg_start) - synth_s - srs_s - index_s
        if budget_left < prove_times[-1] * 1.3:
            break
    prove_s = sorted(prove_times)[len(prove_times) // 2]  # median
    # per-leg attribution of the prove wall time, averaged per run and
    # net of the index's own MSM regions (VERDICT r4 #1: publish the
    # PROVER_TIMER breakdown, not just the total)
    deltas = {
        label: total - totals_before_prove.get(label, 0.0)
        for label, total in PROVER_TIMER.totals.items()
    }
    breakdown = {
        label: round(d / max(len(prove_times), 1), 2)
        for label, d in sorted(deltas.items(), key=lambda kv: -kv[1])[:10]
        if d > 0.05
    }
    t0 = time.perf_counter()
    ok = marlin.verify(vk, [], proof)
    verify_s = time.perf_counter() - t0
    log(
        f"marlin schnorr@(100k,25k,300k): synth={synth_s:.1f}s srs={srs_s:.1f}s "
        f"index={index_s:.1f}s prove={prove_s:.1f}s (median of {len(prove_times)}) "
        f"verify={verify_s:.2f}s verify_ok={ok}"
    )
    return {
        "marlin_proofs_per_sec": round(1.0 / prove_s, 4),
        "marlin_prove_seconds_median": round(prove_s, 2),
        "marlin_prove_seconds_min": round(min(prove_times), 2),
        "marlin_prove_runs": len(prove_times),
        "marlin_verify_seconds": round(verify_s, 2),
        "marlin_srs_seconds": round(srs_s, 2),
        "marlin_index_seconds": round(index_s, 2),
        "marlin_circuit": "schnorr-verify (simple-payments signature), SRS(100k,25k,300k)",
        "marlin_verify_ok": bool(ok),
        "marlin_prove_breakdown": breakdown,
    }


def _consult_probe(extra: dict, force: bool = False) -> bool:
    """Device liveness via the accel router's cached subprocess probe
    (30 s deadline, on-disk TTL cache) — NOT a 150 s bench-owned probe leg
    burning its budget on a wedged tunnel (VERDICT r4 #2).  Every attempt
    is appended to ``extra["probe_trail"]`` so the record shows the tunnel
    was tried early AND late even when it is down all round."""
    from simpleworks_tpu.ops import accel

    if force:
        try:
            os.remove(accel._probe_cache_path())
        except OSError:
            pass
    t0 = time.perf_counter()
    rec = accel._cached_probe()
    ok = bool(rec.get("ok"))
    trail = extra.setdefault("probe_trail", [])
    trail.append(
        {
            "ts": time.strftime("%H:%M:%SZ", time.gmtime()),
            "ok": ok,
            "seconds": round(time.perf_counter() - t0, 1),
            **({"kind": rec.get("kind")} if ok else {}),
        }
    )
    extra["device_probe"] = (
        {"backend": rec.get("platform"), "device_kind": rec.get("kind")}
        if ok
        else "unreachable"
    )
    log(f"accel probe verdict: ok={ok} ({trail[-1]['seconds']}s)")
    return ok


def bench_scaling() -> dict:
    """First scaling curve (VERDICT r4 #7): the same Marlin prove
    unsharded vs sharded over an 8-device virtual CPU mesh (this host has
    2 physical cores, so the sharded figure measures collective/partition
    overhead at N>cores, not speedup — labeled ``cpu-virtual``; the ≥5×
    north star needs real multi-chip hardware).  Proof bytes are asserted
    identical, so the comparison cannot drift apart semantically."""
    import jax as _jax
    from jax.sharding import Mesh

    from simpleworks_tpu import marlin
    from simpleworks_tpu.fields.bls12_377 import ConstraintF, FR_MODULUS
    from simpleworks_tpu.marlin.serialization import serialize_proof
    from simpleworks_tpu.ops import accel
    from simpleworks_tpu.r1cs.constraint_system import ONE, ConstraintSystem

    devices = _jax.devices()
    if len(devices) < 8 or devices[0].platform != "cpu":
        log(f"scaling: need 8 virtual cpu devices, have {len(devices)} "
            f"{devices[0].platform} — skipped")
        return {}
    n_constraints = 4000  # H = 4096, K = 8192: sharded thresholds engage
    cs = ConstraintSystem(ConstraintF)
    a = cs.new_input_variable(3)
    cur_val = 3
    cur = cs.new_witness_variable(cur_val)
    cs.enforce_constraint(cs.lc((1, a)) - cs.lc((1, cur)), cs.lc((1, ONE)), cs.lc())
    for _ in range(n_constraints):
        nxt_val = cur_val * cur_val % FR_MODULUS
        nxt = cs.new_witness_variable(nxt_val)
        cs.enforce_constraint(cs.lc((1, cur)), cs.lc((1, cur)), cs.lc((1, nxt)))
        cur, cur_val = nxt, nxt_val
    srs = marlin.universal_setup(4096, 4096, 8192, marlin.generate_rand())
    pk, vk = marlin.index(srs, cs)
    marlin.prove(pk, cs)  # warm every code path once
    t0 = time.perf_counter()
    base_proof = marlin.prove(pk, cs)
    t_1dev = time.perf_counter() - t0
    log(f"scaling: unsharded prove {t_1dev:.2f}s (n={n_constraints})")
    mesh = Mesh(np.array(devices[:8]), ("shard",))
    accel.set_prover_mesh(mesh, "shard")
    try:
        marlin.prove(pk, cs)  # compile the sharded programs
        t0 = time.perf_counter()
        sharded_proof = marlin.prove(pk, cs)
        t_8dev = time.perf_counter() - t0
    finally:
        accel.set_prover_mesh(None, "shard")
    log(f"scaling: sharded(8 virtual) prove {t_8dev:.2f}s")
    assert serialize_proof(sharded_proof) == serialize_proof(base_proof)
    return {
        "label": "cpu-virtual (2 physical cores)",
        "circuit_constraints": n_constraints,
        "prove_seconds_1dev": round(t_1dev, 2),
        "prove_seconds_8dev_sharded": round(t_8dev, 2),
        "proof_bytes_identical": True,
    }


def _run_device_legs(extra: dict) -> None:
    """The device kernel legs (each subprocess + deadline)."""
    extra["backend"] = "tpu-device"
    extra.pop("device_legs_skipped", None)
    mont = run_leg("montmul", "bench_montmul")
    if mont is None:
        extra["montmul_leg_failed"] = True
    else:
        _STATE["rate"] = mont["rate"]
        extra["fr_montmul_raw_no_fetch"] = round(mont["raw"], 1)
    emit()
    for name, fn_name in (("ntt", "bench_ntt"), ("msm", "bench_msm")):
        result = run_leg(name, fn_name)
        if result is not None:
            extra.update(result)
        else:
            extra[f"{name}_leg_failed"] = True
        emit()


def _run_host_fallback(extra: dict) -> None:
    """Wedged/absent accelerator: record the host-native rate as the
    headline instead — never 0.0 with a real number available."""
    extra["device_legs_skipped"] = True
    log("device unreachable — host-native montmul as headline fallback")
    host = run_leg("montmul", "bench_montmul_host")
    if host and "rate" in host:
        _STATE["rate"] = host["rate"]
        extra["backend"] = "cpu-host-native"
    emit()


def main() -> None:
    signal.signal(signal.SIGTERM, _on_term)
    extra = _STATE["extra"]
    device_ok = _consult_probe(extra)
    emit()
    if device_ok:
        _run_device_legs(extra)
    else:
        # pin the fallback legs to CPU so a wedged tunnel cannot block them
        os.environ["SWTPU_BENCH_FORCE_CPU"] = "1"
        os.environ["SWTPU_ACCEL"] = "0"
        _run_host_fallback(extra)
    # The marlin leg runs HOST-PINNED first: the prove number must land on
    # the record even when the tunnel wedges mid-dispatch, and the
    # device-resident prover's first prove in a fresh process re-traces /
    # cache-loads tens of programs (~15+ min on the tunneled chip —
    # docs/performance.md round 5) so it cannot fit a leg deadline.  A
    # separate attempt leg below still tries it when the link is healthy;
    # its committed steady-state evidence lives in BENCH_LOCAL.jsonl.
    os.environ["SWTPU_DEVICE_PROVER"] = "0"
    result = run_leg("marlin", "bench_marlin_prove")
    os.environ.pop("SWTPU_DEVICE_PROVER", None)
    if result is not None:
        extra.update(result)
        extra["marlin_backend"] = (
            "host-path + device-routed kernels" if device_ok else "cpu-host-path"
        )
    else:
        extra["marlin_leg_failed"] = True
    emit()
    scaling = run_leg("scaling", "bench_scaling")
    if scaling:
        extra["scaling"] = scaling
    emit()
    if not device_ok:
        # late retry (VERDICT r4 #2): the tunnel heals on minute timescales —
        # a fresh forced probe at the end of the run catches it and still
        # gets device kernel numbers onto the driver record
        os.environ.pop("SWTPU_BENCH_FORCE_CPU", None)
        os.environ.pop("SWTPU_ACCEL", None)
        if _consult_probe(extra, force=True):
            _run_device_legs(extra)
    emit()


BENCH_LOCAL = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_LOCAL.jsonl")


def snapshot() -> int:
    """``python bench.py --snapshot``: the device kernel legs only
    (probe/montmul/ntt/msm), appended to the committed BENCH_LOCAL.jsonl —
    run opportunistically whenever the tunnel is alive mid-round so an
    end-of-round wedge cannot blank the device record (VERDICT r3 #2b)."""
    signal.signal(signal.SIGTERM, _on_term)
    extra = _STATE["extra"]
    device_ok = _consult_probe(extra, force=True)
    emit()
    if device_ok:
        _run_device_legs(extra)
    else:
        os.environ["SWTPU_BENCH_FORCE_CPU"] = "1"
        os.environ["SWTPU_ACCEL"] = "0"
        _run_host_fallback(extra)
    rec = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "device_ok": device_ok,
        "fr_montmul_throughput_per_chip": round(_STATE["rate"], 1),
        "extra": extra,
    }
    with open(BENCH_LOCAL, "a") as f:
        f.write(json.dumps(rec) + "\n")
    log(f"snapshot appended to {BENCH_LOCAL} (device_ok={device_ok})")
    return 0 if device_ok else 1


if __name__ == "__main__":
    sys.exit(snapshot()) if "--snapshot" in sys.argv[1:] else main()
