import time, sys
import numpy as np
from simpleworks_tpu.fields.bls12_377 import FR_MODULUS as P
from simpleworks_tpu.fields.frvec import FrVec
from simpleworks_tpu.curves.bls12_377 import G1Point
from simpleworks_tpu import native
from simpleworks_tpu.ops import g1_limb, msm_pippenger

N = 1 << 17
print("gen points (native fixed-base)...", flush=True)
t0 = time.perf_counter()
g = G1Point.generator()
scal_pts = [(i * 2862933555777941757 + 3037000493) % P for i in range(N)]
pts_native = native.g1_fixed_base_raw(g, scal_pts)
print(f"  {time.perf_counter()-t0:.1f}s", flush=True)

rng = np.random.default_rng(3)
scalars = [int.from_bytes(rng.bytes(33), "little") % P for _ in range(N)]
std = FrVec.from_ints(scalars).to_std_array()

t0 = time.perf_counter()
host_res = native.g1_msm_arr(pts_native, std)
t1 = time.perf_counter()
print(f"native host MSM N=2^17: {t1-t0:.2f}s -> {N/(t1-t0):.0f} pts/s", flush=True)

print("upload points...", flush=True)
t0 = time.perf_counter()
import jax
pts_dev = jax.device_put(g1_limb.native_points_to_limb_major(pts_native))
jax.block_until_ready(pts_dev)
print(f"  upload {time.perf_counter()-t0:.1f}s", flush=True)

for c in (8,):
    t0 = time.perf_counter()
    groups = msm_pippenger.build_schedule(std, c)
    t1 = time.perf_counter()
    shapes = [(len(w), sg, bg, i.shape) for w, sg, bg, i, v in groups]
    mb = sum(i.nbytes + v.nbytes for _, _, _, i, v in groups) / 1e6
    print(f"c={c}: groups={shapes} host-sched={t1-t0:.2f}s grids={mb:.0f}MB", flush=True)
    t0 = time.perf_counter()
    res = msm_pippenger.msm_device(pts_dev, std, c=c)
    t1 = time.perf_counter()
    print(f"  first (compile+run): {t1-t0:.1f}s  match={res == host_res}", flush=True)
    t0 = time.perf_counter()
    res = msm_pippenger.msm_device(pts_dev, std, c=c)
    t1 = time.perf_counter()
    print(f"  steady e2e: {t1-t0:.2f}s -> {N/(t1-t0):.0f} pts/s match={res == host_res}", flush=True)
