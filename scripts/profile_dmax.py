"""Isolate the banded-warp kernel cost vs (d_max_y, d_max_x, s_cap).

The round-2 asymmetric window (8, 16) regressed the bench 4x vs the
round-1 (4, 4) geometry; this measures update-kernel cost per config on
the real chunk-256 480p workload to attribute it (predicated-branch
overhead vs DMA vs MAC work).
"""
import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import time
import numpy as np
import jax, jax.numpy as jnp
import bench
from btcs_pnes_optical_flow_tpu.config import FarnebackParams
from btcs_pnes_optical_flow_tpu.ops import farneback_fused as ff

B = 256
REPS = 3

def force(x): return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])

def timed(name, fn, *args):
    out = fn(*args); force(out)
    t0 = time.perf_counter()
    for _ in range(REPS): out = fn(*args)
    force(out)
    dt = (time.perf_counter()-t0)/REPS
    print(f"{name:44s} {dt*1e3:9.2f} ms ({B/dt:6.1f} pairs/s)", flush=True)
    del out
    return dt

frames = jnp.asarray(bench.render_clip(B))
print("backend:", jax.default_backend(), flush=True)

cfgs = [
    ("dmax (4,4)  [round-1 geometry]", FarnebackParams(warp_d_max_y=4, warp_d_max_x=4)),
    ("dmax (8,16) [default]", FarnebackParams()),
    ("dmax (8,16) s_cap=8", FarnebackParams(warp_s_cap=8)),
    ("dmax (6,8)", FarnebackParams(warp_d_max_y=6, warp_d_max_x=8)),
    ("dmax (8,16) bf16", FarnebackParams(warp_precision="bf16")),
]
for name, p in cfgs:
    out, clip = ff.farneback_flow_seq(frames, p, return_clip=True)
    print(f"  {name}: clip={int(np.asarray(clip).sum())}", flush=True)
    timed(f"seq {name}", jax.jit(lambda f, p=p: ff.farneback_flow_seq(f, p).sum((1,2))), frames)
