"""Pair-level clip stats + throughput for the anchored s_cap=16 config."""
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

frames = jnp.asarray(bench.render_clip(B))
print("backend:", jax.default_backend(), flush=True)

for name, p in [
    ("s_cap=16", FarnebackParams(warp_s_cap=16)),
    ("s_cap=18", FarnebackParams(warp_s_cap=18)),
]:
    out, clip = ff.farneback_flow_seq(frames, p, return_clip=True)
    c = np.asarray(clip)
    print(f"{name}: clipped pairs {int((c>0).sum())}/{B}, px {int(c.sum())}", flush=True)
    fn = jax.jit(lambda f, p=p: ff.farneback_flow_seq(f, p).sum((1,2)))
    force(fn(frames))
    t0 = time.perf_counter()
    for _ in range(REPS): out = fn(frames)
    force(out)
    dt = (time.perf_counter()-t0)/REPS
    print(f"{name}: {dt*1e3:9.2f} ms ({B/dt:6.1f} pairs/s)", flush=True)
