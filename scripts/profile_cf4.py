import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
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

frames = jnp.asarray(bench.render_clip(B))  # realistic seizure-like motion
print("backend:", jax.default_backend(), flush=True)

cfgs = [
    ("baseline", FarnebackParams()),
    ("s_cap=6", FarnebackParams(warp_s_cap=6)),
    ("s_cap=4", FarnebackParams(warp_s_cap=4)),
    ("s_cap=6 bf16", FarnebackParams(warp_s_cap=6, warp_precision="bf16")),
    ("bf16 only", FarnebackParams(warp_precision="bf16")),
]
for name, p in cfgs:
    out, clip = ff.farneback_flow_seq(frames, p, return_clip=True)
    print(f"  {name}: clip={int(np.asarray(clip).sum())}", flush=True)
    timed(f"seq {name}", jax.jit(lambda f, p=p: ff.farneback_flow_seq(f, p).sum((1,2))), frames)
