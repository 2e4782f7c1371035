"""Microbench: update_matrices_banded alone across geometry/knobs.

Isolates the warp kernel from the driver: B=32 pairs at 480p, smooth
flow.  Finds where the (8,16) window's 4.8x cliff comes from
(static-slot count vs nested-guard count vs spills).
"""
import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import time
import numpy as np
import jax, jax.numpy as jnp
from btcs_pnes_optical_flow_tpu.ops import farneback_pallas as fbp

B, H, W = 32, 480, 640
REPS = 5
rng = np.random.default_rng(0)
r0 = jnp.asarray(rng.standard_normal((B, H, W, 5)).astype(np.float32))
r1 = jnp.asarray(rng.standard_normal((B, H, W, 5)).astype(np.float32))
yy, xx = np.mgrid[0:H, 0:W]
fx = (3.0 * np.sin(xx / 97.0) * np.cos(yy / 61.0)).astype(np.float32)
fy = (1.8 * np.cos(xx / 83.0)).astype(np.float32)
flow = jnp.asarray(np.broadcast_to(np.stack([fx, fy], -1), (B, H, W, 2)).copy())

def force(x): return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])

print("backend:", jax.default_backend(), flush=True)

def timed(name, **kw):
    fn = jax.jit(lambda a, b, c: fbp.update_matrices_banded(a, b, c, **kw).sum())
    t_c0 = time.perf_counter()
    out = fn(r0, r1, flow); force(out)
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(REPS): out = fn(r0, r1, flow)
    force(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:40s} {dt*1e3:9.2f} ms   (compile {compile_s:.0f}s)", flush=True)

timed("dmax (4,4)", d_max_y=4, d_max_x=4)
timed("dmax (6,8)", d_max_y=6, d_max_x=8)
timed("dmax (8,12)", d_max_y=8, d_max_x=12)
timed("dmax (8,16)", d_max_y=8, d_max_x=16)
timed("dmax (8,16) s_cap=16", d_max_y=8, d_max_x=16, s_cap=16)
timed("dmax (8,16) s_cap=8", d_max_y=8, d_max_x=16, s_cap=8)
timed("dmax (8,16) bf16", d_max_y=8, d_max_x=16, precision="bf16")
timed("dmax (4,16)", d_max_y=4, d_max_x=16)
timed("dmax (8,4)", d_max_y=8, d_max_x=4)
