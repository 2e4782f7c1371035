import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from btcs_pnes_optical_flow_tpu.config import FarnebackParams
from btcs_pnes_optical_flow_tpu.ops import farneback_fused as ff

B, H, W = 256, 480, 640
REPS = 3

def force(x): return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])

def timed(name, fn, *args):
    out = fn(*args); force(out)
    t0 = time.perf_counter()
    for _ in range(REPS): out = fn(*args)
    force(out)
    dt = (time.perf_counter()-t0)/REPS
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    del out
    return dt

rng = np.random.default_rng(0)
frames = jnp.asarray(rng.integers(0,255,(B+1,H,W)).astype(np.uint8))
print("backend:", jax.default_backend(), flush=True)

for lv in (0, 1, 2, 3):
    p = FarnebackParams(levels=lv)
    timed(f"seq levels={lv}", jax.jit(lambda f, p=p: ff.farneback_flow_seq(f, p).sum((1,2))), frames)
for it in (1, 2):
    p = FarnebackParams(iterations=it)
    timed(f"seq iters={it}", jax.jit(lambda f, p=p: ff.farneback_flow_seq(f, p).sum((1,2))), frames)
# final transpose cost probe: sum in cf before moveaxis
fl = jnp.zeros((B, 2, 512, 1024), jnp.float32)
timed("moveaxis+slice+sum (256,2,512,1024)", jax.jit(lambda f: jnp.moveaxis(f[:, :, :H, :W], 1, -1).sum((1,2))), fl)
