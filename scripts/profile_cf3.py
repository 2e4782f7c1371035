import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from btcs_pnes_optical_flow_tpu.config import FarnebackParams
from btcs_pnes_optical_flow_tpu.ops import cvx
from btcs_pnes_optical_flow_tpu.ops import farneback as fb
from btcs_pnes_optical_flow_tpu.ops import farneback_pallas as fbp

B, H, W = 256, 480, 640
REPS = 3
params = FarnebackParams()

def force(x): return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])

def timed(name, fn, *args):
    out = fn(*args); force(out)
    t0 = time.perf_counter()
    for _ in range(REPS): out = fn(*args)
    force(out)
    dt = (time.perf_counter()-t0)/REPS
    print(f"{name:46s} {dt*1e3:9.2f} ms", flush=True)
    del out
    return dt

rng = np.random.default_rng(0)
f32 = jnp.asarray(rng.integers(0,255,(B+1,H,W)).astype(np.float32))
print("backend:", jax.default_backend(), flush=True)

ceil = lambda x,m: -(-x//m)*m
for k in (1, 2, 3):
    hk, wk = params.level_size(H, W, k)
    ht, wt = ceil(hk,32), ceil(wk,256)
    timed(f"L{k} level_image ({hk}x{wk})", jax.jit(lambda f,k=k: fb._level_image(f, k, params, H, W)[0].sum()), f32)
    lv = jax.jit(lambda f,k=k: fb._level_image(f, k, params, H, W)[0])(f32); force(lv)
    timed(f"L{k} poly_cf", jax.jit(lambda x: fbp.poly_exp_fused_cf(x,5,1.2).sum()), lv)
    p = jax.jit(lambda x: fbp.poly_exp_fused_cf(x,5,1.2))(lv); force(p); del lv
    timed(f"L{k} pad_for_band", jax.jit(lambda x,hk=hk,wk=wk: fbp.pad_for_band(x,hk,wk).sum()), p)
    r1p = jax.jit(lambda x,hk=hk,wk=wk: fbp.pad_for_band(x,hk,wk))(p); force(r1p)
    flow = jnp.zeros((B,2,ht,wt), jnp.float32)
    timed(f"L{k} um_cf", jax.jit(lambda a,b,c,hk=hk,wk=wk: fbp.update_matrices_banded_cf(a,b,c,hk,wk,r1_offset=1)[0].sum()), p, flow, r1p)
    m = jax.jit(lambda a,b,c,hk=hk,wk=wk: fbp.update_matrices_banded_cf(a,b,c,hk,wk,r1_offset=1)[0])(p, flow, r1p); force(m); del p, r1p
    timed(f"L{k} pad_for_solve", jax.jit(lambda x,hk=hk,wk=wk: fbp.pad_for_solve(x,hk,wk).sum()), m)
    mp = jax.jit(lambda x,hk=hk,wk=wk: fbp.pad_for_solve(x,hk,wk))(m); force(mp); del m
    timed(f"L{k} uf_cf", jax.jit(lambda x,hk=hk,wk=wk: fbp.update_flow_fused_cf(x,hk,wk,15,False).sum()), mp)
    del mp
    n_i, n_j = ht//32, wt//256
    timed(f"L{k} bases", jax.jit(lambda f,ht=ht,wt=wt,n_i=n_i,n_j=n_j: jnp.round(jnp.mean(f[:,:,:ht,:wt].reshape(B,2,n_i,32,n_j,256),axis=(3,5))).astype(jnp.int32).sum()), flow)
    hp, wp = params.level_size(H, W, k-1)
    htp, wtp = ceil(hp,32), ceil(wp,256)
    timed(f"L{k-1} resize+pad from L{k}", jax.jit(lambda f,hk=hk,wk=wk,hp=hp,wp=wp,htp=htp,wtp=wtp: jnp.pad(cvx.resize_bilinear(f[:,:,:hk,:wk],hp,wp)*2.0,((0,0),(0,0),(0,htp-hp),(0,wtp-wp)),mode="edge").sum()), flow)
    del flow
