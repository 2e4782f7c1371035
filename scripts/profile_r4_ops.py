"""Round-4 per-op ledger with REAL intermediates (no zero-ablation lies).

profile_stages' toggle-a-stage-off ablation feeds constant zeros to the
stages it keeps, which XLA constant-folds and CSEs — its "poly+solve"
row (45 ms) contradicts its own full-vs-no-solve delta (216 ms).  This
times each hot op in its own jit on REALISTIC data captured from the
production chain (channel-first geometry keeps jit-boundary layouts
clean), at the bench operating point: transposed 480p, chunk 256,
bf16 warp.

Run ALONE on the real TPU:  python -m scripts.profile_r4_ops
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from btcs_pnes_optical_flow_tpu.config import FarnebackParams
from btcs_pnes_optical_flow_tpu.ops import cvx
from btcs_pnes_optical_flow_tpu.ops.farneback import _level_image
from btcs_pnes_optical_flow_tpu.ops.farneback_pallas import (
    _TH,
    pad_for_band,
    pad_for_solve,
    poly_exp_fused_cf,
    update_flow_fused_cf,
    update_matrices_banded_cf,
    warp_grid,
)

B = 256
# NATIVE layout, the production fast path: config.FarnebackParams
# defaults to warp_layout="native" (transposed measured 131 vs 463
# pairs/s — config.py:76-84), so the kernels see (H, W) = (480, 640):
# sublane axis = image y (15 32-row tiles at L0), lane axis = image x
# (768 padded lanes, 3 256-lane columns).  An earlier revision of this
# script profiled (640, 480) + _transposed_params — a 20x2 grid the
# production program never runs.
H, W = 480, 640
REPS = 3


def force(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def timed(name, fn, *args, reps=REPS):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:56s} {dt*1e3:9.2f} ms", flush=True)
    return dt, out


def render(n_frames, h, w, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n_frames) / 30.0
    cx = w * 0.5 + 40 * np.exp(-0.05 * t) * np.sin(2 * np.pi * 3.0 * t)
    cy = h * 0.5 + 18 * np.exp(-0.05 * t) * np.cos(2 * np.pi * 2.9 * t)
    yy, xx = np.mgrid[0:h, 0:w]
    texture = rng.normal(0, 6, (h, w))
    frames = np.empty((n_frames, h, w), np.uint8)
    for i in range(n_frames):
        blob = 150 * np.exp(-(((xx - cx[i]) / 30.0) ** 2 + ((yy - cy[i]) / 26.0) ** 2))
        frames[i] = np.clip(40 + texture + blob, 0, 255).astype(np.uint8)
    return frames


def main():
    print("backend:", jax.default_backend(), flush=True)
    import dataclasses

    # Production bench knobs, native layout (no _transposed_params —
    # see the H, W note above).
    p = dataclasses.replace(FarnebackParams(), warp_precision="bf16")
    frames = jnp.asarray(render(B + 1, H, W))
    f_all = frames.astype(jnp.float32)
    force(f_all)

    klev = p.num_levels(H, W)
    per_level = {}
    for k in range(klev + 1):
        hk, wk = p.level_size(H, W, k)
        ht, wt, tw_k = warp_grid(hk, wk)
        d_y, d_x, s_cap = (p.warp_d_max_y, p.warp_d_max_x, p.warp_s_cap)
        print(f"-- level {k}: {hk}x{wk} grid ({ht},{wt}) tw={tw_k}", flush=True)

        t_lv, lv = timed(
            f"L{k} level image (smooth+resize, 257 frames)",
            jax.jit(lambda f, k=k: _level_image(f, k, p, H, W)[0]), f_all)
        t_poly, poly = timed(
            f"L{k} poly expansion (257 frames)",
            jax.jit(lambda l, g=(ht, wt): poly_exp_fused_cf(l, p.poly_n, p.poly_sigma, grid=g)),
            lv)
        del lv  # HBM: the L0 chain at B=256 needs every freed buffer
        t_pb, r1p = timed(
            f"L{k} pad_for_band",
            jax.jit(lambda r, hk=hk, wk=wk, d_y=d_y, d_x=d_x, tw_k=tw_k:
                    pad_for_band(r, hk, wk, d_y, d_x, p.warp_base_max, tw=tw_k)),
            poly)

        # Realistic flow: smooth long-wavelength field like the bench
        # clip's (within-tile spans a few px — the anchored window must
        # NOT saturate; a clip-storm field inflates the warp row ~3x).
        yy = np.arange(ht, dtype=np.float32)[:, None]
        xx = np.arange(wt, dtype=np.float32)[None, :]
        mag = 10.0 / 2**k
        fx = mag * np.sin(xx / 701.0) * np.cos(yy / 433.0)
        fy = 0.6 * mag * np.cos(xx / 659.0) * np.sin(yy / 389.0)
        flow = jnp.asarray(
            np.broadcast_to(np.stack([fx, fy])[None], (B, 2, ht, wt)).copy())
        force(flow)

        def warp_fn(r0, fl, r1pa, hk=hk, wk=wk, d_y=d_y, d_x=d_x,
                    s_cap=s_cap, tw_k=tw_k):
            m, clip, _ = update_matrices_banded_cf(
                r0, fl, r1pa, hk, wk, d_max_y=d_y, d_max_x=d_x,
                base_max=p.warp_base_max, s_cap=s_cap,
                precision=p.warp_precision, r1_offset=1, tw=tw_k)
            return m, clip.sum()

        t_w, (m, nclip) = timed(
            f"L{k} warp+update (1 iteration)", jax.jit(warp_fn), poly, flow, r1p)
        print(f"{'':56s} clips={int(np.asarray(nclip))}", flush=True)
        del poly, r1p  # free before the (m, mp) pair goes live
        t_ps, mp = timed(
            f"L{k} pad_for_solve",
            jax.jit(lambda mm, hk=hk, wk=wk, g=(ht, wt): pad_for_solve(mm, hk, wk, grid=g)),
            m)
        del m
        t_sv, _fl2 = timed(
            f"L{k} window solve",
            jax.jit(lambda mpa, hk=hk, wk=wk: update_flow_fused_cf(mpa, hk, wk, p.winsize, p.gaussian_win)),
            mp)
        del mp, _fl2

        if k > 0:
            hk2, wk2 = p.level_size(H, W, k - 1)
            ht2, wt2, _ = warp_grid(hk2, wk2)

            def up_gather(fl, hk=hk, wk=wk, hk2=hk2, wk2=wk2, ht2=ht2, wt2=wt2):
                fr = cvx.resize_bilinear(fl[:, :, :hk, :wk], hk2, wk2)
                return jnp.pad(fr * 2.0, ((0, 0), (0, 0), (0, ht2 - hk2), (0, wt2 - wk2)), mode="edge")

            def up_mm(fl, hk=hk, wk=wk, hk2=hk2, wk2=wk2, ht2=ht2, wt2=wt2):
                fr = cvx.resize_bilinear_mm(fl[:, :, :hk, :wk], hk2, wk2)
                return jnp.pad(fr * 2.0, ((0, 0), (0, 0), (0, ht2 - hk2), (0, wt2 - wk2)), mode="edge")

            timed(f"L{k}->L{k-1} flow upscale (gather resize)", jax.jit(up_gather), flow)
            timed(f"L{k}->L{k-1} flow upscale (matmul resize)", jax.jit(up_mm), flow)

        it_k = 3
        chain = t_lv + t_poly + t_pb + it_k * (t_w + t_ps + t_sv)
        per_level[k] = (t_lv, t_poly, t_pb, t_w, t_ps, t_sv, chain)
        print(f"{'L%d 3-iteration chain estimate' % k:56s} {chain*1e3:9.2f} ms",
              flush=True)

    total = sum(v[-1] for v in per_level.values())
    print(f"{'sum of per-op chain estimates (all levels)':56s} {total*1e3:9.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
