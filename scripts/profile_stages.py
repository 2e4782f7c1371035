"""Per-stage / per-level cost attribution for the fused flow driver.

Ablates the real production program (ops/farneback_fused._seq_impl
structure, native layout, bf16 warp) at the bench operating point —
chunk 256 @ 480p — and prints a cost ledger.  Variants toggle stages
rather than timing kernels in isolation (jit-boundary layout padding
makes isolated numbers lie; see scripts/profile_inprog.py docstring).

Run ALONE on the real TPU:  python scripts/profile_stages.py
"""

import dataclasses
import math
import sys
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
    update_matrices_banded_tiles_cf,
    warp_grid,
    window_from_residuals,
)

REPS = 3


def force(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def timed(name, fn, *args, reps=REPS, npx=None):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    dt = (time.perf_counter() - t0) / reps
    extra = f"  {npx / dt / 1e6:8.1f} Mpix/s" if npx else ""
    print(f"{name:52s} {dt*1e3:9.2f} ms{extra}", flush=True)
    return dt


def seq_program(params: FarnebackParams, h, w,
                do_poly=True, do_warp=True, do_passes=True, do_solve=True,
                only_level=None, iterations=None):
    """_seq_impl with stage switches (native layout)."""
    iterations = iterations if iterations is not None else params.iterations

    def run(frames):
        n1 = frames.shape[0]
        n = n1 - 1
        f_all = frames.astype(jnp.float32)
        klev = params.num_levels(h, w)
        inv_scale = 1.0 / params.pyr_scale
        flow = None
        hk_prev = wk_prev = None
        clip_total = jnp.zeros((n,), jnp.int32)
        for k in range(klev, -1, -1):
            if only_level is not None and k != only_level:
                continue
            hk, wk = params.level_size(h, w, k)
            ht, wt, tw_k = warp_grid(hk, wk)
            lv, _, _ = _level_image(f_all, k, params, h, w)
            if do_poly:
                p = poly_exp_fused_cf(lv, params.poly_n, params.poly_sigma, grid=(ht, wt))
            else:
                p = jnp.zeros((n1, 5, ht, wt), jnp.float32)
            r1p = pad_for_band(
                p, hk, wk, params.warp_d_max_y, params.warp_d_max_x,
                params.warp_base_max, tw=tw_k,
            )
            if flow is None or (only_level is not None):
                flow = jnp.zeros((n, 2, ht, wt), jnp.float32)
            else:
                fr = cvx.resize_bilinear(flow[:, :, :hk_prev, :wk_prev], hk, wk)
                flow = jnp.pad(fr * inv_scale,
                               ((0, 0), (0, 0), (0, ht - hk), (0, wt - wk)),
                               mode="edge")
            n_i = ht // _TH
            n_j = wt // tw_k
            n_s_full = 2 * params.warp_d_max_x + 2
            n_s1 = min(params.warp_s_cap, n_s_full) if params.warp_s_cap else n_s_full
            n_passes = params.warp_dual_passes if (params.warp_dual_frac > 0 and do_passes) else 0
            for _ in range(iterations):
                if do_warp:
                    m, clip, (bases1, smin1, rmdy, rmdx) = update_matrices_banded_cf(
                        p, flow, r1p, hk, wk,
                        d_max_y=params.warp_d_max_y, d_max_x=params.warp_d_max_x,
                        base_max=params.warp_base_max, s_cap=params.warp_s_cap,
                        precision=params.warp_precision, r1_offset=1, tw=tw_k)
                else:
                    m = jnp.zeros((n, 5, ht, wt), jnp.float32)
                    clip = jnp.zeros((n, n_i, n_j), jnp.int32)
                    n_passes = 0
                if n_passes:
                    total_tiles = n * n_i * n_j
                    kk = min(total_tiles, max(1, math.ceil(total_tiles * params.warp_dual_frac)))
                    u = clip.reshape(total_tiles)
                    mdy = rmdy.reshape(total_tiles)
                    mdx = rmdx.reshape(total_tiles)
                    prev = [(bases1[:, 1].reshape(total_tiles), bases1[:, 0].reshape(total_tiles),
                             smin1.reshape(total_tiles), jnp.ones((total_tiles,), jnp.int32), n_s1)]
                    for _p in range(n_passes):
                        _, sel = jax.lax.top_k(u, kk)
                        sel = sel.astype(jnp.int32)
                        cur = window_from_residuals(mdy, mdx, params.warp_d_max_y,
                                                    params.warp_d_max_x, params.warp_base_max, n_s1)
                        m, clip_k, rmdy_k, rmdx_k = update_matrices_banded_tiles_cf(
                            sel, m, p, flow, r1p, hk, wk,
                            cur_window=cur, prev_windows=prev,
                            d_max_y=params.warp_d_max_y, d_max_x=params.warp_d_max_x,
                            base_max=params.warp_base_max, s_cap=n_s1,
                            precision=params.warp_precision, r1_offset=1, tw=tw_k)
                        u = u.at[sel].set(clip_k)
                        mdy = mdy.at[sel].set(rmdy_k)
                        mdx = mdx.at[sel].set(rmdx_k)
                        prev.append((cur[0], cur[1], cur[2],
                                     jnp.zeros((total_tiles,), jnp.int32).at[sel].set(1), n_s1))
                    clip_pair = jnp.sum(u.reshape(n, n_i * n_j), axis=1)
                else:
                    clip_pair = jnp.sum(clip, axis=(1, 2))
                clip_total = clip_total + clip_pair
                if do_solve:
                    mp = pad_for_solve(m, hk, wk, grid=(ht, wt))
                    flow = update_flow_fused_cf(mp, hk, wk, params.winsize, params.gaussian_win)
                else:
                    flow = flow + m[:, :2] * 0.0
            hk_prev, wk_prev = hk, wk
        out = jnp.moveaxis(flow[:, :, :h, :w], 1, -1)
        return out.sum((1, 2)), clip_total

    return jax.jit(run)


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
    p = dataclasses.replace(FarnebackParams(), warp_precision="bf16")

    for (h, w, b) in [(480, 640, 256), (1080, 1920, 32)]:
        frames = jnp.asarray(render(b + 1, h, w))
        npx = b * h * w
        print(f"---- {w}x{h} chunk {b} ----", flush=True)
        full = timed("full", seq_program(p, h, w), frames, npx=npx)
        timed("no dual passes", seq_program(p, h, w, do_passes=False), frames, npx=npx)
        timed("iterations=1", seq_program(p, h, w, iterations=1), frames, npx=npx)
        timed("poly+warp+passes (no solve)", seq_program(p, h, w, do_solve=False), frames, npx=npx)
        timed("poly+solve (no warp/passes)", seq_program(p, h, w, do_warp=False), frames, npx=npx)
        timed("warp+passes+solve (no poly)", seq_program(p, h, w, do_poly=False), frames, npx=npx)
        klev = p.num_levels(h, w)
        lv_sum = 0.0
        for k in range(klev + 1):
            hk, wk = p.level_size(h, w, k)
            lv = timed(f"level {k} only ({wk}x{hk})",
                       seq_program(p, h, w, only_level=k), frames, npx=b * hk * wk)
            lv_sum += lv
        print(f"{'sum of single levels':52s} {lv_sum*1e3:9.2f} ms (vs full {full*1e3:.2f})",
              flush=True)


if __name__ == "__main__":
    main()
