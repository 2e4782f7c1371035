"""Decompose the warp kernel's ~5-6 us/tile-step cost at L0 geometry.

Round-3 eliminations: static slot structure (coarse reach: +1%), DMA
pipeline depth (4 slots: +0%), tile height (th=64: 2.8x slower —
register spills).  This probe times single kernel invocations at the
480p L0 bench geometry (b=256, native layout, 480x768 grid, tw=256)
under ablations that null different cost components:

- s_cap=14 vs s_cap=1 vs (d_max_y=1, s_cap=1): slot/guard scaffolding
- zero flow vs realistic smooth flow: live-span MAC work
- poly and solve invocations at the same grid: per-step floor of the
  simpler kernels
- fp32 vs bf16 warp MACs

Each timing repeats the invocation REPS times inside one timed region
(amortizes the ~29 ms tunnel round trip) after a warmup.

Run ALONE on the real TPU:  python -m scripts.probe_step_floor
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from btcs_pnes_optical_flow_tpu.ops.farneback_pallas import (
    pad_for_band,
    pad_for_solve,
    poly_exp_fused_cf,
    update_flow_fused_cf,
    update_matrices_banded_cf,
    warp_grid,
)

B = 256
H, W = 480, 640   # native layout: (h, w) = (480, 640)
REPS = 4


def force(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def timed(name, fn, *args, steps):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    force(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:44s} {dt*1e3:8.2f} ms  ({dt/steps*1e6:6.2f} us/step x {steps})",
          flush=True)
    return dt


def main():
    ht, wt, tw = warp_grid(H, W)
    n_i, n_j = ht // 32, wt // tw
    steps = B * n_i * n_j
    print(f"grid {ht}x{wt} tw={tw}: {n_i}x{n_j} tiles, {steps} steps", flush=True)

    # Build everything ON DEVICE: staging GBs through the ~26 MB/s axon
    # tunnel takes minutes and dominated this probe's first run.
    @jax.jit
    def make():
        r0 = jax.random.normal(jax.random.key(0), (B + 1, 5, ht, wt), jnp.float32)
        yy = jnp.arange(ht, dtype=jnp.float32)[:, None]
        xx = jnp.arange(wt, dtype=jnp.float32)[None, :]
        fx = 3.0 * jnp.sin(xx / 97.0) * jnp.cos(yy / 61.0)
        fy = 1.8 * jnp.cos(xx / 83.0) * jnp.sin(yy / 71.0)
        flow_s = jnp.broadcast_to(
            jnp.stack([fx, fy])[None], (B, 2, ht, wt)).astype(jnp.float32) + 0.0
        return r0, flow_s

    r0, flow_s = make()
    force((r0, flow_s))
    flow_0 = jnp.zeros((B, 2, ht, wt), jnp.float32)

    def warp(d_y, d_x, cap, prec):
        r1p_v = jax.jit(
            lambda r: pad_for_band(r, H, W, d_y, d_x, 56, tw=tw)
        )(r0)

        @jax.jit
        def f(r0a, r1p, fl):
            m, clip, _ = update_matrices_banded_cf(
                r0a, fl, r1p, H, W, d_max_y=d_y, d_max_x=d_x,
                base_max=56, s_cap=cap, precision=prec, r1_offset=1, tw=tw)
            return m.sum((2, 3)), clip.sum()

        return lambda fl: f(r0, r1p_v, fl)

    timed("warp prod (8,16,14,bf16) smooth", warp(8, 16, 14, "bf16"), flow_s, steps=steps)
    timed("warp prod zero-flow", warp(8, 16, 14, "bf16"), flow_0, steps=steps)
    timed("warp fp32 smooth", warp(8, 16, 14, "fp32"), flow_s, steps=steps)
    timed("warp s_cap=1 smooth", warp(8, 16, 1, "bf16"), flow_s, steps=steps)
    timed("warp d_y=1,s_cap=1 smooth", warp(1, 16, 1, "bf16"), flow_s, steps=steps)

    img = jax.jit(lambda: 40.0 * jax.random.normal(
        jax.random.key(1), (B + 1, H, W), jnp.float32))()
    force(img)

    @jax.jit
    def poly(x):
        return poly_exp_fused_cf(x, 5, 1.2, grid=(ht, wt)).sum((2, 3))

    # poly tiles are (48, 768) at this grid: (B+1) * 10 * 1 steps
    timed("poly", poly, img, steps=(B + 1) * (ht // 48))

    m5 = jax.jit(lambda: jax.random.normal(
        jax.random.key(2), (B, 5, ht, wt), jnp.float32))()
    force(m5)

    @jax.jit
    def solve(m):
        mp = pad_for_solve(m, H, W, grid=(ht, wt))
        return update_flow_fused_cf(mp, H, W, 15, False).sum((2, 3))

    timed("pad_for_solve + solve", solve, m5, steps=B * (ht // 48))

    @jax.jit
    def just_pad(m):
        return pad_for_solve(m, H, W, grid=(ht, wt)).sum((2, 3))

    timed("pad_for_solve alone (XLA pad)", just_pad, m5, steps=B)


if __name__ == "__main__":
    main()
