"""Measure warp-kernel cost vs tile geometry at the 480p bench levels.

The step-floor probe showed the warp's cost is ~2.9 us/step of
per-tile-step overhead that is neither the slot structure (s_cap=1:
-3%) nor band bytes (d_y=1, 25% fewer bytes: -6%) — it pays per grid
step.  Wider tiles amortize it: L0 (480x640) fits ONE 640-lane tile
column (power-of-two band_w=1024 keeps the lane roll exact), L1
(240x320) one 384-lane column.  This times the production call at each
geometry, plus zero-flow floors, before changing warp_grid.

Run ALONE on the real TPU:  python -m scripts.probe_geometry
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from btcs_pnes_optical_flow_tpu.ops.farneback_pallas import (
    pad_for_band,
    update_matrices_banded_cf,
)

B = 256
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
    print(f"{name:46s} {dt*1e3:8.2f} ms  ({dt/steps*1e6:6.2f} us/step x {steps})",
          flush=True)
    return dt


def bench_level(h, w, d_y, d_x, cap, tws, smooth_amp):
    for tw in tws:
        ht = -(-h // 32) * 32
        wt = -(-w // tw) * tw
        n_i, n_j = ht // 32, wt // tw
        steps = B * n_i * n_j

        @jax.jit
        def make(ht=ht, wt=wt, amp=smooth_amp):
            r0 = jax.random.normal(jax.random.key(0), (B + 1, 5, ht, wt), jnp.float32)
            yy = jnp.arange(ht, dtype=jnp.float32)[:, None]
            xx = jnp.arange(wt, dtype=jnp.float32)[None, :]
            fx = amp * jnp.sin(xx / 97.0) * jnp.cos(yy / 61.0)
            fy = 0.6 * amp * jnp.cos(xx / 83.0) * jnp.sin(yy / 71.0)
            flow_s = jnp.broadcast_to(
                jnp.stack([fx, fy])[None], (B, 2, ht, wt)).astype(jnp.float32) + 0.0
            return r0, flow_s

        r0, flow_s = make()
        force((r0, flow_s))
        r1p = jax.jit(
            lambda r, tw=tw: pad_for_band(r, h, w, d_y, d_x, 56, tw=tw)
        )(r0)
        force(r1p)

        @jax.jit
        def f(r0a, r1pa, fl, tw=tw):
            m, clip, _ = update_matrices_banded_cf(
                r0a, fl, r1pa, h, w, d_max_y=d_y, d_max_x=d_x,
                base_max=56, s_cap=cap, precision="bf16", r1_offset=1, tw=tw)
            return m.sum((2, 3)), clip.sum()

        name = f"{h}x{w} tw={tw} ({n_i}x{n_j}) reach=({d_y},{d_x},{cap})"
        timed(name + " smooth", f, r0, r1p, flow_s, steps=steps)
        # Correctness screen (ADVICE r3): wider tiles widen the
        # within-tile displacement span — a geometry that times well
        # but clips is NOT a candidate (round 3 measured 9.8k clips at
        # coarse tw=384 under s_cap=8).
        n_clip = int(np.asarray(f(r0, r1p, flow_s)[1]))
        print(f"{'':46s} clips={n_clip}", flush=True)
        timed(name + " zero", f, r0, r1p,
              jnp.zeros((B, 2, ht, wt), jnp.float32), steps=steps)
        del r0, r1p, flow_s


def main():
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    # L0: 480x640.  tw=256 -> 15x3 grid (768 wide, 1.2x pad);
    # tw=640 -> 15x1 (exact); tw=128 -> 15x5 (exact, most steps).
    bench_level(480, 640, 8, 16, 14, (256, 640), smooth_amp=3.0)
    # L1: 240x320.  tw=256 -> 8x2 (512 wide, 1.6x pad);
    # tw=384 -> 8x1 (1.2x pad).
    bench_level(240, 320, 8, 16, 14, (256, 384), smooth_amp=1.5)


if __name__ == "__main__":
    main()
