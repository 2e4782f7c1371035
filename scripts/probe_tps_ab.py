"""A/B the warp kernel's (tps_i, tps_j) merge and band dtype on TPU.

The round-4 sub-tile merge (warp_tiles_per_step) regressed the full
seq program 485 -> 1191 ms at the bench point; this isolates which
axis did it: the merge factor (VMEM pressure may disable Mosaic's io
block double-buffering) or the bf16 band storage.

Times ONE warp update at the transposed L0 bench geometry (640x480
native -> (640, 512) grid, B=256), like a single production sweep.

Run ALONE on the real TPU:  python -m scripts.probe_tps_ab
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from btcs_pnes_optical_flow_tpu.ops import farneback_pallas as fbp

B = 256
H, W = 640, 480   # transposed layout, like the production driver
REPS = 3


def main():
    print("backend:", jax.default_backend(), flush=True)
    ht, wt, tw = fbp.warp_grid(H, W)
    th = fbp._TH
    n_i, n_j = ht // th, wt // tw
    print(f"grid ({ht},{wt}) tw={tw} n=({n_i},{n_j})", flush=True)

    @jax.jit
    def make():
        r0 = jax.random.normal(jax.random.key(0), (B + 1, 5, ht, wt), jnp.float32)
        yy = jnp.arange(ht, dtype=jnp.float32)[:, None]
        xx = jnp.arange(wt, dtype=jnp.float32)[None, :]
        fx = 3.0 * jnp.sin(xx / 97.0) * jnp.cos(yy / 61.0)
        fy = 1.8 * jnp.cos(xx / 83.0) * jnp.sin(yy / 71.0)
        flow = jnp.broadcast_to(
            jnp.stack([fx, fy])[None], (B, 2, ht, wt)).astype(jnp.float32) + 0.0
        return r0, flow

    r0, flow = make()
    np.asarray(r0.ravel()[0:1])

    def run(name, tps, band_dtype, precision):
        orig = fbp.warp_tiles_per_step
        fbp.warp_tiles_per_step = lambda *a, **k: tps
        try:
            r1p = jax.jit(
                lambda r: fbp.pad_for_band(r, H, W, 8, 16, 56, tw=tw,
                                           dtype=band_dtype)
            )(r0)
            np.asarray(r1p.ravel()[0:1])

            @jax.jit
            def f(r0a, fl, r1pa):
                m, clip, _ = fbp.update_matrices_banded_cf(
                    r0a, fl, r1pa, H, W, s_cap=14, precision=precision,
                    r1_offset=1, tw=tw,
                )
                return m.sum((2, 3)), clip.sum()

            out = f(r0, flow, r1p)
            np.asarray(out[0].ravel()[0:1])
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = f(r0, flow, r1p)
            np.asarray(out[0].ravel()[0:1])
            dt = (time.perf_counter() - t0) / REPS
            steps = B * n_i * n_j
            print(f"{name:44s} {dt*1e3:8.2f} ms ({dt/steps*1e6:5.2f} us/tile)"
                  f"  clips={int(np.asarray(out[1]))}", flush=True)
        finally:
            fbp.warp_tiles_per_step = orig

    run("tps=(1,1) f32 band fp32 MAC   [round-3 cfg]", (1, 1), None, "fp32")
    run("tps=(1,1) f32 band bf16 MAC   [round-3 bench]", (1, 1), None, "bf16")
    run("tps=(1,1) bf16 band bf16 MAC", (1, 1), jnp.bfloat16, "bf16")
    run("tps=(2,1) f32 band bf16 MAC", (2, 1), None, "bf16")
    run("tps=(2,2) f32 band bf16 MAC", (2, 2), None, "bf16")
    run("tps=(5,1) f32 band bf16 MAC", (5, 1), None, "bf16")
    run("tps=(5,1) bf16 band bf16 MAC  [round-4 cfg]", (5, 1), jnp.bfloat16, "bf16")
    run("tps=(2,1) bf16 band bf16 MAC", (2, 1), jnp.bfloat16, "bf16")


if __name__ == "__main__":
    main()
