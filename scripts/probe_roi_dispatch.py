"""ROI-aware dispatch on hardware: equality inside the ROI + speed.

Round-5 gate for VERDICT r4 #2: the fused driver with
roi_active_px set must (a) reproduce the full-dispatch flow inside the
ROI bounding box, (b) keep clip counts at zero on the bench clip, and
(c) run measurably faster.  Run ALONE on the real TPU:

    python -m scripts.probe_roi_dispatch
"""

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from bench import H, W, render_clip
from btcs_pnes_optical_flow_tpu.config import FarnebackParams
from btcs_pnes_optical_flow_tpu.ops.cvx import fill_poly_mask
from btcs_pnes_optical_flow_tpu.ops.farneback_fused import (
    farneback_flow_seq,
    roi_dispatch_params,
)

B = 64


def force(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def main():
    print("backend:", jax.default_backend(), flush=True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    frames = jnp.asarray(render_clip(B + 1))
    roi = np.array([[140.0, 90.0], [520.0, 110.0], [500.0, 400.0], [120.0, 380.0]])
    mask = fill_poly_mask(H, W, roi)
    ys, xs = np.nonzero(mask)
    ybox = slice(ys.min(), ys.max() + 1)
    xbox = slice(xs.min(), xs.max() + 1)

    base = dataclasses.replace(
        FarnebackParams(), warp_precision="bf16",
        iter_schedule=(3, 3, 2, 1), warp_coarse_reach=(4, 8, 8),
    )
    p_roi = roi_dispatch_params(base, H, W, mask)
    print("boxes:", p_roi.roi_active_px, flush=True)

    results = {}
    for name, p in (("full", base), ("roi", p_roi)):
        fl, clips = farneback_flow_seq(frames, p, return_clip=True)
        force(fl)  # compile
        t0 = time.perf_counter()
        fl, clips = farneback_flow_seq(frames, p, return_clip=True)
        force(fl)
        dt = time.perf_counter() - t0
        nclip = int(np.asarray(clips).sum())
        print(f"{name:5s} {B/dt:8.1f} pairs/s  clips={nclip}", flush=True)
        results[name] = (np.asarray(fl[:, ybox, xbox]), nclip, dt)

    d = np.abs(results["roi"][0] - results["full"][0])
    print(f"max |roi - full| inside ROI bbox: {d.max():.3e}", flush=True)
    print(f"speedup: {results['full'][2] / results['roi'][2]:.3f}x", flush=True)
    assert d.max() < 1e-4, d.max()
    assert results["roi"][1] == 0


if __name__ == "__main__":
    main()
