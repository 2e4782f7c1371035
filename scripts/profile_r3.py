"""Round-3 stage attribution at the bench operating point.

Times roi_body_flow_seq (the production chunk program) at 480p/chunk-256
under parameter variants that each remove one stage of the fused driver:

  full          3 iterations, 2 dual passes       (the bench path)
  nodual        warp_dual_frac=0                  (no multi-window passes)
  iter1         iterations=1                      (1x um+pad+uf per level)
  iter0         iterations=0                      (level images + poly only)
  bf16          warp_precision="bf16"             (half-width warp MACs)

Differences attribute: dual-pass cost = full - nodual; per-iteration
(um + pad_for_solve + uf) cost = (full - iter1) / 2; fixed pyramid+poly
cost = iter0.  Run ALONE (concurrent load corrupts the numbers).
"""

import dataclasses
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import render_clip  # noqa: E402

from btcs_pnes_optical_flow_tpu.config import PipelineConfig
from btcs_pnes_optical_flow_tpu.models.flow import roi_body_flow_seq
from btcs_pnes_optical_flow_tpu.ops.cvx import fill_poly_mask

B = 256
H, W = 480, 640
REPS = 3


def force(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def main():
    print("backend:", jax.default_backend())
    frames = jnp.asarray(render_clip(B + 1))
    roi = np.array([[140.0, 90.0], [520.0, 110.0], [500.0, 400.0], [120.0, 380.0]])
    masks = jnp.asarray(fill_poly_mask(H, W, roi)[None])
    theta = 0.3
    ex = jnp.asarray(np.tile(np.array([np.cos(theta), -np.sin(theta)], np.float32), (B, 1)))
    ey = jnp.asarray(np.tile(np.array([np.sin(theta), np.cos(theta)], np.float32), (B, 1)))

    cfg = PipelineConfig().flow
    variants = [
        ("full", cfg),
        ("nodual", dataclasses.replace(cfg, warp_dual_frac=0.0)),
        ("iter1", dataclasses.replace(cfg, iterations=1)),
        ("iter0", dataclasses.replace(cfg, iterations=0)),
        ("bf16", dataclasses.replace(cfg, warp_precision="bf16")),
    ]
    results = {}
    for name, p in variants:
        try:
            t0 = time.perf_counter()
            out = roi_body_flow_seq(frames, ex, ey, masks, p)
            force(out)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = roi_body_flow_seq(frames, ex, ey, masks, p)
            force(out)
            dt = (time.perf_counter() - t0) / REPS
            results[name] = dt
            print(f"{name:8s} {dt*1e3:9.2f} ms  ({B/dt:7.1f} pairs/s)  [compile {compile_s:.0f}s]")
        except Exception as e:
            print(f"{name:8s} FAILED {type(e).__name__}: {str(e)[:120]}")
    if {"full", "nodual", "iter1", "iter0"} <= results.keys():
        f, nd, i1, i0 = (results[k] for k in ("full", "nodual", "iter1", "iter0"))
        print(f"\nattribution per chunk ({B} pairs):")
        print(f"  dual passes            {1e3*(f-nd):8.2f} ms")
        print(f"  per-iter um+pad+uf     {1e3*(f-i1)/2:8.2f} ms x2 extra iters")
        print(f"  pyramid+poly fixed     {1e3*i0:8.2f} ms")
        print(f"  1-iter um+uf residual  {1e3*(i1-i0):8.2f} ms")


if __name__ == "__main__":
    main()
