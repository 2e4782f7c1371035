"""Measure per-level iteration schedules: EPE vs cv2 + device throughput.

Coarse pyramid iterations only refine the init handed to finer levels;
the stage ledger prices them at ~50 ms / 256 pairs (L1-L3 sweeps).
This prints, per candidate schedule: max/mean EPE vs
cv2.calcOpticalFlowFarneback on the violent bench clip (the 0.1 px
reference contract) and the fused-driver rate at the bench point.

Run ALONE on the real TPU:  python -m scripts.measure_iter_schedule
"""

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from btcs_pnes_optical_flow_tpu.config import FarnebackParams
from btcs_pnes_optical_flow_tpu.ops.farneback_fused import farneback_flow_seq
from scripts.profile_stages import render

H, W = 480, 640
N_EPE = 24
N_RATE = 256


def cv2_flows(frames, n):
    import cv2

    fb = dict(pyr_scale=0.5, levels=3, winsize=15, iterations=3,
              poly_n=5, poly_sigma=1.2, flags=0)
    return np.stack([
        cv2.calcOpticalFlowFarneback(frames[i], frames[i + 1], None, **fb)
        for i in range(n)
    ])


def main():
    frames = render(N_RATE + 1, H, W)
    ref = cv2_flows(frames, N_EPE)
    dev = jnp.asarray(frames)

    def force(x):
        return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])

    cases = [
        # Pass-1 results (2026-08-18): sched=None 507.5 | 3321 497.3 |
        #   3211 564.9 (EPE 3.1 — fails contract) | reach(4,8,8) 511.8
        #   | reach+s3321 518.9 | reach+tw384 524.6 (9806 clips —
        #   s_cap 8 too tight at 384 lanes).
        # Pass-2 verdicts: warp_th=64 2.8x SLOWER (183); poly bf16 EPE
        #   6.3 px (both knobs removed — recorded in config.py).
        # Round-5 pass (post glue-pad attack: the per-iteration cost
        # structure changed, so trimmed schedules re-price).
        ("r5 bench 3321", dict(warp_coarse_reach=(4, 8, 8),
                               iter_schedule=(3, 3, 2, 1))),
        ("r5 3221", dict(warp_coarse_reach=(4, 8, 8),
                         iter_schedule=(3, 2, 2, 1))),
        ("r5 2321", dict(warp_coarse_reach=(4, 8, 8),
                         iter_schedule=(2, 3, 2, 1))),
        ("r5 3311", dict(warp_coarse_reach=(4, 8, 8),
                         iter_schedule=(3, 3, 1, 1))),
    ]
    for name, kw in cases:
        p = dataclasses.replace(FarnebackParams(), warp_precision="bf16", **kw)
        out, clips = farneback_flow_seq(dev[: N_EPE + 1], p, return_clip=True)
        fl = np.asarray(out)
        err = np.sqrt(((fl - ref) ** 2).sum(-1))
        epe_max, epe_mean = float(err.max()), float(err.mean())

        @jax.jit
        def rate_step(f):
            # Reduce on device: a dense (256, 480, 640, 2) flow output
            # plus pyramid internals OOMs 16 GB HBM; the production
            # driver reduces to ROI means in-program the same way.
            fl, cl = farneback_flow_seq(f, p, return_clip=True)
            return fl.sum((1, 2)), cl

        force(rate_step(dev))  # compile
        t0 = time.perf_counter()
        force(rate_step(dev))
        rate = N_RATE / (time.perf_counter() - t0)
        print(
            f"{name:14s} EPE max {epe_max:7.4f} mean {epe_mean:8.5f} px  "
            f"clips {int(np.asarray(clips).sum())}  {rate:6.1f} pairs/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
