"""TV-L1 stage ablation at the bench point (480p, b=16).

First-principles cost says banded-warp + resident-pd TV-L1 should run
~60-100 fps on v5e-1 (15 banded warp samples ~1.5 ms/pair + 15 resident
30-iteration pd chains ~6 ms/pair + matmul pyramid); the bench measures
11.  This ablates: warps-only, pd-only, per-scale, and the pd block
geometry (halo recompute factor) to find the gap.

Run ALONE on the real TPU:  python -m scripts.profile_tvl1_r3
"""

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from btcs_pnes_optical_flow_tpu.ops.tvl1 import (
    TVL1Params, _pyramid_sizes, tvl1_flow,
)
from btcs_pnes_optical_flow_tpu.ops.tvl1_pallas import _block_geometry
from scripts.profile_stages import render, timed

H, W, B = 480, 640, 16


def main():
    p0 = TVL1Params(warp_engine="banded", epsilon=0.0)
    for (hh, ww) in _pyramid_sizes(H, W, p0):
        print(f"  level ({hh}x{ww}): block geometry {_block_geometry(hh, ww, p0.n_iterations)}")

    frames = render(B + 1, H, W, seed=2)
    prev = jnp.asarray(frames[:-1])
    curr = jnp.asarray(frames[1:])

    def run(p):
        def f(a, b):
            fl, cl = tvl1_flow(a, b, p, return_clip=True)
            return fl.sum((1, 2)), cl
        return jax.jit(f)

    cases = [
        ("full (banded+resident)", p0),
        ("banded, pd=xla eps0", dataclasses.replace(p0, pd_engine="xla")),
        ("banded, n_iter=1 (warp cost)", dataclasses.replace(p0, n_iterations=1)),
        ("banded, n_warps=1", dataclasses.replace(p0, n_warps=1)),
        ("banded, n_scales=1", dataclasses.replace(p0, n_scales=1)),
        ("banded, n_iter=15", dataclasses.replace(p0, n_iterations=15)),
        ("exact-gather, pd=xla eps0",
         dataclasses.replace(p0, warp_engine="exact", pd_engine="xla")),
    ]
    for name, p in cases:
        fn = run(p)
        dt = timed(name, fn, prev, curr, npx=B * H * W)
        print(f"    = {B/dt:6.1f} pairs/s", flush=True)


if __name__ == "__main__":
    main()
