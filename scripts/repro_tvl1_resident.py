"""TPU-vs-interpret differential for the TV-L1 resident pd kernel.

Run on hardware: python scripts/repro_tvl1_resident.py
Checks single-block and multi-block geometries at several iteration
counts; prints max |TPU - interpret| per case.
"""
import sys

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from btcs_pnes_optical_flow_tpu.ops.tvl1_pallas import (
    _block_geometry,
    pd_chain_resident,
)

rng = np.random.default_rng(0)


def smooth(a):
    k = np.ones(9) / 9.0
    a = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, a)
    return np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, a)


for (h, w, k) in [(48, 64, 2), (48, 64, 8), (256, 320, 8), (480, 640, 8), (480, 640, 30)]:
    u = smooth(rng.normal(0, 1, (h, w))).astype(np.float32)[None]
    v = smooth(rng.normal(0, 1, (h, w))).astype(np.float32)[None]
    rc = smooth(rng.normal(0, 5, (h, w))).astype(np.float32)[None]
    wx = smooth(rng.normal(0, 2, (h, w))).astype(np.float32)[None]
    wy = smooth(rng.normal(0, 2, (h, w))).astype(np.float32)[None]
    gs = wx * wx + wy * wy

    args = tuple(jnp.asarray(x) for x in (u, v, rc, wx, wy, gs))
    got_u, got_v = pd_chain_resident(*args, n_iterations=k)
    ref_u, ref_v = pd_chain_resident(*args, n_iterations=k, interpret=True)
    du = np.abs(np.asarray(got_u) - np.asarray(ref_u)).max()
    dv = np.abs(np.asarray(got_v) - np.asarray(ref_v)).max()
    bh, halo, nb, _, _ = _block_geometry(h, w, k)
    print(f"h={h} w={w} k={k} blocks={nb} bh={bh} halo={halo}: "
          f"max|du|={du:.3e} max|dv|={dv:.3e}")
