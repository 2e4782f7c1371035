"""Pinned reproducer: gather producer + Mosaic kernel chain miscompile.

On the v5e Mosaic/XLA stack in this image (jax 0.9.0 via the axon
tunnel), ONE jitted program of the shape

    gather-lowered resize (cvx.resize_bilinear's static fancy-indexing)
    -> banded warp-sample kernel (farneback_pallas.warp_sample_banded_cf)
    -> VMEM-resident primal-dual kernel (tvl1_pallas.pd_chain_resident)

silently corrupts the WARP kernel's output at certain geometry/batch
combinations: its samples read back NaN in every content row (pad rows
stay finite) and its clip counter stays 0, because NaN comparisons are
false.  The minimal case below is a 120x160 frame pair, batch 2,
resized to a 60x80 level, ONE warp + ONE 8-iteration pd chain.

The bisection matrix that isolated the gather producer (each line was
run on hardware):

  - either Mosaic kernel standalone: bit-exact at every geometry,
    batch, iteration count, blocked or single-block;
  - warp+pd chains WITHOUT the resize (raw parameters in): clean at
    any batch/warp count, even across mixed level geometries;
  - chains of warp kernels across geometries without the pd kernel:
    clean;
  - the same program with the resize replaced by a strided SLICE or by
    dense interpolation MATMULS (cvx.resize_bilinear_mm): clean;
  - the same program with the gather resize at batch=1, or at 64x128:
    clean (the trigger needs specific geometry/batch combinations —
    480p at batch 2 with the default 3-level pyramid also trips it);
  - materializing barriers before/after the pads, ANY->HBM pins,
    GridSpec vs PrefetchScalarGridSpec, stacked vs separate operands,
    rolled vs unrolled in-kernel loop: all still corrupt — the trigger
    is the gather producer, not any of those.

Production consequence: ops/tvl1.py builds its pyramid with
cvx.resize_bilinear_mm (2-tap interpolation matmuls on the MXU — also
the faster op on TPU), after which the full multi-level resident
program is bit-equal to the xla pd engine at epsilon=0 on hardware.

This script asserts the production path stays clean and reports
whether the gather-producer hazard is still present on the current
stack (HAZARD PRESENT/ABSENT), so a stack upgrade can retire the note.

Run on hardware:  python scripts/repro_mosaic_mixed_levels.py
"""
import functools
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from btcs_pnes_optical_flow_tpu.ops import cvx
from btcs_pnes_optical_flow_tpu.ops.tvl1 import (
    TVL1Params,
    _tvl1_level,
    tvl1_flow,
)

rng = np.random.default_rng(3)
h, w, b = 120, 160, 2
base = rng.normal(0, 40, (h + 32, w + 32))
k = np.ones(7) / 7.0
base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, base)
base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)


def frame(dx, dy):
    return np.clip(
        base[16 + dy : 16 + dy + h, 16 + dx : 16 + dx + w] + 128, 0, 255
    ).astype(np.uint8)


prev = jnp.asarray(np.stack([frame(2 * i, i) for i in range(b)]))
curr = jnp.asarray(np.stack([frame(2 * (i + 1), i + 1) for i in range(b)]))
params = TVL1Params(pd_engine="resident", epsilon=0.0, n_scales=2,
                    n_warps=1, n_iterations=8)

# Production path (matmul resize): must be finite and match the xla pd.
ref = np.asarray(
    tvl1_flow(prev, curr, TVL1Params(pd_engine="xla", epsilon=0.0,
                                     n_scales=2, n_warps=1, n_iterations=8))
)
got, clips = tvl1_flow(prev, curr, params, return_clip=True)
got = np.asarray(got)
d = np.abs(got - ref).max()
print(f"production (mm resize): nanfrac={np.isnan(got).mean():.3f} "
      f"clips={np.asarray(clips).tolist()} max|diff vs xla|={d:.2e}")
assert np.isfinite(got).all() and d < 1e-3, "production path broken!"


# Hazard path: identical level math, but the downsample goes through
# the GATHER-lowered resize inside the same program as the kernels.
@functools.partial(jax.jit, static_argnames=())
def gather_level(i0f, i1f):
    i0s = cvx.resize_bilinear(cvx.gaussian_blur_reflect101(i0f, 5, 0.8), 60, 80)
    i1s = cvx.resize_bilinear(cvx.gaussian_blur_reflect101(i1f, 5, 0.8), 60, 80)
    u = jnp.zeros((i0f.shape[0], 60, 80), jnp.float32)
    v = jnp.zeros_like(u)
    return _tvl1_level(i0s, i1s, u, v, params, True, True, False)


u, _, clip_g = gather_level(prev.astype(jnp.float32) / 255.0,
                            curr.astype(jnp.float32) / 255.0)
u = np.asarray(u)
if np.isnan(u).any():
    print(f"HAZARD PRESENT: gather-producer program NaNs "
          f"(nanfrac={np.isnan(u).mean():.3f}, "
          f"clips={np.asarray(clip_g).tolist()})")
else:
    print("HAZARD ABSENT: gather-producer program is finite on this "
          "stack - the resize_bilinear_mm requirement in ops/tvl1.py "
          "can be relaxed")
