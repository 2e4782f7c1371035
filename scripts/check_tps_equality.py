"""Quick check: the (tps_i, tps_j) sub-tiled warp kernel matches the
tps=(1,1) kernel (interpret mode, CPU).

Each sub-tile keeps its own base/band/window, so clip/anchor scalars
must match bit-for-bit; M matches to FMA-contraction roundoff (the
compiler may fuse the MAC trees differently at different block shapes —
measured 7.6e-6 max abs on this geometry).
Run: python -m scripts.check_tps_equality
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from btcs_pnes_optical_flow_tpu.ops import farneback_pallas as fbp


def main():
    # Geometry with n_i=4, n_j=2 so both merge axes are exercised.
    h, w = 120, 500
    ht, wt, tw = fbp.warp_grid(h, w)
    th = fbp._TH
    n_i, n_j = ht // th, wt // tw
    print(f"grid n_i={n_i} n_j={n_j}")
    band_h, band_w = fbp._band_dims(8, 16, th, tw)
    tps = fbp.warp_tiles_per_step(n_i, n_j, band_h, band_w, th, tw, 2)
    print(f"auto tps = {tps}")
    assert tps != (1, 1), "geometry must exercise the merged path"

    rng = np.random.default_rng(0)
    b = 3
    r0 = jnp.asarray(rng.normal(0, 1, (b, 5, ht, wt)).astype(np.float32))
    flow = jnp.asarray(
        (rng.normal(0, 3, (b, 2, ht, wt)) + rng.normal(0, 6, (b, 2, 1, 1)))
        .astype(np.float32)
    )
    r1p = fbp.pad_for_band(r0, h, w, 8, 16, 56, tw=tw)

    def run():
        m, clip, aux = fbp.update_matrices_banded_cf(
            r0, flow, r1p, h, w, interpret=True
        )
        return [np.asarray(x) for x in (m, clip, *aux)]

    got = run()

    orig = fbp.warp_tiles_per_step
    fbp.warp_tiles_per_step = lambda *a, **k: (1, 1)
    try:
        ref = run()
    finally:
        fbp.warp_tiles_per_step = orig

    names = ["m", "clip", "bases", "smin", "rmdy", "rmdx"]
    ok = True
    for name, g, r in zip(names, got, ref):
        if name == "m":
            diff = float(np.abs(g - r).max())
            eq = diff < 1e-4
            print(f"{name:6s} {'OK' if eq else 'MISMATCH'}  maxdiff={diff:.2e}"
                  " (FMA-contraction tolerance 1e-4)")
        else:
            eq = np.array_equal(g, r)
            print(f"{name:6s} {'OK' if eq else 'MISMATCH'}")
        ok &= eq
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
