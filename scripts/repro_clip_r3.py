"""Bisect the 512/512-pair clip regression at 480p (round 3).

Runs each 480p pyramid-level geometry through the three Pallas kernels
on the real TPU, differentially against the exact XLA ops, printing
max-abs error and clip counts per level.  Smooth small flow: the clip
count must be ZERO everywhere.

Run ALONE.
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from btcs_pnes_optical_flow_tpu.config import FarnebackParams
from btcs_pnes_optical_flow_tpu.ops import farneback as fb
from btcs_pnes_optical_flow_tpu.ops.farneback_pallas import (
    pad_for_band,
    pad_for_solve,
    poly_exp_fused_cf,
    update_flow_fused_cf,
    update_matrices_banded_cf,
    warp_grid,
)

B = 2


def main():
    print("backend:", jax.default_backend())
    p = FarnebackParams()
    rng = np.random.default_rng(0)
    h0, w0 = 480, 640
    for k in range(4):
        hk, wk = p.level_size(h0, w0, k)
        ht, wt, tw = warp_grid(hk, wk)
        print(f"\n== level {k}: ({hk}, {wk}) grid ({ht}, {wt}) tw {tw}")

        img = jnp.asarray(
            np.clip(rng.normal(110, 35, (B, hk, wk)), 0, 255).astype(np.float32)
        )
        # poly: fused vs exact
        r_ref = np.moveaxis(np.asarray(fb.poly_exp(img, p.poly_n, p.poly_sigma)), -1, 1)
        r_cf = poly_exp_fused_cf(img, p.poly_n, p.poly_sigma, grid=(ht, wt))
        e_poly = np.abs(np.asarray(r_cf)[:, :, :hk, :wk] - r_ref).max()
        print(f"  poly maxdiff {e_poly:.3e}")

        # warp um: banded vs exact, smooth small flow (must not clip)
        yy, xx = np.mgrid[0:hk, 0:wk].astype(np.float32)
        fl = np.stack(
            [2.0 + 0.004 * xx + 0.002 * yy, -1.5 + 0.003 * yy], 0
        )[None].repeat(B, 0)
        flow_cf = jnp.asarray(
            np.pad(fl, ((0, 0), (0, 0), (0, ht - hk), (0, wt - wk)), mode="edge")
        )
        r0 = rng.normal(size=(B, hk, wk, 5)).astype(np.float32)
        r1 = rng.normal(size=(B, hk, wk, 5)).astype(np.float32)
        r0_cf = jnp.asarray(
            np.pad(np.moveaxis(r0, -1, 1), ((0, 0), (0, 0), (0, ht - hk), (0, wt - wk)), mode="edge")
        )
        r1_cf = jnp.asarray(np.moveaxis(r1, -1, 1))
        r1p = pad_for_band(r1_cf, hk, wk, p.warp_d_max_y, p.warp_d_max_x, p.warp_base_max, tw=tw)
        m, clip, _ = update_matrices_banded_cf(
            r0_cf, flow_cf, r1p, hk, wk,
            d_max_y=p.warp_d_max_y, d_max_x=p.warp_d_max_x,
            base_max=p.warp_base_max, s_cap=p.warp_s_cap, tw=tw,
        )
        m_ref = np.asarray(
            fb.update_matrices(jnp.asarray(r0), jnp.asarray(r1), jnp.asarray(np.moveaxis(fl, 1, -1)))
        )
        got = np.moveaxis(np.asarray(m)[:, :, :hk, :wk], 1, -1)
        e_um = np.abs(got - m_ref).max()
        n_clip = int(np.asarray(clip).sum())
        print(f"  warp maxdiff {e_um:.3e}  clip {n_clip}")

        # solve: fused vs exact on the same M
        m_full = jnp.asarray(np.moveaxis(m_ref, -1, 1))
        mp = pad_for_solve(
            jnp.pad(m_full, ((0, 0), (0, 0), (0, ht - hk), (0, wt - wk)), mode="edge"),
            hk, wk, grid=(ht, wt),
        )
        uf = update_flow_fused_cf(mp, hk, wk, p.winsize, p.gaussian_win)
        uf_ref = np.asarray(fb.update_flow(jnp.asarray(m_ref), p.winsize, p.gaussian_win))
        got_uf = np.moveaxis(np.asarray(uf)[:, :, :hk, :wk], 1, -1)
        e_uf = np.abs(got_uf - uf_ref).max()
        print(f"  solve maxdiff {e_uf:.3e}")


if __name__ == "__main__":
    main()
