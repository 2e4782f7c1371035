"""Per-kernel split of one warp+solve round at the bench L0 shape.

profile_r3.py showed each extra iteration (warp um + pad_for_solve +
solve uf, summed over pyramid levels) costs ~129 ms per 256-pair chunk.
This script times the three pieces separately at the L0 geometry
(480x640 -> warp grid 480x768) to decide where the next kernel work
goes: the banded warp's candidate scan vs the winsize-15 window solve.

Run ALONE (single-core host; any concurrent process corrupts numbers).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from btcs_pnes_optical_flow_tpu.config import FarnebackParams
from btcs_pnes_optical_flow_tpu.ops.farneback_pallas import (
    pad_for_band,
    pad_for_solve,
    poly_exp_fused_cf,
    update_flow_fused_cf,
    update_matrices_banded_cf,
    warp_grid,
)

B = 256
H, W = 480, 640
REPS = 5


def fence(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    fence(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:16s} {dt*1e3:9.2f} ms  [compile {compile_s:.0f}s]")
    return out, dt


def main():
    print("backend:", jax.default_backend())
    p = FarnebackParams()
    ht, wt, tw = warp_grid(H, W)
    print(f"L0 grid ({ht}, {wt}) tile_w {tw}")
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(80, 20, (B, H, W)).astype(np.float32))

    jpoly = jax.jit(lambda im: poly_exp_fused_cf(im, p.poly_n, p.poly_sigma, grid=(ht, wt)))
    r0, t_poly = timeit("poly_exp", jpoly, img)

    jband = jax.jit(
        lambda r: pad_for_band(r, H, W, p.warp_d_max_y, p.warp_d_max_x, p.warp_base_max, tw=tw)
    )
    r1p, t_band = timeit("pad_for_band", jband, r0)

    flow = jnp.zeros((B, 2, ht, wt), jnp.float32)

    def jwarp(r0_, fl_, r1p_):
        return update_matrices_banded_cf(
            r0_, fl_, r1p_, H, W,
            d_max_y=p.warp_d_max_y, d_max_x=p.warp_d_max_x,
            base_max=p.warp_base_max, s_cap=p.warp_s_cap,
            precision=p.warp_precision, tw=tw,
        )
    jwarp = jax.jit(jwarp)
    (m, clip, _), t_warp = timeit("warp um", jwarp, r0, flow, r1p)

    def jwarp_bf16(r0_, fl_, r1p_):
        return update_matrices_banded_cf(
            r0_, fl_, r1p_, H, W,
            d_max_y=p.warp_d_max_y, d_max_x=p.warp_d_max_x,
            base_max=p.warp_base_max, s_cap=p.warp_s_cap,
            precision="bf16", tw=tw,
        )
    timeit("warp um bf16", jax.jit(jwarp_bf16), r0, flow, r1p)

    jpad = jax.jit(lambda m_: pad_for_solve(m_, H, W, grid=(ht, wt)))
    mp, t_pad = timeit("pad_for_solve", jpad, m)

    jsolve = jax.jit(lambda mp_: update_flow_fused_cf(mp_, H, W, p.winsize, p.gaussian_win))
    _, t_solve = timeit("solve uf", jsolve, mp)

    # fused pad+solve as one program (what the driver actually runs)
    jps = jax.jit(
        lambda m_: update_flow_fused_cf(pad_for_solve(m_, H, W, grid=(ht, wt)), H, W, p.winsize)
    )
    timeit("pad+solve fused", jps, m)

    round_ms = 1e3 * (t_warp + t_pad + t_solve)
    print(f"\nL0 round total  {round_ms:8.2f} ms "
          f"(warp {100*t_warp/(t_warp+t_pad+t_solve):.0f}% / "
          f"pad {100*t_pad/(t_warp+t_pad+t_solve):.0f}% / "
          f"solve {100*t_solve/(t_warp+t_pad+t_solve):.0f}%)")


if __name__ == "__main__":
    main()
