"""Per-stage TPU profiling of the Farnebäck hot path at bench config.

Times each kernel family in isolation at the shapes the 480p bench
actually runs (chunk of frame pairs, levels 0..3), fencing with a host
transfer (jax.block_until_ready is a no-op through the axon tunnel)
and subtracting the trivial-op round-trip baseline.  Repeated calls
inside one timed region amortize the tunnel latency.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from btcs_pnes_optical_flow_tpu.config import FarnebackParams
from btcs_pnes_optical_flow_tpu.ops import farneback as fb
from btcs_pnes_optical_flow_tpu.ops import farneback_pallas as fbp

B = 256
H, W = 480, 640
REPS = 4
params = FarnebackParams()


def force(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def timed(name, fn, *args, b=B):
    out = fn(*args)  # compile
    force(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    force(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:42s} {dt*1e3:9.2f} ms  ({b/dt:8.1f} items/s)")
    return dt * (B / b)


def smooth_flow(rng, b, hk, wk, amp=3.0):
    """Spatially smooth flow like real content (the banded kernel's
    sparse predication depends on within-tile coherence; random flow
    makes every candidate live and wildly over-states its cost)."""
    yy, xx = np.mgrid[0:hk, 0:wk]
    fx = amp * np.sin(xx / 97.0 + 0.3) * np.cos(yy / 61.0)
    fy = amp * 0.6 * np.cos(xx / 83.0) * np.sin(yy / 71.0 + 1.0)
    f = np.stack([fx, fy], -1).astype(np.float32)
    return jnp.asarray(np.broadcast_to(f, (b, hk, wk, 2)).copy())


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())

    img_full = jnp.asarray(rng.integers(0, 255, (B, H, W)).astype(np.uint8))
    img_f = img_full.astype(jnp.float32)

    # trivial baseline (tunnel round trip)
    triv = jax.jit(lambda x: x[0, 0, 0:1] + 1)
    force(triv(img_f))
    t0 = time.perf_counter()
    for _ in range(REPS):
        o = triv(img_f)
    force(o)
    print(f"{'trivial (tunnel RT)':42s} {(time.perf_counter()-t0)/REPS*1e3:9.2f} ms")

    total = 0.0
    klev = params.num_levels(H, W)
    lvl = {}
    for k in range(klev, -1, -1):
        hk, wk = params.level_size(H, W, k)
        # Isolated (B,H,W,5) jit arguments get a channel-minor T(8,128)
        # layout that pads 5 -> 128 lanes (25.6x HBM); inside the real
        # fused program the intermediate keeps (B,5,H,W).  Cap the
        # standalone batch so profiling fits, and scale back to B.
        bk = 32 if hk * wk >= 480 * 640 else B
        li = jax.jit(lambda x, k=k: fb._level_image(x, k, params, H, W)[0])
        dt_li = timed(f"level_image k={k} ({hk}x{wk})", li, img_f)
        r = jnp.asarray(rng.normal(size=(bk, hk, wk, 5)).astype(np.float32))
        flow = smooth_flow(rng, bk, hk, wk)
        imgk = jnp.asarray(rng.normal(100, 30, (bk, hk, wk)).astype(np.float32))
        dt_pe = timed(f"poly_exp_fused   k={k}", fbp.poly_exp_fused, imgk, 5, 1.2, b=bk)
        dt_um = timed(
            f"update_matrices_banded k={k}", fbp.update_matrices_banded, r, r, flow, b=bk
        )
        m = r
        dt_uf = timed(f"update_flow_fused k={k}", fbp.update_flow_fused, m, 15, False, b=bk)
        # per level: 2 level images + 2 poly_exp + 3 um + 3 uf
        lvl[k] = 2 * dt_li + 2 * dt_pe + 3 * dt_um + 3 * dt_uf
        print(
            f"  level {k} total: {lvl[k]*1e3:9.2f} ms "
            f"(li 2x{dt_li*1e3:.1f} pe 2x{dt_pe*1e3:.1f} "
            f"um 3x{dt_um*1e3:.1f} uf 3x{dt_uf*1e3:.1f})"
        )
        total += lvl[k]

    print(f"{'sum of stages':42s} {total*1e3:9.2f} ms -> {B/total:.1f} pairs/s")

    # whole-flow reference (reduce inside the jit: returning raw
    # (B,H,W,2) would materialize a 2->128 lane-padded layout, 40 GB)
    fl = jax.jit(lambda p, c: fb.farneback_flow(p, c, params).sum((1, 2)))
    timed("farneback_flow (full, fused jit)", fl, img_full, img_full)


if __name__ == "__main__":
    main()
