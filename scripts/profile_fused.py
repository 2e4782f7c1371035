"""In-jit differencing profile: vary stage counts inside the real fused
program and difference total times — immune to jit-boundary layout
artifacts that inflate isolated kernel timings."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from btcs_pnes_optical_flow_tpu.config import FarnebackParams
from btcs_pnes_optical_flow_tpu.ops import farneback as fb

B = 256
H, W = 480, 640
REPS = 4


def force(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def timed(name, fn, *args):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    force(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:44s} {dt*1e3:9.2f} ms ({B/dt:7.1f} pairs/s)")
    return dt


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    prev = jnp.asarray(rng.integers(0, 255, (B, H, W)).astype(np.uint8))
    curr = jnp.asarray(
        np.clip(
            np.asarray(prev, int) + rng.integers(-20, 20, (B, H, W)), 0, 255
        ).astype(np.uint8)
    )

    def flow_n(iters):
        p = FarnebackParams(iterations=iters)
        return jax.jit(lambda a, b: fb.farneback_flow(a, b, p).sum((1, 2)))

    t3 = timed("flow iterations=3 (default)", flow_n(3), prev, curr)
    t1 = timed("flow iterations=1", flow_n(1), prev, curr)
    print(f"{'=> per-extra-iteration (um+uf all levels)':44s} {(t3-t1)/2*1e3:9.2f} ms")

    params = FarnebackParams()

    def poly_only(a, b):
        acc = jnp.zeros((B,), jnp.float32)
        pe = fb._select_poly_exp(params)
        for k in range(params.num_levels(H, W), -1, -1):
            for img in (a.astype(jnp.float32), b.astype(jnp.float32)):
                i0, _, _ = fb._level_image(img, k, params, H, W)
                r = pe(i0, params.poly_n, params.poly_sigma)
                acc = acc + r.sum((1, 2, 3))
        return acc

    tp = timed("level images + poly_exp only (all levels)", jax.jit(poly_only), prev, curr)

    def levels_only(a, b):
        acc = jnp.zeros((B,), jnp.float32)
        for k in range(params.num_levels(H, W), -1, -1):
            for img in (a.astype(jnp.float32), b.astype(jnp.float32)):
                i0, _, _ = fb._level_image(img, k, params, H, W)
                acc = acc + i0.sum((1, 2))
        return acc

    tl = timed("level images only (all levels, both frames)", jax.jit(levels_only), prev, curr)
    print(f"{'=> poly_exp share (tp - tl)':44s} {(tp-tl)*1e3:9.2f} ms")
    print(f"{'=> um(x3)+uf(x3) + init-um share (t3 - tp)':44s} {(t3-tp)*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
