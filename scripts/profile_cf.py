"""Per-stage timings of the channel-first fused flow driver at the
bench shape (B=256, 480x640).  All arrays are in kernel layout so the
jit-edge layout pollution that invalidated isolated timings of the old
channel-last kernels (see profile_inprog.py docstring) does not apply;
outputs are reduced in-jit so only scalars cross the tunnel."""

import sys

sys.path.insert(0, "/root/repo")

import time

import numpy as np
import jax
import jax.numpy as jnp

from btcs_pnes_optical_flow_tpu.config import FarnebackParams
from btcs_pnes_optical_flow_tpu.ops import cvx
from btcs_pnes_optical_flow_tpu.ops import farneback as fb
from btcs_pnes_optical_flow_tpu.ops import farneback_fused as ff
from btcs_pnes_optical_flow_tpu.ops import farneback_pallas as fbp

B, H, W = 256, 480, 640
REPS = 4
params = FarnebackParams()


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
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    del out
    return dt


def main():
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (B + 1, H, W)).astype(np.uint8))
    print("backend:", jax.default_backend())

    timed(
        "farneback_flow_seq FULL",
        jax.jit(lambda f: ff.farneback_flow_seq(f, params).sum((1, 2))),
        frames,
    )
    for cap, prec in ((6, "fp32"), (6, "bf16")):
        p2 = FarnebackParams(warp_s_cap=cap, warp_precision=prec)
        timed(
            f"FULL s_cap={cap} {prec}",
            jax.jit(lambda f, p2=p2: ff.farneback_flow_seq(f, p2).sum((1, 2))),
            frames,
        )

    f32 = frames.astype(jnp.float32)
    pe = jax.jit(lambda x: fbp.poly_exp_fused_cf(x, 5, 1.2))
    p = pe(f32)
    force(p)
    timed("poly_exp_fused_cf (257 frames, lvl0)", pe, f32)
    timed("pad_for_band (257)", jax.jit(lambda x: fbp.pad_for_band(x, H, W).sum()), p)
    r1p = jax.jit(lambda x: fbp.pad_for_band(x, H, W))(p)
    force(r1p)
    flow = jnp.zeros((B, 2, 480, 768), jnp.float32)

    def mk_um(**kw):
        return jax.jit(
            lambda a, b, c: fbp.update_matrices_banded_cf(
                a, b, c, H, W, r1_offset=1, **kw
            )[0].sum()
        )

    timed("um_cf (B=256 lvl0)", mk_um(), p, flow, r1p)
    timed("um_cf s_cap=6", mk_um(s_cap=6), p, flow, r1p)
    timed("um_cf s_cap=6 bf16", mk_um(s_cap=6, precision="bf16"), p, flow, r1p)
    m = jax.jit(
        lambda a, b, c: fbp.update_matrices_banded_cf(a, b, c, H, W, r1_offset=1)[0]
    )(p, flow, r1p)
    force(m)
    del p, r1p
    timed("pad_for_solve", jax.jit(lambda x: fbp.pad_for_solve(x, H, W).sum()), m)
    mp = jax.jit(lambda x: fbp.pad_for_solve(x, H, W))(m)
    force(mp)
    del m
    timed(
        "uf_cf (B=256 lvl0)",
        jax.jit(lambda x: fbp.update_flow_fused_cf(x, H, W, 15, False).sum()),
        mp,
    )
    del mp
    timed(
        "bases reshape-mean",
        jax.jit(
            lambda f: jnp.round(
                jnp.mean(f[:, :, :480, :768].reshape(B, 2, 15, 32, 3, 256), axis=(3, 5))
            )
            .astype(jnp.int32)
            .sum()
        ),
        flow,
    )
    timed(
        "level_image k=1 (257)",
        jax.jit(lambda f: fb._level_image(f, 1, params, H, W)[0].sum()),
        f32,
    )
    timed(
        "resize flow 240->480 + pad",
        jax.jit(
            lambda f: jnp.pad(
                cvx.resize_bilinear(f[:, :, :240, :320], 480, 640),
                ((0, 0), (0, 0), (0, 0), (0, 128)),
                mode="edge",
            ).sum()
        ),
        flow,
    )


if __name__ == "__main__":
    main()
