"""Bisect the warp kernel's per-grid-step floor with minimal kernels.

probe_floor3 eliminated the in-kernel reductions (moving them to XLA is
a net LOSS), the lane roll (free), and the band DMA (free/overlapped).
probe_geometry eliminated fat tiles (tw=640: 4x slower — spills).
This measures, at the exact L0 grid (256 x 15 x 3 steps, same block
specs as production):

1. copy5        — out block = in block.  Pure Mosaic grid/pipeline floor.
2. +band        — plus the per-tile (5, 64, 512) band DMA (value used).
3. +roll        — plus the full-band dynamic lane roll.
4. +geom        — plus the coordinate/index/mask prologue + reductions.
5. +epilogue    — plus the M assembly math (no MAC loop at all).

Run ALONE on the real TPU:  python -m scripts.probe_floor4
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from btcs_pnes_optical_flow_tpu.ops.farneback import _BORDER_SCALE
from btcs_pnes_optical_flow_tpu.ops.farneback_pallas import (
    _band_dims,
    pad_for_band,
    warp_grid,
)

B = 256
H, W = 480, 640
REPS = 4
TH, TW = 32, 256
D_Y, D_X, CAP, BMAX = 8, 16, 14, 56


def _border_scale_vec(pos, size):
    s = jnp.ones_like(pos, jnp.float32)
    for i, v in enumerate(_BORDER_SCALE):
        s = jnp.where(pos == i, s * v, s)
        s = jnp.where(pos == size - 1 - i, s * v, s)
    return s


def make_kernel(level, hp, wp):
    band_h, band_w = _band_dims(D_Y, D_X, TH, TW)
    n_t = 2 * D_Y + 2 + 7
    n_s_full = 2 * D_X + 2
    n_s = CAP
    pad_y = BMAX + D_Y + 2
    pad_x = BMAX + D_X + 2
    h, w = H, W

    def kernel(by_ref, bx_ref, r0_ref, flow_ref, r1_ref, m_ref,
               band2, sem2, *, n_i, n_j):
        bb = pl.program_id(0)
        ti = pl.program_id(1)
        tj = pl.program_id(2)
        y0g = ti * TH
        x0g = tj * TW
        idx = (bb * n_i + ti) * n_j + tj
        total = pl.num_programs(0) * n_i * n_j

        if level == 0:  # copy only
            m_ref[...] = r0_ref[...]
            return

        def tile_geometry(flat_idx):
            tj_ = flat_idx % n_j
            rest = flat_idx // n_j
            ti_ = rest % n_i
            bb_ = rest // n_i
            row0_ = jnp.clip(ti_ * TH + by_ref[flat_idx] - D_Y + pad_y, 0, hp - band_h)
            col0_ = jnp.clip(tj_ * TW + bx_ref[flat_idx] - D_X + pad_x, 0, wp - band_w)
            row0a_ = pl.multiple_of((row0_ // 8) * 8, 8)
            col0a_ = pl.multiple_of((col0_ // 128) * 128, 128)
            return bb_, row0_, col0_, row0a_, col0a_

        def band_dma(flat_idx, slot):
            bb_, _, _, row0a_, col0a_ = tile_geometry(flat_idx)
            return pltpu.make_async_copy(
                r1_ref.at[bb_ + 1, :, pl.ds(row0a_, band_h), pl.ds(col0a_, band_w)],
                band2.at[slot],
                sem2.at[slot],
            )

        cur = idx % 2

        @pl.when(idx == 0)
        def _():
            band_dma(idx, cur).start()

        @pl.when(idx + 1 < total)
        def _():
            band_dma(idx + 1, (idx + 1) % 2).start()

        band_dma(idx, cur).wait()
        band = band2[cur]
        _, row0, col0, row0a, col0a = tile_geometry(idx)
        m_col = col0 - col0a

        if level == 1:  # band DMA only
            m_ref[...] = r0_ref[...]
            m_ref[0, 0] += band[0, :TH, :TW]
            return

        if level >= 2:
            rolled = pltpu.roll(
                band.reshape(5 * band_h, band_w), shift=-(m_col), axis=1
            )
            bandv = [rolled[c * band_h : (c + 1) * band_h] for c in range(5)]

        if level == 2:  # + roll
            m_ref[...] = r0_ref[...]
            m_ref[0, 0] += bandv[0][:TH, :TW]
            return

        fx = flow_ref[0, 0]
        fy = flow_ref[0, 1]
        ii = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0) + y0g
        jj = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1) + x0g
        gx = jj.astype(jnp.float32) + fx
        gy = ii.astype(jnp.float32) + fy
        x1f = jnp.floor(gx)
        y1f = jnp.floor(gy)
        ax = gx - x1f
        ay = gy - y1f
        x1i = x1f.astype(jnp.int32)
        y1i = y1f.astype(jnp.int32)
        inside = (x1i >= 0) & (x1i < w - 1) & (y1i >= 0) & (y1i < h - 1)
        live = inside & (ii < h) & (jj < w)
        t_raw = y1i - ii + (y0g - (row0a - pad_y))
        t_idx = jnp.clip(t_raw, 0, n_t - 1)
        s_raw = x1i - jj + (x0g - (col0 - pad_x))
        s_full = jnp.clip(s_raw, 0, n_s_full - 1)
        smin = jnp.min(jnp.where(live, s_full, n_s_full - 1))
        smin = jnp.clip(smin, 0, max(n_s_full - n_s, 0))
        s_idx = jnp.clip(s_full - smin, 0, n_s - 1)
        live_t = jnp.where(live, t_idx, -1)
        tmin = jnp.min(jnp.where(live, t_idx, n_t - 1))
        tmax = jnp.max(live_t)
        smin_b = jnp.min(jnp.where(live, s_idx, n_s - 1))
        smax = jnp.max(jnp.where(live, s_idx, 0))

        if level == 3:  # + geometry/masks/reductions (no MAC, no epilogue)
            m_ref[...] = r0_ref[...]
            m_ref[0, 0] += bandv[0][:TH, :TW] + ax + ay
            m_ref[0, 1] += (t_idx + s_idx + tmin + tmax + smin_b + smax).astype(
                jnp.float32
            )
            return

        # level 4: + epilogue (M assembly from zero accs — no MAC loop)
        r2s = bandv[0][:TH, :TW] * 0.0 + ax * 0.0 + ay * 0.0 + (
            (t_idx + s_idx + tmin + tmax + smin_b + smax).astype(jnp.float32) * 0.0
        )
        r3s = r2s
        r4s = r2s
        r5s = r2s
        r6s = r2s
        r0b = r0_ref[0]
        r4 = jnp.where(inside, (r0b[2] + r4s) * 0.5, r0b[2])
        r5 = jnp.where(inside, (r0b[3] + r5s) * 0.5, r0b[3])
        r6 = jnp.where(inside, (r0b[4] + r6s) * 0.25, r0b[4] * 0.5)
        r2 = (r0b[0] - jnp.where(inside, r2s, 0.0)) * 0.5
        r3 = (r0b[1] - jnp.where(inside, r3s, 0.0)) * 0.5
        r2 = r2 + r4 * fy + r6 * fx
        r3 = r3 + r6 * fy + r5 * fx
        scale = _border_scale_vec(ii, h) * _border_scale_vec(jj, w)
        r2 = r2 * scale
        r3 = r3 * scale
        r4 = r4 * scale
        r5 = r5 * scale
        r6 = r6 * scale
        m_ref[0, 0] = r4 * r4 + r6 * r6
        m_ref[0, 1] = (r4 + r5) * r6
        m_ref[0, 2] = r5 * r5 + r6 * r6
        m_ref[0, 3] = r4 * r2 + r6 * r3
        m_ref[0, 4] = r6 * r2 + r5 * r3

    return kernel, band_h, band_w


def main():
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    ht, wt, tw = warp_grid(H, W)
    assert tw == TW
    n_i, n_j = ht // TH, wt // TW
    steps = B * n_i * n_j

    @jax.jit
    def make():
        r0 = jax.random.normal(jax.random.key(0), (B + 1, 5, ht, wt), jnp.float32)
        yy = jnp.arange(ht, dtype=jnp.float32)[:, None]
        xx = jnp.arange(wt, dtype=jnp.float32)[None, :]
        fx = 3.0 * jnp.sin(xx / 97.0) * jnp.cos(yy / 61.0)
        fy = 1.8 * jnp.cos(xx / 83.0) * jnp.sin(yy / 71.0)
        flow_s = jnp.broadcast_to(
            jnp.stack([fx, fy])[None], (B, 2, ht, wt)).astype(jnp.float32) + 0.0
        return r0, flow_s

    r0, flow_s = make()
    np.asarray(r0.ravel()[0:1])
    r1p = jax.jit(lambda r: pad_for_band(r, H, W, D_Y, D_X, BMAX, tw=tw))(r0)
    np.asarray(r1p.ravel()[0:1])
    hp, wp = r1p.shape[-2], r1p.shape[-1]

    bases = jnp.zeros((B * n_i * n_j,), jnp.int32)

    def run(level, name):
        kernel, band_h, band_w = make_kernel(level, hp, wp)

        @jax.jit
        def f(r0a, r1pa, fl):
            m = pl.pallas_call(
                functools.partial(kernel, n_i=n_i, n_j=n_j),
                out_shape=jax.ShapeDtypeStruct((B, 5, ht, wt), jnp.float32),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(B, n_i, n_j),
                    in_specs=[
                        pl.BlockSpec(
                            (1, 5, TH, TW), lambda bb, i, j, *r: (bb, 0, i, j),
                            memory_space=pltpu.VMEM,
                        ),
                        pl.BlockSpec(
                            (1, 2, TH, TW), lambda bb, i, j, *r: (bb, 0, i, j),
                            memory_space=pltpu.VMEM,
                        ),
                        pl.BlockSpec(memory_space=pl.ANY),
                    ],
                    out_specs=pl.BlockSpec(
                        (1, 5, TH, TW), lambda bb, i, j, *r: (bb, 0, i, j),
                        memory_space=pltpu.VMEM,
                    ),
                    scratch_shapes=[
                        pltpu.VMEM((2, 5, band_h, band_w), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                    ],
                ),
            )(bases, bases, r0a, fl, r1pa)
            return m.sum((2, 3))

        out = f(r0, r1p, flow_s)
        np.asarray(out.ravel()[0:1])
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = f(r0, r1p, flow_s)
        np.asarray(out.ravel()[0:1])
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:46s} {dt*1e3:8.2f} ms  ({dt/steps*1e6:6.2f} us/step x {steps})",
              flush=True)

    run(0, "L0 copy5 (pure grid/pipeline floor)")
    run(1, "L1 + band DMA")
    run(2, "L2 + full-band lane roll")
    run(3, "L3 + geometry/masks/reductions")
    run(4, "L4 + epilogue (no MAC loop)")


if __name__ == "__main__":
    main()
