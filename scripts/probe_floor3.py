"""Decompose the warp kernel's ~3 us/step zero-flow floor at L0.

Round-3/4 eliminations: slot structure (s_cap=1: -3%), band bytes
(d_y=1: -6%), DMA depth (4 slots: +0%), tile height (th=64: 2.8x
SLOWER), tile width (tw=640: 4x SLOWER — register spills, see
scripts/probe_geometry.py).  Remaining suspects, each nulled by a
kernel-clone variant here:

- R: the 8 full-tile cross-lane reductions (smin, tmin, tmax, smin_b,
  smax, n_clip, rmdy, rmdx).  Variant moves them OUT of the kernel into
  an XLA segment-reduce over the flow field (per-tile scalars arrive
  via scalar prefetch, clip outputs leave the kernel entirely) — the
  XLA precompute runs INSIDE the timed jit, so the comparison is
  honest end to end.
- L: the full-band dynamic lane roll (diagnostic shift=0 — wrong
  values, timing only).
- D: the per-tile band DMA (diagnostic skip — garbage values).

Run ALONE on the real TPU:  python -m scripts.probe_floor3
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
    update_matrices_banded_cf,
    warp_grid,
)

B = 256
H, W = 480, 640
REPS = 4


def _border_scale_vec(pos, size):
    s = jnp.ones_like(pos, jnp.float32)
    for i, v in enumerate(_BORDER_SCALE):
        s = jnp.where(pos == i, s * v, s)
        s = jnp.where(pos == size - 1 - i, s * v, s)
    return s


def make_variant_kernel(
    h, w, hp, wp, pad_y, pad_x, d_max_y, d_max_x, s_cap,
    th, tw, do_roll=True, do_dma=True,
):
    """_make_kernel clone with anchors via scalar prefetch and no
    in-kernel reductions / clip outputs."""
    band_h, band_w = _band_dims(d_max_y, d_max_x, th, tw)
    n_t = 2 * d_max_y + 2 + 7
    n_s_full = 2 * d_max_x + 2
    n_s = min(s_cap, n_s_full) if s_cap else n_s_full
    _SB = 4
    assert band_w >= tw + 127 + n_s_full
    wdt = jnp.bfloat16

    def kernel(
        by_ref, bx_ref, smin_ref, tmin_ref, tmax_ref, sminb_ref, smax_ref,
        r0_ref, flow_ref, r1_ref,
        m_ref,
        band2, acc5, sem2, *, n_i, n_j,
    ):
        bb = pl.program_id(0)
        ti = pl.program_id(1)
        tj = pl.program_id(2)
        y0g = ti * th
        x0g = tj * tw
        idx = (bb * n_i + ti) * n_j + tj
        total = pl.num_programs(0) * n_i * n_j

        def tile_geometry(flat_idx):
            tj_ = flat_idx % n_j
            rest = flat_idx // n_j
            ti_ = rest % n_i
            bb_ = rest // n_i
            row0_ = jnp.clip(ti_ * th + by_ref[flat_idx] - d_max_y + pad_y, 0, hp - band_h)
            col0_ = jnp.clip(tj_ * tw + bx_ref[flat_idx] - d_max_x + pad_x, 0, wp - band_w)
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
        if do_dma:
            @pl.when(idx == 0)
            def _():
                band_dma(idx, cur).start()

            @pl.when(idx + 1 < total)
            def _():
                band_dma(idx + 1, (idx + 1) % 2).start()

            band_dma(idx, cur).wait()

        fx = flow_ref[0, 0]
        fy = flow_ref[0, 1]
        _, row0, col0, row0a, col0a = tile_geometry(idx)
        m_col = col0 - col0a
        band = band2[cur]

        ii = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + y0g
        jj = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + x0g
        gx = jj.astype(jnp.float32) + fx
        gy = ii.astype(jnp.float32) + fy
        x1f = jnp.floor(gx)
        y1f = jnp.floor(gy)
        ax = gx - x1f
        ay = gy - y1f
        x1i = x1f.astype(jnp.int32)
        y1i = y1f.astype(jnp.int32)
        inside = (x1i >= 0) & (x1i < w - 1) & (y1i >= 0) & (y1i < h - 1)

        t_raw = y1i - ii + (y0g - (row0a - pad_y))
        t_idx = jnp.clip(t_raw, 0, n_t - 1)
        s_raw = x1i - jj + (x0g - (col0 - pad_x))
        s_full = jnp.clip(s_raw, 0, n_s_full - 1)
        smin = smin_ref[idx]
        roll_shift = -(m_col + smin)
        s_idx = jnp.clip(s_full - smin, 0, n_s - 1)

        tmin = tmin_ref[idx]
        tmax = tmax_ref[idx]
        smin_b = sminb_ref[idx]
        smax = smax_ref[idx]

        if do_roll:
            rolled = pltpu.roll(
                band.reshape(5 * band_h, band_w), shift=roll_shift, axis=1
            )
        else:
            rolled = band.reshape(5 * band_h, band_w)
        rolled = rolled.astype(jnp.bfloat16)
        bandv = [rolled[c * band_h : (c + 1) * band_h] for c in range(5)]

        acc5[...] = jnp.zeros((5, th, tw), jnp.float32)
        axw = ax.astype(wdt)
        one_m_axw = (1.0 - ax).astype(wdt)
        for t in range(n_t + 1):

            @pl.when((t >= tmin) & (t <= tmax + 1))
            def _(t=t):
                wy = jnp.where(t_idx == t, 1.0 - ay, 0.0) if t < n_t else (
                    jnp.zeros((th, tw), jnp.float32)
                )
                if t >= 1:
                    wy = wy + jnp.where(t_idx == t - 1, ay, 0.0)
                for sb in range(0, n_s + 1, _SB):

                    @pl.when((sb <= smax + 1) & (smin_b < sb + _SB))
                    def _(t=t, sb=sb):
                        inner = [jnp.zeros((th, tw), wdt) for _ in range(5)]
                        for sv in range(sb, min(sb + _SB, n_s + 1)):
                            wx = (
                                jnp.where(s_idx == sv, one_m_axw, jnp.zeros((), wdt))
                                if sv < n_s
                                else jnp.zeros((th, tw), wdt)
                            )
                            if sv >= 1:
                                wx = wx + jnp.where(s_idx == sv - 1, axw, jnp.zeros((), wdt))
                            for c in range(5):
                                inner[c] = inner[c] + wx * bandv[c][t : t + th, sv : sv + tw]
                        for c in range(5):
                            acc5[c] += wy * inner[c].astype(jnp.float32)

        r2s = acc5[0]
        r3s = acc5[1]
        r4s = acc5[2]
        r5s = acc5[3]
        r6s = acc5[4]
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


def precompute_anchors(flow_cf, h, w, d_max_y, d_max_x, base_max, s_cap,
                       th, tw, hp, wp):
    """XLA-side per-tile anchor/guard scalars (the candidate design)."""
    b = flow_cf.shape[0]
    ht = -(-h // th) * th
    wt = -(-w // tw) * tw
    n_i, n_j = ht // th, wt // tw
    pad_y = base_max + d_max_y + 2
    pad_x = base_max + d_max_x + 2
    band_h, band_w = _band_dims(d_max_y, d_max_x, th, tw)
    n_t = 2 * d_max_y + 2 + 7
    n_s_full = 2 * d_max_x + 2
    n_s = min(s_cap, n_s_full) if s_cap else n_s_full

    f = flow_cf[:, :, :ht, :wt].reshape(b, 2, n_i, th, n_j, tw)
    bases = jnp.round(jnp.mean(f, axis=(3, 5))).astype(jnp.int32)
    bases = jnp.clip(bases, -base_max, base_max)  # (b, 2, n_i, n_j)
    by = bases[:, 1]
    bx = bases[:, 0]

    ii = jax.lax.broadcasted_iota(jnp.int32, (ht, wt), 0)[None]
    jj = jax.lax.broadcasted_iota(jnp.int32, (ht, wt), 1)[None]
    fx = flow_cf[:, 0, :ht, :wt]
    fy = flow_cf[:, 1, :ht, :wt]
    x1i = jnp.floor(jj + fx).astype(jnp.int32)
    y1i = jnp.floor(ii + fy).astype(jnp.int32)
    inside = (x1i >= 0) & (x1i < w - 1) & (y1i >= 0) & (y1i < h - 1)
    live = inside & (ii < h) & (jj < w)

    y0g = (jnp.arange(n_i) * th)[:, None]
    row0 = jnp.clip(y0g + by - d_max_y + pad_y, 0, hp - band_h)  # (b, n_i, n_j)? by is (b,n_i,n_j)
    row0a = (row0 // 8) * 8
    x0g = (jnp.arange(n_j) * tw)[None, :]
    col0 = jnp.clip(x0g + bx - d_max_x + pad_x, 0, wp - band_w)

    def tile_view(x):
        return x.reshape(b, n_i, th, n_j, tw)

    dev_y = tile_view(y1i - ii)
    dev_x = tile_view(x1i - jj)
    livev = tile_view(live)
    y0g_off = (jnp.arange(n_i) * th)[None, :, None, None, None]
    t_raw = dev_y + (y0g_off - (row0a[:, :, None, :, None] - pad_y))
    t_idx = jnp.clip(t_raw, 0, n_t - 1)
    x0g_off = (jnp.arange(n_j) * tw)[None, None, None, :, None]
    s_raw = dev_x + (x0g_off - (col0[:, :, None, :, None] - pad_x))
    s_full = jnp.clip(s_raw, 0, n_s_full - 1)
    smin = jnp.min(jnp.where(livev, s_full, n_s_full - 1), axis=(2, 4))
    smin = jnp.clip(smin, 0, max(n_s_full - n_s, 0))
    s_idx = jnp.clip(s_full - smin[:, :, None, :, None], 0, n_s - 1)
    tmin = jnp.min(jnp.where(livev, t_idx, n_t - 1), axis=(2, 4))
    tmax = jnp.max(jnp.where(livev, t_idx, -1), axis=(2, 4))
    smin_b = jnp.min(jnp.where(livev, s_idx, n_s - 1), axis=(2, 4))
    smax = jnp.max(jnp.where(livev, s_idx, 0), axis=(2, 4))

    s_over = (s_raw != s_full) | (s_full - smin[:, :, None, :, None] != s_idx)
    missed = livev & ((t_raw != t_idx) | s_over)
    n_clip = jnp.sum(missed, axis=(2, 4), dtype=jnp.int32)
    big = jnp.int32(1 << 20)
    rmdy = jnp.min(jnp.where(missed, dev_y, big), axis=(2, 4))
    rmdx = jnp.min(jnp.where(missed, dev_x, big), axis=(2, 4))

    flat = lambda x: x.reshape(-1).astype(jnp.int32)
    return (
        flat(by), flat(bx), flat(smin), flat(tmin), flat(tmax),
        flat(smin_b), flat(smax), n_clip, rmdy, rmdx,
    )


def run_variant(name, r0, flow, r1p, do_roll, do_dma, steps):
    h, w = H, W
    th = 32
    ht, wt, tw = warp_grid(h, w)
    d_y, d_x, cap, bmax = 8, 16, 14, 56
    pad_y = bmax + d_y + 2
    pad_x = bmax + d_x + 2
    hp, wp = r1p.shape[-2], r1p.shape[-1]
    kernel, band_h, band_w = make_variant_kernel(
        h, w, hp, wp, pad_y, pad_x, d_y, d_x, cap, th, tw,
        do_roll=do_roll, do_dma=do_dma,
    )
    n_i, n_j = ht // th, wt // tw
    b = flow.shape[0]

    @jax.jit
    def f(r0a, r1pa, fl):
        by, bx, smin, tmin, tmax, sminb, smax, n_clip, rmdy, rmdx = (
            precompute_anchors(fl, h, w, d_y, d_x, bmax, cap, th, tw, hp, wp)
        )
        m = pl.pallas_call(
            functools.partial(kernel, n_i=n_i, n_j=n_j),
            out_shape=jax.ShapeDtypeStruct((b, 5, ht, wt), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=7,
                grid=(b, n_i, n_j),
                in_specs=[
                    pl.BlockSpec(
                        (1, 5, th, tw), lambda bb, i, j, *r: (bb, 0, i, j),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 2, th, tw), lambda bb, i, j, *r: (bb, 0, i, j),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (1, 5, th, tw), lambda bb, i, j, *r: (bb, 0, i, j),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((2, 5, band_h, band_w), jnp.float32),
                    pltpu.VMEM((5, th, tw), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
        )(by, bx, smin, tmin, tmax, sminb, smax, r0a, fl, r1pa)
        return m.sum((2, 3)), n_clip.sum()

    def force(x):
        return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])

    out = f(r0, r1p, flow)
    force(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(r0, r1p, flow)
    force(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:46s} {dt*1e3:8.2f} ms  ({dt/steps*1e6:6.2f} us/step x {steps})",
          flush=True)
    return dt


def main():
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    ht, wt, tw = warp_grid(H, W)
    n_i, n_j = ht // 32, wt // tw
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
    flow_0 = jnp.zeros((B, 2, ht, wt), jnp.float32)
    r1p = jax.jit(lambda r: pad_for_band(r, H, W, 8, 16, 56, tw=tw))(r0)
    np.asarray(r1p.ravel()[0:1])

    # Production baseline (in-kernel reductions).
    @jax.jit
    def base(r0a, r1pa, fl):
        m, clip, _ = update_matrices_banded_cf(
            r0a, fl, r1pa, H, W, d_max_y=8, d_max_x=16,
            base_max=56, s_cap=14, precision="bf16", r1_offset=1, tw=tw)
        return m.sum((2, 3)), clip.sum()

    def force(x):
        return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])

    out = base(r0, r1p, flow_s)
    force(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = base(r0, r1p, flow_s)
    force(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{'baseline prod smooth':46s} {dt*1e3:8.2f} ms  ({dt/steps*1e6:6.2f} us/step x {steps})", flush=True)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = base(r0, r1p, flow_0)
    force(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{'baseline prod zero':46s} {dt*1e3:8.2f} ms  ({dt/steps*1e6:6.2f} us/step x {steps})", flush=True)

    run_variant("xla-anchors smooth", r0, flow_s, r1p, True, True, steps)
    run_variant("xla-anchors zero", r0, flow_0, r1p, True, True, steps)
    run_variant("xla-anchors no-roll zero (diag)", r0, flow_0, r1p, False, True, steps)
    run_variant("xla-anchors no-dma zero (diag)", r0, flow_0, r1p, True, False, steps)


if __name__ == "__main__":
    main()
