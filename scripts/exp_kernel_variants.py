"""Throwaway experiments: which part of update_matrices_banded costs?

Variants of the warp kernel timed at the level-0/level-1 bench shapes
with realistic smooth flow:
  - baseline (current kernel)
  - s_cap: inner s loop shortened to 6 (simulating the smin-roll span
    optimization; numerics differ, timing is what matters here)
  - bf16 band MACs (accumulate f32)
  - uf box-tree: sliding-window sums via shift tree instead of 15 MACs
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from btcs_pnes_optical_flow_tpu.ops import farneback_pallas as fbp
from btcs_pnes_optical_flow_tpu.ops.farneback import _BORDER_SCALE

REPS = 4


def force(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def timed(name, fn, *args, n=1):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    force(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:46s} {dt*1e3:9.2f} ms")
    return dt


def smooth_flow(b, hk, wk, amp=3.0):
    yy, xx = np.mgrid[0:hk, 0:wk]
    fx = amp * np.sin(xx / 97.0 + 0.3) * np.cos(yy / 61.0)
    fy = amp * 0.6 * np.cos(xx / 83.0) * np.sin(yy / 71.0 + 1.0)
    f = np.stack([fx, fy], -1).astype(np.float32)
    return jnp.asarray(np.broadcast_to(f, (b, hk, wk, 2)).copy())


def make_um_variant(s_cap=None, bf16=False, t_all=False, TH=None, TW=None):
    """Parametrized copy of the banded kernel with variant knobs."""
    _TH = TH or fbp._TH
    _TW = TW or fbp._TW

    def _make_kernel(h, w, hp, wp, pad, d_max):
        r = d_max
        band_h = -(-(_TH + 2 * r + 2 + 7) // 8) * 8
        band_w = -(-(_TW + 2 * r + 2 + 127) // 128) * 128

        def kernel(by_ref, bx_ref, r0_ref, flow_ref, r1_ref, m_ref, band2, acc5, sem2, *, n_i, n_j):
            bb = pl.program_id(0)
            ti = pl.program_id(1)
            tj = pl.program_id(2)
            y0g = ti * _TH
            x0g = tj * _TW
            idx = (bb * n_i + ti) * n_j + tj
            total = pl.num_programs(0) * n_i * n_j

            def tile_geometry(flat_idx):
                tj_ = flat_idx % n_j
                rest = flat_idx // n_j
                ti_ = rest % n_i
                bb_ = rest // n_i
                row0_ = jnp.clip(ti_ * _TH + by_ref[flat_idx] - r + pad, 0, hp - band_h)
                col0_ = jnp.clip(tj_ * _TW + bx_ref[flat_idx] - r + pad, 0, wp - band_w)
                row0a_ = pl.multiple_of((row0_ // 8) * 8, 8)
                col0a_ = pl.multiple_of((col0_ // 128) * 128, 128)
                return bb_, row0_, col0_, row0a_, col0a_

            def band_dma(flat_idx, slot):
                bb_, _, _, row0a_, col0a_ = tile_geometry(flat_idx)
                return pltpu.make_async_copy(
                    r1_ref.at[bb_, :, pl.ds(row0a_, band_h), pl.ds(col0a_, band_w)],
                    band2.at[slot],
                    sem2.at[slot],
                )

            cur = idx % 2

            if mode != "nodma":
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
            if mode == "nodma":
                m_ref[0, 0] = band[0, :_TH, :_TW] + fx
                m_ref[0, 1] = band[1, :_TH, :_TW] + fy
                m_ref[0, 2] = band[2, :_TH, :_TW]
                m_ref[0, 3] = r0_ref[0, 3]
                m_ref[0, 4] = r0_ref[0, 4]
                return

            ii = jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 0) + y0g
            jj = jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 1) + x0g
            gx = jj.astype(jnp.float32) + fx
            gy = ii.astype(jnp.float32) + fy
            x1f = jnp.floor(gx)
            y1f = jnp.floor(gy)
            ax = gx - x1f
            ay = gy - y1f
            x1i = x1f.astype(jnp.int32)
            y1i = y1f.astype(jnp.int32)
            inside = (x1i >= 0) & (x1i < w - 1) & (y1i >= 0) & (y1i < h - 1)

            n_t = 2 * r + 2 + 7
            n_s_full = 2 * r + 2
            s_raw = x1i - jj + (x0g - (col0 - pad))
            t_idx = jnp.clip(y1i - ii + (y0g - (row0a - pad)), 0, n_t - 1)

            if s_cap is None:
                n_s = n_s_full
                roll_shift = -m_col
                s_idx = jnp.clip(s_raw, 0, n_s - 1)
            else:
                n_s = s_cap
                s_band = jnp.clip(s_raw, 0, n_s_full - 1)
                sm = jnp.clip(jnp.min(s_band), 0, n_s_full - s_cap)
                roll_shift = -(m_col + sm)
                s_idx = jnp.clip(s_band - sm, 0, n_s - 1)

            rolled = pltpu.roll(band.reshape(5 * band_h, band_w), shift=roll_shift, axis=1)
            if bf16:
                rolled = rolled.astype(jnp.bfloat16)
            bandv = [rolled[c * band_h : (c + 1) * band_h] for c in range(5)]

            tmin = jnp.min(t_idx)
            tmax = jnp.max(t_idx)
            acc5[...] = jnp.zeros((5, _TH, _TW), jnp.float32)
            wdt = jnp.bfloat16 if bf16 else jnp.float32
            wxs = []
            for sv in range(n_s):
                wx = jnp.where(s_idx == sv, 1.0 - ax, 0.0)
                if sv >= 1:
                    wx = wx + jnp.where(s_idx == sv - 1, ax, 0.0)
                wxs.append(wx.astype(wdt))
            for t in range(n_t):
                cond = (t >= 0) if t_all else ((t >= tmin) & (t <= tmax + 1))

                @pl.when(cond)
                def _(t=t):
                    wy = jnp.where(t_idx == t, 1.0 - ay, 0.0)
                    if t >= 1:
                        wy = wy + jnp.where(t_idx == t - 1, ay, 0.0)
                    inner = [jnp.zeros((_TH, _TW), wdt) for _ in range(5)]
                    for sv in range(n_s):
                        for c in range(5):
                            inner[c] = inner[c] + wxs[sv] * bandv[c][t : t + _TH, sv : sv + _TW]
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
            scale = fbp._border_scale_vec(ii, h) * fbp._border_scale_vec(jj, w)
            m_ref[0, 0] = (r4 * r4 + r6 * r6) * scale * scale
            m_ref[0, 1] = (r4 + r5) * r6 * scale * scale
            m_ref[0, 2] = (r5 * r5 + r6 * r6) * scale * scale
            m_ref[0, 3] = (r4 * r2 + r6 * r3) * scale * scale
            m_ref[0, 4] = (r6 * r2 + r5 * r3) * scale * scale

        return kernel, band_h, band_w

    @functools.partial(jax.jit, static_argnames=())
    def um(r0, r1, flow):
        d_max, base_max = 4, 56
        b, h, w, _ = r0.shape
        _THl, _TWl = _TH, _TW
        ht = -(-h // _THl) * _THl
        wt = -(-w // _TWl) * _TWl
        pad = base_max + d_max + 2
        r0t = jnp.moveaxis(r0, -1, 1)
        r1t = jnp.moveaxis(r1, -1, 1)
        ft = jnp.moveaxis(flow, -1, 1)
        r0p = jnp.pad(r0t, ((0, 0), (0, 0), (0, ht - h), (0, wt - w)), mode="edge")
        fp = jnp.pad(ft, ((0, 0), (0, 0), (0, ht - h), (0, wt - w)), mode="edge")
        band_h = -(-(_THl + 2 * d_max + 2 + 7) // 8) * 8
        band_w = -(-(_TWl + 2 * d_max + 2 + 127) // 128) * 128
        pad_bottom = (ht - h) + base_max - d_max + band_h - _THl + 2
        pad_right = (wt - w) + base_max - d_max + band_w - _TWl + 2
        r1p = jnp.pad(r1t, ((0, 0), (0, 0), (pad, pad_bottom), (pad, pad_right)), mode="edge")
        hp = h + pad + pad_bottom
        wp = w + pad + pad_right
        kernel, band_h, band_w = _make_kernel(h, w, hp, wp, pad, d_max)
        n_i = ht // _THl
        n_j = wt // _TWl
        ftiles = fp.reshape(b, 2, n_i, _THl, n_j, _TWl)
        bases = jnp.round(jnp.mean(ftiles, axis=(3, 5))).astype(jnp.int32)
        bases = jnp.clip(bases, -base_max, base_max)
        out = pl.pallas_call(
            functools.partial(kernel, n_i=n_i, n_j=n_j),
            out_shape=jax.ShapeDtypeStruct((b, 5, ht, wt), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(b, n_i, n_j),
                in_specs=[
                    pl.BlockSpec((1, 5, _THl, _TWl), lambda bb, i, j, *r: (bb, 0, i, j), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 2, _THl, _TWl), lambda bb, i, j, *r: (bb, 0, i, j), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((1, 5, _THl, _TWl), lambda bb, i, j, *r: (bb, 0, i, j), memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, 5, band_h, band_w), jnp.float32),
                    pltpu.VMEM((5, _THl, _TWl), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
        )(bases[:, 1].reshape(-1), bases[:, 0].reshape(-1), r0p, fp, r1p)
        return out.sum((1, 2, 3))  # reduce: avoid layout blowup at jit edge

    return um


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    for B, hk, wk in [(64, 480, 640), (256, 240, 320)]:
        print(f"--- shape B={B} {hk}x{wk} ---")
        r = jnp.asarray(rng.normal(size=(B, hk, wk, 5)).astype(np.float32))
        flow = smooth_flow(B, hk, wk)
        base = jax.jit(lambda a, b, f: fbp.update_matrices_banded(a, b, f).sum((1, 2, 3)))
        timed("um baseline", base, r, r, flow)
        timed("um variant (reimpl sanity)", make_um_variant(), r, r, flow)
        timed("um s_cap=6 (roll+span)", make_um_variant(s_cap=6), r, r, flow)
        timed("um s_cap=4", make_um_variant(s_cap=4), r, r, flow)
        timed("um bf16 MACs", make_um_variant(bf16=True), r, r, flow)
        timed("um bf16 + s_cap=6", make_um_variant(s_cap=6, bf16=True), r, r, flow)
        timed("um t-all (no predication)", make_um_variant(t_all=True), r, r, flow)


def main_tiles():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    for B, hk, wk in [(64, 480, 640), (256, 240, 320)]:
        print(f"--- shape B={B} {hk}x{wk} ---")
        r = jnp.asarray(rng.normal(size=(B, hk, wk, 5)).astype(np.float32))
        flow = smooth_flow(B, hk, wk)
        for TH, TW in [(16, 256), (32, 256), (64, 256), (32, 512), (64, 512)]:
            try:
                timed(f"um TH={TH} TW={TW}", make_um_variant(TH=TH, TW=TW), r, r, flow)
                timed(f"um TH={TH} TW={TW} cap6+bf16",
                      make_um_variant(s_cap=6, bf16=True, TH=TH, TW=TW), r, r, flow)
            except Exception as e:
                print(f"um TH={TH} TW={TW} failed: {type(e).__name__} {str(e)[:100]}")




def make_um_strip(mode, s_cap=None, bf16=False, TH=None, TW=None):
    """Strip-down variants to locate the fixed cost."""
    _TH = TH or fbp._TH
    _TW = TW or fbp._TW

    def _make_kernel(h, w, hp, wp, pad, d_max):
        r = d_max
        band_h = -(-(_TH + 2 * r + 2 + 7) // 8) * 8
        band_w = -(-(_TW + 2 * r + 2 + 127) // 128) * 128

        def kernel(by_ref, bx_ref, r0_ref, flow_ref, r1_ref, m_ref, band2, acc5, sem2, *, n_i, n_j):
            bb = pl.program_id(0)
            ti = pl.program_id(1)
            tj = pl.program_id(2)
            y0g = ti * _TH
            x0g = tj * _TW
            idx = (bb * n_i + ti) * n_j + tj
            total = pl.num_programs(0) * n_i * n_j

            def tile_geometry(flat_idx):
                tj_ = flat_idx % n_j
                rest = flat_idx // n_j
                ti_ = rest % n_i
                bb_ = rest // n_i
                row0_ = jnp.clip(ti_ * _TH + by_ref[flat_idx] - r + pad, 0, hp - band_h)
                col0_ = jnp.clip(tj_ * _TW + bx_ref[flat_idx] - r + pad, 0, wp - band_w)
                row0a_ = pl.multiple_of((row0_ // 8) * 8, 8)
                col0a_ = pl.multiple_of((col0_ // 128) * 128, 128)
                return bb_, row0_, col0_, row0a_, col0a_

            def band_dma(flat_idx, slot):
                bb_, _, _, row0a_, col0a_ = tile_geometry(flat_idx)
                return pltpu.make_async_copy(
                    r1_ref.at[bb_, :, pl.ds(row0a_, band_h), pl.ds(col0a_, band_w)],
                    band2.at[slot],
                    sem2.at[slot],
                )

            cur = idx % 2

            if mode != "nodma":
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
            if mode == "nodma":
                m_ref[0, 0] = band[0, :_TH, :_TW] + fx
                m_ref[0, 1] = band[1, :_TH, :_TW] + fy
                m_ref[0, 2] = band[2, :_TH, :_TW]
                m_ref[0, 3] = r0_ref[0, 3]
                m_ref[0, 4] = r0_ref[0, 4]
                return

            ii = jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 0) + y0g
            jj = jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 1) + x0g
            gx = jj.astype(jnp.float32) + fx
            gy = ii.astype(jnp.float32) + fy
            x1f = jnp.floor(gx)
            y1f = jnp.floor(gy)
            ax = gx - x1f
            ay = gy - y1f
            x1i = x1f.astype(jnp.int32)
            y1i = y1f.astype(jnp.int32)
            inside = (x1i >= 0) & (x1i < w - 1) & (y1i >= 0) & (y1i < h - 1)

            n_t = 2 * r + 2 + 7
            n_s_full = 2 * r + 2
            s_raw = x1i - jj + (x0g - (col0 - pad))
            t_idx = jnp.clip(y1i - ii + (y0g - (row0a - pad)), 0, n_t - 1)

            if s_cap is None:
                n_s = n_s_full
                roll_shift = -m_col
                s_idx = jnp.clip(s_raw, 0, n_s - 1)
            else:
                n_s = s_cap
                s_band = jnp.clip(s_raw, 0, n_s_full - 1)
                sm = jnp.clip(jnp.min(s_band), 0, n_s_full - s_cap)
                roll_shift = -(m_col + sm)
                s_idx = jnp.clip(s_band - sm, 0, n_s - 1)

            if mode == "noroll":
                roll_shift = 0
            if mode in ("empty_noroll", "empty_bare"):
                rolled = band.reshape(5 * band_h, band_w)
            else:
                rolled = pltpu.roll(band.reshape(5 * band_h, band_w), shift=roll_shift, axis=1)
            if bf16:
                rolled = rolled.astype(jnp.bfloat16)
            bandv = [rolled[c * band_h : (c + 1) * band_h] for c in range(5)]
            wdt = jnp.bfloat16 if bf16 else jnp.float32

            if mode == "empty_bare":
                # band still consumed (one add) so the DMA can't be DCE'd
                m_ref[0, 0] = bandv[0][:_TH, :_TW]
                m_ref[0, 1] = bandv[1][:_TH, :_TW]
                m_ref[0, 2] = bandv[2][:_TH, :_TW]
                m_ref[0, 3] = bandv[3][:_TH, :_TW]
                m_ref[0, 4] = bandv[4][:_TH, :_TW]
                return
            if mode in ("empty", "empty_noroll"):
                r2s = r3s = r4s = r5s = r6s = jnp.zeros((_TH, _TW), jnp.float32)
            elif mode == "reg":
                wxs = []
                for sv in range(n_s):
                    wx = jnp.where(s_idx == sv, 1.0 - ax, 0.0)
                    if sv >= 1:
                        wx = wx + jnp.where(s_idx == sv - 1, ax, 0.0)
                    wxs.append(wx.astype(wdt))
                regs = [jnp.zeros((_TH, _TW), jnp.float32) for _ in range(5)]
                for t in range(n_t):
                    wy = jnp.where(t_idx == t, 1.0 - ay, 0.0)
                    if t >= 1:
                        wy = wy + jnp.where(t_idx == t - 1, ay, 0.0)
                    inner = [jnp.zeros((_TH, _TW), wdt) for _ in range(5)]
                    for sv in range(n_s):
                        for c in range(5):
                            inner[c] = inner[c] + wxs[sv] * bandv[c][t : t + _TH, sv : sv + _TW]
                    for c in range(5):
                        regs[c] = regs[c] + wy * inner[c].astype(jnp.float32)
                r2s, r3s, r4s, r5s, r6s = regs
            else:
                tmin = jnp.min(t_idx)
                tmax = jnp.max(t_idx)
                if mode == "fixedrange":
                    tmin = jnp.full((), 6, jnp.int32)
                    tmax = jnp.full((), 9, jnp.int32)
                acc5[...] = jnp.zeros((5, _TH, _TW), jnp.float32)
                wxs = []
                for sv in range(n_s):
                    wx = jnp.where(s_idx == sv, 1.0 - ax, 0.0)
                    if sv >= 1:
                        wx = wx + jnp.where(s_idx == sv - 1, ax, 0.0)
                    wxs.append(wx.astype(wdt))
                for t in range(n_t):

                    @pl.when((t >= tmin) & (t <= tmax + 1))
                    def _(t=t):
                        wy = jnp.where(t_idx == t, 1.0 - ay, 0.0)
                        if t >= 1:
                            wy = wy + jnp.where(t_idx == t - 1, ay, 0.0)
                        inner = [jnp.zeros((_TH, _TW), wdt) for _ in range(5)]
                        for sv in range(n_s):
                            for c in range(5):
                                inner[c] = inner[c] + wxs[sv] * bandv[c][t : t + _TH, sv : sv + _TW]
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
            scale = fbp._border_scale_vec(ii, h) * fbp._border_scale_vec(jj, w)
            m_ref[0, 0] = (r4 * r4 + r6 * r6) * scale * scale
            m_ref[0, 1] = (r4 + r5) * r6 * scale * scale
            m_ref[0, 2] = (r5 * r5 + r6 * r6) * scale * scale
            m_ref[0, 3] = (r4 * r2 + r6 * r3) * scale * scale
            m_ref[0, 4] = (r6 * r2 + r5 * r3) * scale * scale

        return kernel, band_h, band_w

    def um_raw(r0, r1, flow):
        d_max, base_max = 4, 56
        b, h, w, _ = r0.shape
        ht = -(-h // _TH) * _TH
        wt = -(-w // _TW) * _TW
        pad = base_max + d_max + 2
        r0t = jnp.moveaxis(r0, -1, 1)
        r1t = jnp.moveaxis(r1, -1, 1)
        ft = jnp.moveaxis(flow, -1, 1)
        r0p = jnp.pad(r0t, ((0, 0), (0, 0), (0, ht - h), (0, wt - w)), mode="edge")
        fp = jnp.pad(ft, ((0, 0), (0, 0), (0, ht - h), (0, wt - w)), mode="edge")
        band_h = -(-(_TH + 2 * d_max + 2 + 7) // 8) * 8
        band_w = -(-(_TW + 2 * d_max + 2 + 127) // 128) * 128
        pad_bottom = (ht - h) + base_max - d_max + band_h - _TH + 2
        pad_right = (wt - w) + base_max - d_max + band_w - _TW + 2
        r1p = jnp.pad(r1t, ((0, 0), (0, 0), (pad, pad_bottom), (pad, pad_right)), mode="edge")
        hp = h + pad + pad_bottom
        wp = w + pad + pad_right
        kernel, band_h, band_w = _make_kernel(h, w, hp, wp, pad, d_max)
        n_i = ht // _TH
        n_j = wt // _TW
        ftiles = fp.reshape(b, 2, n_i, _TH, n_j, _TW)
        bases = jnp.round(jnp.mean(ftiles, axis=(3, 5))).astype(jnp.int32)
        bases = jnp.clip(bases, -base_max, base_max)
        out = pl.pallas_call(
            functools.partial(kernel, n_i=n_i, n_j=n_j),
            out_shape=jax.ShapeDtypeStruct((b, 5, ht, wt), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(b, n_i, n_j),
                in_specs=[
                    pl.BlockSpec((1, 5, _TH, _TW), lambda bb, i, j, *r: (bb, 0, i, j), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 2, _TH, _TW), lambda bb, i, j, *r: (bb, 0, i, j), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((1, 5, _TH, _TW), lambda bb, i, j, *r: (bb, 0, i, j), memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, 5, band_h, band_w), jnp.float32),
                    pltpu.VMEM((5, _TH, _TW), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
        )(bases[:, 1].reshape(-1), bases[:, 0].reshape(-1), r0p, fp, r1p)
        return jnp.moveaxis(out[:, :, :h, :w], 1, -1)

    um_raw.raw = um_raw

    @functools.partial(jax.jit, static_argnames=())
    def um(r0, r1, flow):
        return um_raw(r0, r1, flow).sum((1, 2, 3))

    um.raw = um_raw
    return um


def make_um_raw(mode="full", s_cap=None, bf16=False, TH=None, TW=None):
    """Raw-M (un-jitted, un-reduced) variant for in-program composition."""
    return make_um_strip(mode, s_cap=s_cap, bf16=bf16, TH=TH, TW=TW).raw


def main_strip():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    B, hk, wk = 64, 480, 640
    r = jnp.asarray(rng.normal(size=(B, hk, wk, 5)).astype(np.float32))
    flow = smooth_flow(B, hk, wk)
    for TH, TW in [(32, 256), (64, 256), (32, 640), (64, 640), (96, 640), (160, 640)]:
        try:
            n_steps = B * -(-hk // TH) * -(-wk // TW)
            timed(f"nodma TH={TH} TW={TW} steps={n_steps}", make_um_strip("nodma", TH=TH, TW=TW), r, r, flow)
        except Exception as e:
            print(f"nodma TH={TH} TW={TW} failed: {type(e).__name__} {str(e)[:90]}")
    for name, kw in [
        ("full", dict(mode="full")),
        ("empty (DMA+roll+final only)", dict(mode="empty")),
        ("empty_noroll (DMA+final only)", dict(mode="empty_noroll")),
        ("empty_bare (DMA+copyout only)", dict(mode="empty_bare")),
        ("nodma (grid+blockspec floor)", dict(mode="nodma")),
        ("noroll", dict(mode="noroll")),
        ("fixedrange (no min/max, 5 live t)", dict(mode="fixedrange")),
        ("reg t-all f32", dict(mode="reg")),
        ("reg t-all cap6 f32", dict(mode="reg", s_cap=6)),
        ("reg t-all cap6 bf16", dict(mode="reg", s_cap=6, bf16=True)),
        ("full cap6 bf16", dict(mode="full", s_cap=6, bf16=True)),
        ("fixedrange cap6 bf16", dict(mode="fixedrange", s_cap=6, bf16=True)),
    ]:
        try:
            timed(f"um {name}", make_um_strip(**kw), r, r, flow)
        except Exception as e:
            print(f"um {name} failed: {type(e).__name__} {str(e)[:100]}")


if __name__ == "__main__":
    import sys as _sys
    if len(_sys.argv) > 1 and _sys.argv[1] == "tiles":
        main_tiles()
    elif len(_sys.argv) > 1 and _sys.argv[1] == "strip":
        main_strip()
    else:
        main()


def _tree_slide(x, w, axis, want_off, want_len):
    """Sliding-window sums of length w along `axis` via a shift tree
    (log2(w) adds + popcount(w)-1 combines instead of w MACs).
    Returns the window sums starting at offsets want_off..want_off+want_len-1."""
    levels = [x]
    j = 1
    while (1 << j) <= w:
        prev = levels[-1]
        s = 1 << (j - 1)
        if axis == 0:
            levels.append(prev[: prev.shape[0] - s, :] + prev[s:, :])
        else:
            levels.append(prev[:, : prev.shape[1] - s] + prev[:, s:])
        j += 1
    out = None
    off = want_off
    for jj in reversed(range(len(levels))):
        if w & (1 << jj):
            lv = levels[jj]
            if axis == 0:
                part = lv[off : off + want_len, :]
            else:
                part = lv[:, off : off + want_len]
            out = part if out is None else out + part
            off += 1 << jj
    return out


def make_uf_tree(TH=None, TW=None):
    """update_flow_fused with tree-structured box sums (box window only)."""
    _TH_P = TH or fbp._TH_P
    _TW_P = TW or fbp._TW_P

    def _factory(winsize):
        half = winsize // 2
        band_h = _TH_P + 16
        band_w = _TW_P + 256
        row_off = 8 - half
        col_off = 128 - half

        def kernel(m_ref, out_ref, band2, sem2, *, n_i, n_j):
            bb = pl.program_id(0)
            ti = pl.program_id(1)
            tj = pl.program_id(2)
            idx = (bb * n_i + ti) * n_j + tj
            total = pl.num_programs(0) * n_i * n_j

            def band_dma(fi, slot):
                tj_ = fi % n_j
                rest = fi // n_j
                ti_ = rest % n_i
                bb_ = rest // n_i
                return pltpu.make_async_copy(
                    m_ref.at[bb_, :, pl.ds(ti_ * _TH_P, band_h), pl.ds(tj_ * _TW_P, band_w)],
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

            inv = 1.0 / (winsize * winsize)
            sums = []
            for c in range(5):
                v = _tree_slide(band[c], winsize, 0, row_off, _TH_P)
                hsum = _tree_slide(v, winsize, 1, col_off, _TW_P)
                sums.append(hsum * inv)

            g11, g12, g22, h1, h2 = sums
            idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
            out_ref[0, 0] = (g11 * h2 - g12 * h1) * idet
            out_ref[0, 1] = (g22 * h1 - g12 * h2) * idet

        return kernel, band_h, band_w

    def uf_raw(m, winsize, gaussian_win):
        assert not gaussian_win
        b, h, w, _ = m.shape
        ht = -(-h // _TH_P) * _TH_P
        wt = -(-w // _TW_P) * _TW_P
        mt = jnp.moveaxis(m, -1, 1)
        mp = jnp.pad(mt, ((0, 0), (0, 0), (8, 8 + ht - h), (128, 128 + wt - w)), mode="edge")
        kernel, band_h, band_w = _factory(winsize)
        n_i = ht // _TH_P
        n_j = wt // _TW_P
        out = pl.pallas_call(
            functools.partial(kernel, n_i=n_i, n_j=n_j),
            out_shape=jax.ShapeDtypeStruct((b, 2, ht, wt), jnp.float32),
            grid_spec=pl.GridSpec(
                grid=(b, n_i, n_j),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    (1, 2, _TH_P, _TW_P), lambda bb, i, j, *r: (bb, 0, i, j), memory_space=pltpu.VMEM
                ),
                scratch_shapes=[
                    pltpu.VMEM((2, 5, band_h, band_w), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
        )(mp)
        return jnp.moveaxis(out[:, :, :h, :w], 1, -1)

    return uf_raw


def make_um_floor2(variant):
    """Floor-attribution variants of the um kernel (nodma-style body):
    'prefetch'  — PrefetchScalarGridSpec, as production (baseline floor)
    'plain'     — plain GridSpec, bases via SMEM input
    'plain_dma' — plain GridSpec + the real double-buffered band DMA
    """
    _TH, _TW = fbp._TH, fbp._TW

    def _kernel_body(by_bx, r0_ref, flow_ref, r1_ref, m_ref, band2, sem2, *, n_i, n_j, do_dma, h, w, hp, wp, pad, d_max):
        r = d_max
        band_h = -(-(_TH + 2 * r + 2 + 7) // 8) * 8
        band_w = -(-(_TW + 2 * r + 2 + 127) // 128) * 128
        bb = pl.program_id(0)
        ti = pl.program_id(1)
        tj = pl.program_id(2)
        idx = (bb * n_i + ti) * n_j + tj
        total = pl.num_programs(0) * n_i * n_j

        if do_dma:
            by_ref, bx_ref = by_bx

            def tile_geometry(flat_idx):
                tj_ = flat_idx % n_j
                rest = flat_idx // n_j
                ti_ = rest % n_i
                bb_ = rest // n_i
                row0_ = jnp.clip(ti_ * _TH + by_ref[flat_idx] - r + pad, 0, hp - band_h)
                col0_ = jnp.clip(tj_ * _TW + bx_ref[flat_idx] - r + pad, 0, wp - band_w)
                row0a_ = pl.multiple_of((row0_ // 8) * 8, 8)
                col0a_ = pl.multiple_of((col0_ // 128) * 128, 128)
                return bb_, row0a_, col0a_

            def band_dma(flat_idx, slot):
                bb_, row0a_, col0a_ = tile_geometry(flat_idx)
                return pltpu.make_async_copy(
                    r1_ref.at[bb_, :, pl.ds(row0a_, band_h), pl.ds(col0a_, band_w)],
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
            m_ref[0, 0] = band[0, :_TH, :_TW] + flow_ref[0, 0]
            m_ref[0, 1] = band[1, :_TH, :_TW] + flow_ref[0, 1]
            m_ref[0, 2] = band[2, :_TH, :_TW]
            m_ref[0, 3] = r0_ref[0, 3]
            m_ref[0, 4] = r0_ref[0, 4]
        else:
            band = band2[0]
            m_ref[0, 0] = band[0, :_TH, :_TW] + flow_ref[0, 0]
            m_ref[0, 1] = band[1, :_TH, :_TW] + flow_ref[0, 1]
            m_ref[0, 2] = band[2, :_TH, :_TW]
            m_ref[0, 3] = r0_ref[0, 3]
            m_ref[0, 4] = r0_ref[0, 4]

    def um_raw(r0, r1, flow):
        d_max, base_max = 4, 56
        b, h, w, _ = r0.shape
        ht = -(-h // _TH) * _TH
        wt = -(-w // _TW) * _TW
        pad = base_max + d_max + 2
        r0t = jnp.moveaxis(r0, -1, 1)
        r1t = jnp.moveaxis(r1, -1, 1)
        ft = jnp.moveaxis(flow, -1, 1)
        r0p = jnp.pad(r0t, ((0, 0), (0, 0), (0, ht - h), (0, wt - w)), mode="edge")
        fp = jnp.pad(ft, ((0, 0), (0, 0), (0, ht - h), (0, wt - w)), mode="edge")
        band_h = -(-(_TH + 2 * d_max + 2 + 7) // 8) * 8
        band_w = -(-(_TW + 2 * d_max + 2 + 127) // 128) * 128
        pad_bottom = (ht - h) + base_max - d_max + band_h - _TH + 2
        pad_right = (wt - w) + base_max - d_max + band_w - _TW + 2
        r1p = jnp.pad(r1t, ((0, 0), (0, 0), (pad, pad_bottom), (pad, pad_right)), mode="edge")
        hp = h + pad + pad_bottom
        wp = w + pad + pad_right
        n_i = ht // _TH
        n_j = wt // _TW
        ftiles = fp.reshape(b, 2, n_i, _TH, n_j, _TW)
        bases = jnp.round(jnp.mean(ftiles, axis=(3, 5))).astype(jnp.int32)
        bases = jnp.clip(bases, -base_max, base_max)
        by = bases[:, 1].reshape(-1)
        bx = bases[:, 0].reshape(-1)

        do_dma = variant != "plain"
        body = functools.partial(
            _kernel_body, n_i=n_i, n_j=n_j, do_dma=do_dma, h=h, w=w, hp=hp, wp=wp, pad=pad, d_max=d_max
        )
        common_in = [
            pl.BlockSpec((1, 5, _TH, _TW), lambda bb, i, j, *r: (bb, 0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, _TH, _TW), lambda bb, i, j, *r: (bb, 0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        out_spec = pl.BlockSpec((1, 5, _TH, _TW), lambda bb, i, j, *r: (bb, 0, i, j), memory_space=pltpu.VMEM)
        scratch = [
            pltpu.VMEM((2, 5, band_h, band_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        if variant == "prefetch":
            def kern(by_ref, bx_ref, r0_ref, flow_ref, r1_ref, m_ref, band2, sem2):
                body((by_ref, bx_ref), r0_ref, flow_ref, r1_ref, m_ref, band2, sem2)

            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((b, 5, ht, wt), jnp.float32),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(b, n_i, n_j),
                    in_specs=common_in,
                    out_specs=out_spec,
                    scratch_shapes=scratch,
                ),
            )(by, bx, r0p, fp, r1p)
        else:
            def kern(by_ref, bx_ref, r0_ref, flow_ref, r1_ref, m_ref, band2, sem2):
                body((by_ref, bx_ref), r0_ref, flow_ref, r1_ref, m_ref, band2, sem2)

            smem = pl.BlockSpec(memory_space=pltpu.SMEM)
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((b, 5, ht, wt), jnp.float32),
                grid=(b, n_i, n_j),
                in_specs=[smem, smem] + common_in,
                out_specs=out_spec,
                scratch_shapes=scratch,
            )(by, bx, r0p, fp, r1p)
        return jnp.moveaxis(out[:, :, :h, :w], 1, -1)

    return um_raw


def make_um_floor3(variant):
    """Window-traffic hypothesis tests (nodma body, plain grid):
    'bf16'   — r0/flow/M blocks in bf16 (half the window bytes)
    'batch8' — block (8,5,TH,TW): 8x fewer grid steps, same bytes
    'noout'  — output block shrunk to (1,5,8,128) (write ~1/8 of M)
    'noin'   — r0/flow via ANY (no input windows), full M out
    """
    _TH, _TW = fbp._TH, fbp._TW

    def um_raw(r0, r1, flow):
        b, h, w, _ = r0.shape
        ht = -(-h // _TH) * _TH
        wt = -(-w // _TW) * _TW
        r0t = jnp.moveaxis(r0, -1, 1)
        ft = jnp.moveaxis(flow, -1, 1)
        r0p = jnp.pad(r0t, ((0, 0), (0, 0), (0, ht - h), (0, wt - w)), mode="edge")
        fp = jnp.pad(ft, ((0, 0), (0, 0), (0, ht - h), (0, wt - w)), mode="edge")
        dt = jnp.bfloat16 if variant == "bf16" else jnp.float32
        r0p = r0p.astype(dt)
        fp = fp.astype(dt)
        n_i = ht // _TH
        n_j = wt // _TW

        if variant == "batch8":
            bblk = 8
            grid = (b // bblk, n_i, n_j)
        else:
            bblk = 1
            grid = (b, n_i, n_j)

        if variant == "noout":
            oshape = (b, 5, ht // 4, wt // 2)
            ospec = pl.BlockSpec((1, 5, _TH // 4, _TW // 2), lambda bb, i, j: (bb, 0, i, j), memory_space=pltpu.VMEM)
        else:
            oshape = (b // bblk * bblk, 5, ht, wt)
            ospec = pl.BlockSpec((bblk, 5, _TH, _TW), lambda bb, i, j: (bb, 0, i, j), memory_space=pltpu.VMEM)

        if variant == "noin":
            in_specs = [pl.BlockSpec(memory_space=pl.ANY), pl.BlockSpec(memory_space=pl.ANY)]
        else:
            in_specs = [
                pl.BlockSpec((bblk, 5, _TH, _TW), lambda bb, i, j: (bb, 0, i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((bblk, 2, _TH, _TW), lambda bb, i, j: (bb, 0, i, j), memory_space=pltpu.VMEM),
            ]

        def kern(r0_ref, f_ref, m_ref):
            if variant == "noin":
                z = jnp.zeros((m_ref.shape[-2], m_ref.shape[-1]), jnp.float32)
                for c in range(5):
                    m_ref[0, c] = z
            elif variant == "noout":
                for c in range(5):
                    m_ref[0, c] = (
                        r0_ref[0, c, : _TH // 4, : _TW // 2].astype(jnp.float32)
                        + f_ref[0, 0, : _TH // 4, : _TW // 2].astype(jnp.float32)
                    )
            else:
                for c in range(5):
                    for bb in range(bblk):
                        m_ref[bb, c] = r0_ref[bb, c].astype(jnp.float32) + f_ref[bb, 0].astype(jnp.float32)

        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
            grid=grid,
            in_specs=in_specs,
            out_specs=ospec,
        )(r0p, fp)
        if variant == "noout":
            out = jnp.pad(out, ((0, 0), (0, 0), (0, ht - out.shape[2]), (0, wt - out.shape[3])))
        return jnp.moveaxis(out[:, :, :h, :w], 1, -1)

    return um_raw
