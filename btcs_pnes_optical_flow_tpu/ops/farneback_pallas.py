"""Pallas TPU kernels for the Farnebäck hot path.

The profiling story (see bench.py / SURVEY.md §6): the XLA version of
the flow stack is dominated >80% by ``update_matrices`` — its bilinear
warp is a general gather, and TPU general gathers cost ~20ns *per
index* regardless of payload.  TPUs have no fast random gather; the
TPU-native formulation is a **banded warp**:

- tile the image into (TH, TW) blocks (grid over batch × tiles);
- per tile, estimate an integer base displacement (mean flow, rounded)
  and DMA only the corresponding (TH+2R, TW+2R) band of the warped-from
  coefficient planes HBM→VMEM;
- per pixel, the residual displacement relative to the base is small;
  bilinear sampling becomes a sum over (2R+2)² *statically shifted*
  band slices weighted by per-pixel one-hot bilinear weights — pure
  VPU select/multiply-accumulate, no gather;
- the whole normal-equation assembly (averaged A, Δb folding, border
  damping, G/h products) is fused into the same kernel, so the five M
  planes are written once and the sampled coefficients never touch HBM.

Pixels whose true displacement deviates from the tile base by more than
``d_max`` are clamped to the nearest reachable sample (they also get
reported via the ``clip_count`` output).  For clinically realistic
motion the deviation within a 32×256 tile is far below the default
d_max; the differential tests quantify the EPE impact.  The exact
gather-based path (ops/farneback.py) remains available as
``warp_engine="exact"``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from btcs_pnes_optical_flow_tpu.ops.farneback import _BORDER_SCALE

_TH = 32
_TW = 256
# Larger tiles for the halo-static kernels (poly expansion, window
# solve) amortize the per-grid-step overhead; the warp kernel keeps
# smaller tiles to fit its double-buffered bands in VMEM.
_TH_P = 64
_TW_P = 512


def _border_scale_vec(pos, size):
    """Rim damping factor for a vector of global coordinates."""
    s = jnp.ones_like(pos, jnp.float32)
    for i, v in enumerate(_BORDER_SCALE):
        s = jnp.where(pos == i, s * v, s)
        s = jnp.where(pos == size - 1 - i, s * v, s)
    return s


def _make_kernel(h: int, w: int, hp: int, wp: int, pad: int, d_max: int):
    """Build the fused warp+update kernel for static shapes.

    h, w: true image size.  hp, wp: padded size of r1 (pad on each side
    of both axes).  The flow/r0/M arrays use the tile-padded true grid.
    """
    r = d_max
    # Mosaic requires DMA slice shapes *and* start offsets aligned to
    # the (8, 128) VMEM tiling.  The band is over-sized to absorb both
    # the alignment slack (7 rows / 127 cols) and the window halo; the
    # unaligned remainder is corrected with dynamic rolls after the
    # copy (tpu.dynamic_rotate is cheap VPU data movement).
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

        # Double-buffered band pipeline: tile idx computes from slot
        # idx%2 while tile idx+1's band streams into the other slot.
        cur = idx % 2

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

        # Lane alignment (0..127) is corrected with a single dynamic
        # lane roll over the channel-stacked band (verified exact; 2D
        # lane rolls are the only dynamic rolls Mosaic compiles
        # correctly — sublane and 3D rolls miscompile).  The 0..7-row
        # alignment slack is absorbed into the vertical candidate range.
        rolled = pltpu.roll(band.reshape(5 * band_h, band_w), shift=-m_col, axis=1)
        bandv = [rolled[c * band_h : (c + 1) * band_h] for c in range(5)]

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

        # Band-relative candidate indices.  Rows are relative to the
        # *aligned* start (m_row slack widens the range to 0..2r+8);
        # columns are relative to the rolled (exact) start: 0..2r+1.
        n_t = 2 * r + 2 + 7
        n_s = 2 * r + 2
        t_idx = jnp.clip(y1i - ii + (y0g - (row0a - pad)), 0, n_t - 1)
        s_idx = jnp.clip(x1i - jj + (x0g - (col0 - pad)), 0, n_s - 1)

        # Sparse predicated accumulation: a tile's pixels only ever hit
        # candidates in [min(t_idx), max(t_idx)+1] × [min(s_idx),
        # max(s_idx)+1] (typically ~3×3 of the full 17×10 static
        # window), so each (t, s) term is guarded by a *scalar* pl.when
        # — skipped terms cost a branch, not 5 vector MACs.
        tmin = jnp.min(t_idx)
        tmax = jnp.max(t_idx)
        smin = jnp.min(s_idx)
        smax = jnp.max(s_idx)
        acc5[...] = jnp.zeros((5, _TH, _TW), jnp.float32)
        # Horizontal one-hot weights are shared across t; hoist them.
        wxs = []
        for sv in range(n_s):
            wx = jnp.where(s_idx == sv, 1.0 - ax, 0.0)
            if sv >= 1:
                wx = wx + jnp.where(s_idx == sv - 1, ax, 0.0)
            wxs.append(wx)
        for t in range(n_t):

            @pl.when((t >= tmin) & (t <= tmax + 1))
            def _(t=t):
                wy = jnp.where(t_idx == t, 1.0 - ay, 0.0)
                if t >= 1:
                    wy = wy + jnp.where(t_idx == t - 1, ay, 0.0)
                # Register-accumulated inner loop over the (small) live
                # horizontal range; one VMEM RMW per (t, channel).
                inner = [jnp.zeros((_TH, _TW), jnp.float32) for _ in range(5)]
                for sv in range(n_s):
                    for c in range(5):
                        inner[c] = inner[c] + wxs[sv] * bandv[c][t : t + _TH, sv : sv + _TW]
                for c in range(5):
                    acc5[c] += wy * inner[c]

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
        dx = fx
        dy = fy
        r2 = r2 + r4 * dy + r6 * dx
        r3 = r3 + r6 * dy + r5 * dx

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


@functools.partial(jax.jit, static_argnames=("d_max", "base_max", "interpret"))
def update_matrices_banded(
    r0: jnp.ndarray,
    r1: jnp.ndarray,
    flow: jnp.ndarray,
    d_max: int = 4,
    base_max: int = 56,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused banded warp + normal-equation update (Pallas).

    r0, r1: (B, H, W, 5) polynomial expansions; flow: (B, H, W, 2).
    Returns M (B, H, W, 5).  Matches ops.farneback.update_matrices up
    to the banded-warp approximation (exact whenever each pixel's
    displacement is within ``d_max`` of its tile's mean displacement,
    and |mean| <= base_max).
    """
    b, h, w, _ = r0.shape
    ht = -(-h // _TH) * _TH
    wt = -(-w // _TW) * _TW
    pad = base_max + d_max + 2

    r0t = jnp.moveaxis(r0, -1, 1)  # (B,5,H,W)
    r1t = jnp.moveaxis(r1, -1, 1)
    ft = jnp.moveaxis(flow, -1, 1)

    # Tile-pad the true-grid arrays (edge mode keeps values finite).
    r0p = jnp.pad(r0t, ((0, 0), (0, 0), (0, ht - h), (0, wt - w)), mode="edge")
    fp = jnp.pad(ft, ((0, 0), (0, 0), (0, ht - h), (0, wt - w)), mode="edge")
    # Pad r1 so every band DMA start and extent stays in bounds:
    # top/left cover base displacements down to -base_max; bottom/right
    # additionally cover the aligned band extent past the last tile.
    band_h = -(-(_TH + 2 * d_max + 2 + 7) // 8) * 8
    band_w = -(-(_TW + 2 * d_max + 2 + 127) // 128) * 128
    pad_bottom = (ht - h) + base_max - d_max + band_h - _TH + 2
    pad_right = (wt - w) + base_max - d_max + band_w - _TW + 2
    r1p = jnp.pad(
        r1t,
        ((0, 0), (0, 0), (pad, pad_bottom), (pad, pad_right)),
        mode="edge",
    )
    hp = h + pad + pad_bottom
    wp = w + pad + pad_right

    kernel, band_h, band_w = _make_kernel(h, w, hp, wp, pad, d_max)
    n_i = ht // _TH
    n_j = wt // _TW

    # Per-tile integer base displacements, precomputed so the kernel's
    # double-buffered pipeline can start tile t+1's band DMA during
    # tile t's compute (bases arrive via scalar prefetch).
    ftiles = fp.reshape(b, 2, n_i, _TH, n_j, _TW)
    bases = jnp.round(jnp.mean(ftiles, axis=(3, 5))).astype(jnp.int32)
    bases = jnp.clip(bases, -base_max, base_max)
    bx_flat = bases[:, 0].reshape(-1)
    by_flat = bases[:, 1].reshape(-1)

    out = pl.pallas_call(
        functools.partial(kernel, n_i=n_i, n_j=n_j),
        out_shape=jax.ShapeDtypeStruct((b, 5, ht, wt), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, n_i, n_j),
            in_specs=[
                pl.BlockSpec(
                    (1, 5, _TH, _TW),
                    lambda bb, i, j, *refs: (bb, 0, i, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 2, _TH, _TW),
                    lambda bb, i, j, *refs: (bb, 0, i, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),  # full r1, DMA'd per tile
            ],
            out_specs=pl.BlockSpec(
                (1, 5, _TH, _TW),
                lambda bb, i, j, *refs: (bb, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 5, band_h, band_w), jnp.float32),
                pltpu.VMEM((5, _TH, _TW), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
    )(by_flat, bx_flat, r0p, fp, r1p)

    return jnp.moveaxis(out[:, :, :h, :w], 1, -1)


# ---------------------------------------------------------------------------
# Fused polynomial expansion
# ---------------------------------------------------------------------------


def _poly_kernel_factory(g, xg, xxg, igs, n: int):
    """Build the fused poly-expansion kernel (static taps/Gram factors).

    One band DMA per tile (static, aligned offsets thanks to host
    padding), then the separable Gaussian-weighted correlations run as
    statically shifted vector MACs entirely in VMEM — the five
    coefficient planes are produced in a single pass over the image
    instead of nine XLA convolutions with materialized intermediates.
    """
    ig11, ig03, ig33, ig55 = (float(v) for v in igs)
    gl = [float(v) for v in g]
    xgl = [float(v) for v in xg]
    xxgl = [float(v) for v in xxg]
    band_h = _TH_P + 16
    band_w = _TW_P + 256
    row_off = 8 - n   # first tap row inside the band
    col_off = 128 - n

    def kernel(img_ref, out_ref, band2, sem2, *, n_i, n_j):
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
                img_ref.at[bb_, pl.ds(ti_ * _TH_P, band_h), pl.ds(tj_ * _TW_P, band_w)],
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

        # Vertical pass over the full band width.
        t0 = None
        t1 = None
        t2 = None
        for k in range(2 * n + 1):
            sl = band[row_off + k : row_off + k + _TH_P, :]
            t0 = sl * gl[k] if t0 is None else t0 + sl * gl[k]
            t1 = sl * xgl[k] if t1 is None else t1 + sl * xgl[k]
            t2 = sl * xxgl[k] if t2 is None else t2 + sl * xxgl[k]

        # Horizontal pass on the tile columns.
        b1 = b2 = b3 = b4 = b5 = b6 = None
        for k in range(2 * n + 1):
            c = col_off + k
            s0 = t0[:, c : c + _TW_P]
            s1 = t1[:, c : c + _TW_P]
            s2 = t2[:, c : c + _TW_P]
            b1 = s0 * gl[k] if b1 is None else b1 + s0 * gl[k]
            b2 = s0 * xgl[k] if b2 is None else b2 + s0 * xgl[k]
            b4 = s0 * xxgl[k] if b4 is None else b4 + s0 * xxgl[k]
            b3 = s1 * gl[k] if b3 is None else b3 + s1 * gl[k]
            b6 = s1 * xgl[k] if b6 is None else b6 + s1 * xgl[k]
            b5 = s2 * gl[k] if b5 is None else b5 + s2 * gl[k]

        out_ref[0, 0] = b3 * ig11
        out_ref[0, 1] = b2 * ig11
        out_ref[0, 2] = b1 * ig03 + b5 * ig33
        out_ref[0, 3] = b1 * ig03 + b4 * ig33
        out_ref[0, 4] = b6 * ig55

    return kernel, band_h, band_w


@functools.partial(jax.jit, static_argnames=("n", "sigma", "interpret"))
def poly_exp_fused(
    img: jnp.ndarray, n: int = 5, sigma: float = 1.2, interpret: bool = False
) -> jnp.ndarray:
    """Fused Pallas polynomial expansion: (B, H, W) → (B, H, W, 5).

    Matches ops.farneback.poly_exp (replicate borders) to fp precision.
    """
    from btcs_pnes_optical_flow_tpu.ops.farneback import _poly_exp_tables

    if n > 8:
        # The band layout hard-codes an 8-row / 128-col halo (row_off =
        # 8 - n would go negative and slice wrong rows silently).
        raise ValueError(f"poly_exp_fused supports poly_n <= 8, got {n}")
    g, xg, xxg, igs = _poly_exp_tables(n, sigma)
    b, h, w = img.shape
    ht = -(-h // _TH_P) * _TH_P
    wt = -(-w // _TW_P) * _TW_P
    # Host padding: 8 rows / 128 cols of halo alignment on the leading
    # side, halo + tile padding on the trailing side; edge mode
    # reproduces the replicate border.
    imgp = jnp.pad(
        img.astype(jnp.float32),
        ((0, 0), (8, 8 + ht - h), (128, 128 + wt - w)),
        mode="edge",
    )
    kernel, band_h, band_w = _poly_kernel_factory(g, xg, xxg, igs, n)
    n_i = ht // _TH_P
    n_j = wt // _TW_P
    out = pl.pallas_call(
        functools.partial(kernel, n_i=n_i, n_j=n_j),
        out_shape=jax.ShapeDtypeStruct((b, 5, ht, wt), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(b, n_i, n_j),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, 5, _TH_P, _TW_P),
                lambda bb, i, j, *refs: (bb, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, band_h, band_w), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
    )(imgp)
    return jnp.moveaxis(out[:, :, :h, :w], 1, -1)


# ---------------------------------------------------------------------------
# Fused window-average + 2x2 solve (flow update)
# ---------------------------------------------------------------------------


def _flow_kernel_factory(weights, winsize: int):
    """Box or Gaussian window sum over the 5 M planes + per-pixel solve."""
    wl = [float(v) for v in weights]
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

        sums = []
        for c in range(5):
            v = None
            for k in range(winsize):
                sl = band[c, row_off + k : row_off + k + _TH_P, :]
                v = sl * wl[k] if v is None else v + sl * wl[k]
            hsum = None
            for k in range(winsize):
                cc = col_off + k
                s = v[:, cc : cc + _TW_P]
                hsum = s * wl[k] if hsum is None else hsum + s * wl[k]
            sums.append(hsum)

        g11, g12, g22, h1, h2 = sums
        idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
        out_ref[0, 0] = (g11 * h2 - g12 * h1) * idet
        out_ref[0, 1] = (g22 * h1 - g12 * h2) * idet

    return kernel, band_h, band_w


@functools.partial(jax.jit, static_argnames=("winsize", "gaussian_win", "interpret"))
def update_flow_fused(
    m: jnp.ndarray, winsize: int = 15, gaussian_win: bool = False, interpret: bool = False
) -> jnp.ndarray:
    """Fused Pallas window-average + solve: M (B,H,W,5) → flow (B,H,W,2).

    Matches ops.farneback.update_flow (replicate borders).
    """
    from btcs_pnes_optical_flow_tpu.ops.farneback import _gaussian_win_kernel

    if winsize // 2 > 8:
        # Same 8-row halo constraint as poly_exp_fused (row_off = 8 -
        # winsize//2 negative → silent wrap); winsize >= 19 must use
        # the exact XLA path.
        raise ValueError(f"update_flow_fused supports winsize <= 17, got {winsize}")
    if gaussian_win:
        weights = _gaussian_win_kernel(winsize)
    else:
        weights = np.full(winsize, 1.0 / winsize, dtype=np.float64)
    b, h, w, _ = m.shape
    ht = -(-h // _TH_P) * _TH_P
    wt = -(-w // _TW_P) * _TW_P
    mt = jnp.moveaxis(m, -1, 1)
    mp = jnp.pad(
        mt, ((0, 0), (0, 0), (8, 8 + ht - h), (128, 128 + wt - w)), mode="edge"
    )
    kernel, band_h, band_w = _flow_kernel_factory(weights, winsize)
    n_i = ht // _TH_P
    n_j = wt // _TW_P
    out = pl.pallas_call(
        functools.partial(kernel, n_i=n_i, n_j=n_j),
        out_shape=jax.ShapeDtypeStruct((b, 2, ht, wt), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(b, n_i, n_j),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, 2, _TH_P, _TW_P),
                lambda bb, i, j, *refs: (bb, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 5, band_h, band_w), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
    )(mp)
    return jnp.moveaxis(out[:, :, :h, :w], 1, -1)
