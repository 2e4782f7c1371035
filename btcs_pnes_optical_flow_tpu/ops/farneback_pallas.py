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
from typing import Optional, Tuple

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


def _band_dims(d_max_y: int, d_max_x: int, th: int = _TH, tw: int = _TW,
               band_dtype=jnp.float32):
    """Aligned band extents for the warp kernel's per-tile DMA.

    The reachable window is asymmetric by design: tiles are short (32
    rows) and wide (128/256 cols), so within-tile vertical flow
    variation is much smaller than horizontal — separate d_max per axis
    keeps the band (and its DMA traffic) tight while covering realistic
    motion.

    band_w MUST be a power of two: Mosaic's dynamic 2D lane roll
    (tpu.dynamic_rotate) silently miscomputes at non-power-of-two lane
    widths (measured on v5e: 256/512 exact, 384/640 wrong for every
    nonzero shift — scripts/repro_roll_w384.py), and the kernel lane-
    rolls the full band.

    band_dtype: bf16 bands (half the DMA bytes; scripts/repro_roll_bf16
    measured dynamic-start bf16 DMA exact from HBM at 8-row-aligned
    starts) round band_h to the (16, 128) packed-tile granule so the
    DMA slice shape stays tiling-aligned.  Rolls still run in f32 —
    Mosaic rejects tpu.dynamic_rotate on non-32-bit data — so the
    kernel upcasts after the copy.
    """
    granule_h = 16 if jnp.dtype(band_dtype).itemsize == 2 else 8
    band_h = -(-(th + 2 * d_max_y + 2 + 7) // granule_h) * granule_h
    band_w = -(-(tw + 2 * d_max_x + 2 + 127) // 128) * 128
    while band_w & (band_w - 1):
        band_w += 128
    return band_h, band_w


def warp_grid(h: int, w: int):
    """Per-level warp-kernel geometry: (ht, wt, tile_w).

    Tile height is fixed at _TH = 32 (the band's vertical reach and the
    clip envelope are calibrated to it).  Tile width stays at 256
    unless 128 cuts the padded width by >= 40%: measured at 480p L0
    (640 wide), 128-wide tiles LOSE ~20% per warp iteration despite
    computing 17% fewer padded pixels — per-tile costs (the full-band
    lane roll ~ band area, the anchor min/max reductions, and 1.67x
    more multi-window top-K tiles) scale with tile *count*, not pixels.
    Only tiny coarse levels (e.g. 60x80 -> wt 128 vs 256) clear the
    40% bar.
    """
    ht = -(-h // _TH) * _TH
    wt256 = -(-w // 256) * 256
    wt128 = -(-w // 128) * 128
    tw = 128 if wt128 * 10 <= wt256 * 6 else 256
    return ht, (wt128 if tw == 128 else wt256), tw


def plane_tiles(ht: int, wt: int, channels: int, vmem_limit: int = 6 << 20):
    """Tile sizes for the halo-static plane kernels (poly expansion,
    window solve) targeting an exact output grid (ht, wt).

    Tile dims must divide the grid (so the grid is the tile lattice —
    zero padding waste), be (8, 128)-aligned, and keep the kernel's
    double-buffered (channels, th+16, tw+256) band under ``vmem_limit``.
    Larger tiles amortize per-grid-step overhead, so pick the largest
    height <= 64, then the largest width <= 768 that fits VMEM.
    (Bisected Mosaic envelope on v5e: bands of (96..112 rows, 896 cols)
    fail tpu_compile_helper outright while (80, 896) and (112, 768)
    compile — hence the th/tw caps.)
    """
    th = next(d for d in range(64, 7, -8) if ht % d == 0)
    for tw in (768, 640, 512, 384, 256, 128):
        if wt % tw:
            continue
        if 2 * channels * (th + 16) * (tw + 256) * 4 <= vmem_limit:
            return th, tw
    raise ValueError(f"no feasible plane tile for grid ({ht}, {wt})")


def pad_for_band(
    r1_cf: jnp.ndarray,
    h: int,
    w: int,
    d_max_y: int = 8,
    d_max_x: int = 16,
    base_max: int = 56,
    th: int = _TH,
    tw: int = _TW,
    dtype=None,
) -> jnp.ndarray:
    """Pad channel-first coefficients for the banded warp's DMA reads.

    r1_cf: (B, 5, H0, W0) with the true image in [:h, :w] (H0/W0 may be
    tile-padded).  Pads `base_max + d_max + 2` on the leading sides (so
    negative base displacements stay in bounds) and enough trailing
    rows/cols that every aligned band DMA stays in bounds.  Built once
    per pyramid level and reused across all warp iterations.

    dtype: band storage dtype (default: keep r1_cf's).  bf16 halves
    both this pad's HBM write traffic and every warp iteration's band
    DMA bytes; the warp kernels upcast after the copy, so the sampled
    values equal the f32-band bf16-MAC path bit-for-bit (rounding
    happens at the same place either way).

    The pad region is CONSTANT ZERO, not edge-replicate (round 5):
    the warp kernels never consume pad values — pixels whose floor
    corner leaves the image fail the ``inside`` guard and fall back to
    the r0-only border terms (discarding their accumulated samples),
    and in-window pixels' (t_idx, s_idx) weights select true-image
    rows/cols only — so any finite fill is equivalent, and a constant
    pad is ONE fused XLA op where the edge pad lowered to a
    concatenation chain that cost more than the poly expansion itself
    (67.75 ms vs 30.32 ms per 257-frame L0 call, 2026-08-21 ledger).
    """
    if dtype is not None and r1_cf.dtype != dtype:
        r1_cf = r1_cf.astype(dtype)
    _, _, h0, w0 = r1_cf.shape
    pad_y = base_max + d_max_y + 2
    pad_x = base_max + d_max_x + 2
    band_h, band_w = _band_dims(d_max_y, d_max_x, th, tw, band_dtype=r1_cf.dtype)
    ht = -(-h // th) * th
    wt = -(-w // tw) * tw
    pad_bottom = max(0, ht - th + base_max - d_max_y + band_h + 2 - h0)
    pad_right = max(0, wt - tw + base_max - d_max_x + band_w + 2 - w0)
    return jnp.pad(
        r1_cf, ((0, 0), (0, 0), (pad_y, pad_bottom), (pad_x, pad_right))
    )


def warp_tiles_per_step(
    n_i: int,
    n_j: int,
    band_h: int,
    band_w: int,
    th: int,
    tw: int,
    n_slots: int,
    band_bytes: int = 4,
    total_budget: int = 10 << 20,
    tps_cap: int = 1,
) -> Tuple[int, int]:
    """Sub-tiles per warp grid step — MEASURED DEAD END, capped at (1,1).

    probe_floor4 (round 4) showed ~1.2 us of pure Mosaic grid/pipeline
    machinery per step, motivating a step that processes a ``tps_i x
    tps_j`` block of adjacent (th, tw) tiles sequentially (each
    sub-tile keeps its OWN base/band/window, so numerics match (1,1)
    up to FMA-contraction roundoff).  The hardware said no
    (scripts/probe_tps_ab.py, v5e, transposed L0 bench geometry):

        tps=(1,1) bf16 MAC   4.83 us/tile   (the shipped config)
        tps=(2,1)           21.96 us/tile   (4.5x SLOWER)
        tps=(2,2)           22.28 us/tile
        tps=(5,1)           22.21 us/tile

    Every merge factor hits the same ~4.5x per-tile cliff regardless of
    VMEM footprint ((2,1) uses ~4 MB — far under budget), i.e. the same
    wall as 64-row and 640-lane tiles (docs/PERFORMANCE.md "the slot
    cliff"): Mosaic cannot keep N consecutive warp bodies (or one
    N-times-larger body) in registers, and sliced writes into the
    merged output block defeat its streaming.  The per-step floor is
    NOT amortizable by any form of step-growing.  The machinery is kept
    (tested by scripts/check_tps_equality.py) for probes to override;
    production stays at (1, 1).
    """
    best = (1, 1)
    best_tot = 1
    for tps_i in range(1, n_i + 1):
        if n_i % tps_i:
            continue
        for tps_j in range(1, n_j + 1):
            if n_j % tps_j:
                continue
            tps = tps_i * tps_j
            if tps > tps_cap:
                continue
            bands = n_slots * tps * 5 * band_h * band_w * band_bytes
            blocks = 2 * (5 + 2 + 5) * th * tw * tps * 4
            if bands + blocks > total_budget:
                continue
            # Prefer lane-merge at equal amortization (contiguous io
            # slices), then the larger total.
            if tps > best_tot or (tps == best_tot and tps_j > best[1]):
                best = (tps_i, tps_j)
                best_tot = tps
    return best


def _make_kernel(
    h: int,
    w: int,
    hp: int,
    wp: int,
    pad_y: int,
    pad_x: int,
    d_max_y: int,
    d_max_x: int,
    s_cap: int = 0,
    precision: str = "fp32",
    r1_offset: int = 0,
    s_block: int = 4,
    th: int = _TH,
    tw: int = _TW,
    n_slots: int = 2,
    tps_i: int = 1,
    tps_j: int = 1,
    band_dtype=jnp.float32,
    i_off: int = 0,
    j_off: int = 0,
):
    """Build the fused warp+update kernel for static shapes.

    i_off/j_off: static tile offsets of the dispatched subgrid on the
    full warp lattice (ROI-aware dispatch): the grid and all block-
    indexed refs (flow, M, scalars) are compact over the ACTIVE tiles,
    while global pixel coordinates and the r0/r1 addressing add the
    offsets.  (0, 0) with the full grid is the classic full-frame
    dispatch.

    h, w: true image size.  hp, wp: padded size of r1 (pad_y/pad_x on
    the leading side of each axis).  The flow/r0/M arrays use
    tile-padded grids.

    The horizontal candidate loop is anchored at the tile's min live
    candidate (an extra dynamic lane roll) and runs in predicated
    4-slot blocks, so its cost tracks the tile's *actual* displacement
    span rather than the full 2*d_max_x+2 static range — wide d_max_x
    is nearly free for smooth tiles.  s_cap > 0 additionally hard-caps
    the span; pixels outside any reachable window are clamped *and
    counted* in the clip output.  precision="bf16" runs the candidate
    multiply-accumulates in bfloat16 (float32 accumulation).
    r1_offset shifts the batch index of the band source (the
    frame-sequence driver passes the whole frame stack once and warps
    from frame b+1).

    tps_i, tps_j: the block of adjacent tiles processed per grid step
    (see warp_tiles_per_step) — each sub-tile keeps its own base
    displacement, band DMA, anchors, and clip bookkeeping; only the
    per-step overhead is amortized (M matches (1,1) to FMA-contraction
    roundoff, scalars bit-exactly).
    """
    # Mosaic requires DMA slice shapes *and* start offsets aligned to
    # the (8, 128) VMEM tiling.  The band is over-sized to absorb both
    # the alignment slack (7 rows / 127 cols) and the window halo; the
    # unaligned remainder is corrected with dynamic rolls after the
    # copy (tpu.dynamic_rotate is cheap VPU data movement).
    band_h, band_w = _band_dims(d_max_y, d_max_x, th, tw, band_dtype=band_dtype)
    n_t = 2 * d_max_y + 2 + 7
    n_s_full = 2 * d_max_x + 2
    n_s = min(s_cap, n_s_full) if s_cap else n_s_full
    # Horizontal predication block; 0 = flat (no per-block guards, one
    # register accumulation chain over all n_s slots per t row).
    _SB = s_block if s_block else n_s
    # Roll-margin proof: after rolling by (m_col + smin) <= 127 +
    # n_s_full, circular wrap garbage occupies the last m_col + smin
    # columns; reads go up to col (n_s - 1) + tw - 1.
    # band_w >= tw + 127 + n_s_full covers every case.
    assert band_w >= tw + 127 + n_s_full
    wdt = jnp.bfloat16 if precision == "bf16" else jnp.float32

    def kernel(
        by_ref, bx_ref, r0_ref, flow_ref, r1_ref,
        m_ref, clip_ref, smin_ref, rmdy_ref, rmdx_ref,
        band2, acc5, sem2, *, n_i, n_j,
    ):
        bb = pl.program_id(0)
        tig = pl.program_id(1)
        tjg = pl.program_id(2)
        tps = tps_i * tps_j
        n_ig = n_i // tps_i
        n_jg = n_j // tps_j
        step = (bb * n_ig + tig) * n_jg + tjg
        total = pl.num_programs(0) * n_ig * n_jg

        def step_tile(step_, st):
            """Flat tile id of sub-tile st of grid step step_."""
            sti_, stj_ = divmod(st, tps_j)
            tjg_ = step_ % n_jg
            rest = step_ // n_jg  # = bb_*n_ig + tig_
            tig_ = rest % n_ig
            bb_ = rest // n_ig
            return (
                bb_ * n_i + tig_ * tps_i + sti_
            ) * n_j + tjg_ * tps_j + stj_

        def tile_geometry(flat_idx):
            tj_ = flat_idx % n_j
            rest = flat_idx // n_j
            ti_ = rest % n_i
            bb_ = rest // n_i
            row0_ = jnp.clip(
                (ti_ + i_off) * th + by_ref[flat_idx] - d_max_y + pad_y,
                0, hp - band_h,
            )
            col0_ = jnp.clip(
                (tj_ + j_off) * tw + bx_ref[flat_idx] - d_max_x + pad_x,
                0, wp - band_w,
            )
            row0a_ = pl.multiple_of((row0_ // 8) * 8, 8)
            col0a_ = pl.multiple_of((col0_ // 128) * 128, 128)
            return bb_, row0_, col0_, row0a_, col0a_

        def band_dma(step_, st, slot):
            bb_, _, _, row0a_, col0a_ = tile_geometry(step_tile(step_, st))
            return pltpu.make_async_copy(
                r1_ref.at[bb_ + r1_offset, :, pl.ds(row0a_, band_h), pl.ds(col0a_, band_w)],
                band2.at[slot, st],
                sem2.at[slot, st],
            )

        # Multi-buffered band pipeline: step computes from slot
        # step % n_slots while the next (n_slots - 1) steps' bands
        # (tps each) stream into the other slots.  Depth > 2 exists
        # because the per-tile cost is DMA-latency-bound, not
        # transfer-bound: one step of lookahead (~1 us of compute on
        # smooth tiles) cannot hide the several-us issue-to-complete
        # latency of an HBM read.
        cur = step % n_slots
        ahead = n_slots - 1

        @pl.when(step == 0)
        def _():
            for d in range(ahead):

                @pl.when(d < total)
                def _(d=d):
                    for st in range(tps):
                        band_dma(d, st, d % n_slots).start()

        @pl.when(step + ahead < total)
        def _():
            for st in range(tps):
                band_dma(step + ahead, st, (step + ahead) % n_slots).start()

        for st in range(tps):
            band_dma(step, st, cur).wait()
            sti, stj = divmod(st, tps_j)
            ti = tig * tps_i + sti
            tj = tjg * tps_j + stj
            y0g = (ti + i_off) * th
            x0g = (tj + j_off) * tw
            flat_idx = step_tile(step, st)
            rsl = slice(sti * th, (sti + 1) * th)
            sl = slice(stj * tw, (stj + 1) * tw)

            fx = flow_ref[0, 0, rsl, sl]
            fy = flow_ref[0, 1, rsl, sl]
            _, row0, col0, row0a, col0a = tile_geometry(flat_idx)
            m_col = col0 - col0a
            band = band2[cur, st]

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
            # Pixels whose sampled band values actually matter: inside
            # the warp guard AND on the true grid (tile padding is
            # discarded).
            live = inside & (ii < h) & (jj < w)

            # Band-relative candidate indices.  Rows are relative to
            # the *aligned* start (row slack widens the range to
            # 0..2*d_y+8); columns are relative to the span-anchored
            # rolled start.
            t_raw = y1i - ii + (y0g - (row0a - pad_y))
            t_idx = jnp.clip(t_raw, 0, n_t - 1)
            s_raw = x1i - jj + (x0g - (col0 - pad_x))
            s_full = jnp.clip(s_raw, 0, n_s_full - 1)
            # Anchor the horizontal window at the tile's min live
            # candidate so the MAC loop walks the tile's *actual* span
            # from slot 0.
            smin = jnp.min(jnp.where(live, s_full, n_s_full - 1))
            smin = jnp.clip(smin, 0, max(n_s_full - n_s, 0))
            roll_shift = -(m_col + smin)
            s_idx = jnp.clip(s_full - smin, 0, n_s - 1)
            s_over = (s_raw != s_full) | (s_full - smin != s_idx)

            # Clipped candidates mean the banded approximation was
            # violated (per-pixel displacement strayed past
            # d_max_y/d_max_x of the tile mean, or past the s_cap
            # span): count them, and export the per-tile window anchor
            # plus the *missed* pixels' min floor candidates, so the
            # multi-pass driver can re-anchor follow-up windows and
            # re-derive this window's coverage from scalars alone
            # (update_matrices_banded_tiles_cf).
            missed = live & ((t_raw != t_idx) | s_over)
            n_clip = jnp.sum(missed.astype(jnp.int32))
            clip_ref[0, ti, tj] = n_clip
            smin_ref[0, ti, tj] = smin
            big = jnp.int32(1 << 20)
            rmdy_ref[0, ti, tj] = jnp.min(jnp.where(missed, y1i - ii, big))
            rmdx_ref[0, ti, tj] = jnp.min(jnp.where(missed, x1i - jj, big))

            # Lane alignment (0..127, plus the span anchor) is
            # corrected with a single dynamic lane roll over the
            # channel-stacked band (verified exact; 2D lane rolls are
            # the only dynamic rolls Mosaic compiles correctly —
            # sublane and 3D rolls miscompile).  The 0..7-row
            # alignment slack is absorbed into the vertical candidate
            # range.
            bandf = band.reshape(5 * band_h, band_w)
            if bandf.dtype != jnp.float32:
                # bf16 dynamic rolls don't compile (tpu.dynamic_rotate
                # is 32-bit-only — scripts/repro_roll_bf16); upcast
                # first.  The later wdt cast reproduces the same bf16
                # values bit-for-bit, so bf16-band == f32-band+bf16-MAC.
                bandf = bandf.astype(jnp.float32)
            rolled = pltpu.roll(bandf, shift=roll_shift, axis=1)
            if precision == "bf16":
                rolled = rolled.astype(jnp.bfloat16)
            bandv = [rolled[c * band_h : (c + 1) * band_h] for c in range(5)]

            # Sparse predicated accumulation: a tile's pixels only ever
            # hit candidates in [min(t_idx), max(t_idx)+1] × [0,
            # smax+1] (typically ~3×3 of the full static range), so
            # each t row and each 4-slot s block is guarded by a
            # *scalar* pl.when — wide static d_max ranges cost
            # branches, not vector MACs.
            live_t = jnp.where(live, t_idx, -1)
            tmin = jnp.min(jnp.where(live, t_idx, n_t - 1))
            tmax = jnp.max(live_t)
            smin_b = jnp.min(jnp.where(live, s_idx, n_s - 1))
            smax = jnp.max(jnp.where(live, s_idx, 0))
            acc5[...] = jnp.zeros((5, th, tw), jnp.float32)
            axw = ax.astype(wdt)
            one_m_axw = (1.0 - ax).astype(wdt)
            # Loops run one slot/row past the window (range n_t+1 /
            # n_s+1): a pixel whose floor corner sits on the LAST slot
            # still needs its +1 bilinear corner from the next slot —
            # without the extension that term is silently dropped for
            # displacements in the (d_max, d_max+1] boundary shell
            # (uncounted by the clip detector, whose contract is
            # floor-corner-in-window).  Band margins cover the extra
            # read (see the roll-margin proof).
            for t in range(n_t + 1):

                @pl.when((t >= tmin) & (t <= tmax + 1))
                def _(t=t, t_idx=t_idx, ay=ay, s_idx=s_idx, axw=axw,
                      one_m_axw=one_m_axw, bandv=bandv, smax=smax,
                      smin_b=smin_b):
                    wy = jnp.where(t_idx == t, 1.0 - ay, 0.0) if t < n_t else (
                        jnp.zeros((th, tw), jnp.float32)
                    )
                    if t >= 1:
                        wy = wy + jnp.where(t_idx == t - 1, ay, 0.0)
                    for sb in range(0, n_s + 1, _SB):

                        # A block touches live weights iff some live
                        # s_idx falls in [sb-1, sb+_SB-1] (each slot sv
                        # reads s_idx == sv and sv-1) — two-sided
                        # guard, so with the window un-anchored
                        # (s_cap = 0) dead blocks below the live span
                        # are skipped too.
                        @pl.when((sb <= smax + 1) & (smin_b < sb + _SB))
                        def _(t=t, sb=sb, wy=wy, s_idx=s_idx, axw=axw,
                              one_m_axw=one_m_axw, bandv=bandv):
                            # Register-accumulated inner block; one
                            # VMEM RMW per (t, block, channel).
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
            r0b = r0_ref[0, :, rsl, sl]
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

            m_ref[0, 0, rsl, sl] = r4 * r4 + r6 * r6
            m_ref[0, 1, rsl, sl] = (r4 + r5) * r6
            m_ref[0, 2, rsl, sl] = r5 * r5 + r6 * r6
            m_ref[0, 3, rsl, sl] = r4 * r2 + r6 * r3
            m_ref[0, 4, rsl, sl] = r6 * r2 + r5 * r3

    return kernel, band_h, band_w


def update_matrices_banded_cf(
    r0_cf: jnp.ndarray,
    flow_cf: jnp.ndarray,
    r1p: jnp.ndarray,
    h: int,
    w: int,
    d_max_y: int = 8,
    d_max_x: int = 16,
    base_max: int = 56,
    s_cap: int = 0,
    precision: str = "fp32",
    r1_offset: int = 0,
    s_block: int = 4,
    th: int = _TH,
    tw: int = _TW,
    n_slots: int = 2,
    active: Optional[Tuple[int, int, int, int]] = None,
    ghost: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Channel-first banded warp + normal-equation update (Pallas).

    The glue-free core of the hot path: all arrays live in the kernel's
    native layout so repeated iterations incur zero HLO transposes/pads
    (the moveaxis/pad chains around every call dominated the profile —
    docs/PERFORMANCE.md).

    r0_cf: (B0, 5, H0, W0) coefficients, true image in [:h, :w]; H0/W0
        may be tile-padded larger (any multiple of the kernel tile) —
        e.g. poly_exp_fused_cf output is consumed directly, and the
        frame-sequence driver passes the whole (N+1)-frame stack (only
        the first B frames are read).
    flow_cf: (B, 2, Hf, Wf), true flow in [:h, :w]; padding values must
        be finite/representative (they enter the per-tile base means).
    r1p: (B + r1_offset, 5, hp, wp) from pad_for_band.
    Returns (M (B, 5, ht, wt), clip (B, n_i, n_j) int32, aux) where
    aux = (bases (B, 2, n_i, n_j), smin, resid_min_dy, resid_min_dx)
    — the per-tile window anchors and the missed pixels' min floor
    candidates (sentinel 1<<20 when a tile missed nothing), which the
    multi-pass driver uses to anchor follow-up windows.  M matches
    ops.farneback.update_matrices on the true grid whenever clip == 0;
    nonzero clip marks tiles whose pixels strayed past the reachable
    window (re-visit via update_matrices_banded_tiles_cf or re-run via
    the exact path).
    """
    b = flow_cf.shape[0]
    ht = -(-h // th) * th
    wt = -(-w // tw) * tw
    pad_y = base_max + d_max_y + 2
    pad_x = base_max + d_max_x + 2
    # ROI-aware dispatch: with ``active`` = (i0, i1, j0, j1) tile
    # ranges on the (th, tw) lattice, the grid and the flow/M/scalar
    # arrays are compact over the active subgrid; r0 stays full-grid
    # (block index maps add the offsets) and r1p is addressed globally.
    if active is None:
        i0, i1, j0, j1 = 0, ht // th, 0, wt // tw
    else:
        i0, i1, j0, j1 = active
    n_i = i1 - i0
    n_j = j1 - j0
    for name, arr, hh, ww in (
        ("r0_cf", r0_cf, ht, wt),
        ("flow_cf", flow_cf, n_i * th, n_j * tw),
    ):
        if arr.shape[-2] % th or arr.shape[-1] % tw or arr.shape[-2] < hh or arr.shape[-1] < ww:
            raise ValueError(
                f"{name} spatial dims {arr.shape[-2:]} must be multiples of "
                f"({th},{tw}) covering ({hh},{ww})"
            )
    hp, wp = r1p.shape[-2], r1p.shape[-1]

    band_dtype = r1p.dtype
    band_h0, band_w0 = _band_dims(d_max_y, d_max_x, th, tw, band_dtype=band_dtype)
    if active is None and not ghost:
        tps_i, tps_j = warp_tiles_per_step(
            n_i, n_j, band_h0, band_w0, th, tw, n_slots,
            band_bytes=jnp.dtype(band_dtype).itemsize,
        )
    else:
        # ROI subgrids / ghost-ring outputs pin tps at the production
        # (1, 1) operating point (the merged-step path is a measured
        # dead end, and the offset block maps assume 1-tile blocks).
        tps_i = tps_j = 1
    tps = tps_i * tps_j
    kernel, band_h, band_w = _make_kernel(
        h, w, hp, wp, pad_y, pad_x, d_max_y, d_max_x,
        s_cap=s_cap, precision=precision, r1_offset=r1_offset, s_block=s_block,
        th=th, tw=tw, n_slots=n_slots, tps_i=tps_i, tps_j=tps_j,
        band_dtype=band_dtype, i_off=i0, j_off=j0,
    )

    # Per-tile integer base displacements, precomputed so the kernel's
    # double-buffered pipeline can start tile t+1's band DMA during
    # tile t's compute (bases arrive via scalar prefetch).  flow_cf is
    # compact over the active subgrid, so this covers exactly the
    # dispatched tiles.
    ftiles = flow_cf[:, :, : n_i * th, : n_j * tw].reshape(b, 2, n_i, th, n_j, tw)
    bases = jnp.round(jnp.mean(ftiles, axis=(3, 5))).astype(jnp.int32)
    bases = jnp.clip(bases, -base_max, base_max)
    bx_flat = bases[:, 0].reshape(-1)
    by_flat = bases[:, 1].reshape(-1)

    # One (n_i, n_j) SMEM block per batch item (written at dynamic tile
    # indices; TPU requires SMEM blocks to span the trailing dims).
    def smem_tile_spec():
        return pl.BlockSpec(
            (1, n_i, n_j),
            lambda bb, i, j, *refs: (bb, 0, 0),
            memory_space=pltpu.SMEM,
        )

    # Tile offsets of the active subgrid in block units (r0 is
    # full-grid; flow/M/scalars are compact).  tps is (1, 1) whenever
    # active is set, so the block-unit offsets equal the tile offsets.
    oi, oj = i0 // tps_i, j0 // tps_j
    # ghost: allocate M with a one-tile ring of UNWRITTEN blocks so the
    # solve kernel can DMA its (8, 128)-haloed bands straight from M
    # (update_flow_fused_cf halo=(th, tw)) — no pad_for_solve copy.
    # The ghost holds whatever was in HBM; every ghost value a solve
    # band can see is overwritten by its fix_borders before use.
    og = 1 if ghost else 0
    out, clip, smin_t, rmdy, rmdx = pl.pallas_call(
        functools.partial(kernel, n_i=n_i, n_j=n_j),
        out_shape=(
            jax.ShapeDtypeStruct(
                (b, 5, (n_i + 2 * og) * th, (n_j + 2 * og) * tw), jnp.float32),
            jax.ShapeDtypeStruct((b, n_i, n_j), jnp.int32),
            jax.ShapeDtypeStruct((b, n_i, n_j), jnp.int32),
            jax.ShapeDtypeStruct((b, n_i, n_j), jnp.int32),
            jax.ShapeDtypeStruct((b, n_i, n_j), jnp.int32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, n_i // tps_i, n_j // tps_j),
            in_specs=[
                pl.BlockSpec(
                    (1, 5, th * tps_i, tw * tps_j),
                    lambda bb, i, j, *refs: (bb, 0, i + oi, j + oj),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 2, th * tps_i, tw * tps_j),
                    lambda bb, i, j, *refs: (bb, 0, i, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),  # full r1, DMA'd per tile
            ],
            out_specs=(
                pl.BlockSpec(
                    (1, 5, th * tps_i, tw * tps_j),
                    lambda bb, i, j, *refs: (bb, 0, i + og, j + og),
                    memory_space=pltpu.VMEM,
                ),
                smem_tile_spec(),
                smem_tile_spec(),
                smem_tile_spec(),
                smem_tile_spec(),
            ),
            scratch_shapes=[
                pltpu.VMEM((n_slots, tps, 5, band_h, band_w), band_dtype),
                pltpu.VMEM((5, th, tw), jnp.float32),
                pltpu.SemaphoreType.DMA((n_slots, tps)),
            ],
        ),
        interpret=interpret,
    )(by_flat, bx_flat, r0_cf, flow_cf, r1p)
    return out, clip, (bases, smin_t, rmdy, rmdx)


@functools.partial(
    jax.jit,
    static_argnames=(
        "d_max_y", "d_max_x", "base_max", "s_cap", "precision", "return_clip",
        "s_block", "interpret",
    ),
)
def update_matrices_banded(
    r0: jnp.ndarray,
    r1: jnp.ndarray,
    flow: jnp.ndarray,
    d_max_y: int = 8,
    d_max_x: int = 16,
    base_max: int = 56,
    s_cap: int = 0,
    precision: str = "fp32",
    return_clip: bool = False,
    s_block: int = 4,
    interpret: bool = False,
):
    """Fused banded warp + normal-equation update (channel-last API).

    r0, r1: (B, H, W, 5) polynomial expansions; flow: (B, H, W, 2).
    Returns M (B, H, W, 5) — and the per-tile clip counts
    (B, n_i, n_j) when return_clip is set.  Matches
    ops.farneback.update_matrices up to the banded-warp approximation
    (exact whenever each pixel's displacement is within
    ``(d_max_y, d_max_x)`` of its tile's mean displacement,
    |mean| <= base_max, and — with s_cap > 0 — the horizontal candidate
    span fits s_cap); violations are reported in the clip counts.  The
    production driver (farneback_fused) uses the channel-first core
    directly.
    """
    b, h, w, _ = r0.shape
    ht = -(-h // _TH) * _TH
    wt = -(-w // _TW) * _TW

    r0t = jnp.moveaxis(r0, -1, 1)  # (B,5,H,W)
    ft = jnp.moveaxis(flow, -1, 1)
    # Tile-pad the true-grid arrays (edge mode keeps values finite).
    r0p = jnp.pad(r0t, ((0, 0), (0, 0), (0, ht - h), (0, wt - w)), mode="edge")
    fp = jnp.pad(ft, ((0, 0), (0, 0), (0, ht - h), (0, wt - w)), mode="edge")
    r1p = pad_for_band(jnp.moveaxis(r1, -1, 1), h, w, d_max_y, d_max_x, base_max)

    out, clip, _aux = update_matrices_banded_cf(
        r0p, fp, r1p, h, w,
        d_max_y=d_max_y, d_max_x=d_max_x, base_max=base_max, s_cap=s_cap,
        precision=precision, s_block=s_block, interpret=interpret,
    )
    m = jnp.moveaxis(out[:, :, :h, :w], 1, -1)
    return (m, clip) if return_clip else m


# ---------------------------------------------------------------------------
# Bucketed follow-up window passes ("multi-window")
# ---------------------------------------------------------------------------
#
# The warp kernel's horizontal candidate loop has a hard perf cliff past
# ~400 static slot instances (scripts/profile_um_micro.py,
# docs/PERFORMANCE.md), but motion-boundary tiles on violent clips need
# displacement spans far wider than one under-cliff window.  The
# TPU-native answer is compaction: the main pass runs the fast anchored
# window over every tile and exports per-tile clip counts plus the
# *missed* pixels' min floor candidates; the driver top-k-selects the
# clipped tiles and this follow-up kernel re-visits ONLY those (grid =
# K flat tile ids via scalar prefetch, all block index maps dynamic),
# with a fresh window anchored at the missed pixels on BOTH axes,
# merging per pixel with the previous M (aliased in place).  Chaining
# passes covers arbitrarily multi-modal tiles; static cost stays under
# the cliff and total cost scales with the actual violation volume.
#
# Bookkeeping is scalar-only: every pass re-derives previous passes'
# per-pixel coverage inside the kernel from (by, bx, smin, visited)
# per-tile scalars — no coverage planes ever touch HBM.


def _make_kernel2(
    h: int,
    w: int,
    hp: int,
    wp: int,
    pad_y: int,
    pad_x: int,
    d_max_y: int,
    d_max_x: int,
    prev_n_s: tuple,
    s_cap: int,
    precision: str = "fp32",
    r1_offset: int = 0,
    th: int = _TH,
    tw: int = _TW,
    band_dtype=jnp.float32,
    i_off: int = 0,
    j_off: int = 0,
):
    """Follow-up-window warp kernel over a compacted tile list.

    i_off/j_off: tile offsets of the ROI-active subgrid (see
    _make_kernel) — sel ids, flow and m1 are compact over it; global
    pixel coordinates and r1 addressing add the offsets.

    prev_n_s: static slot-window widths of the previous passes, oldest
    first — their coverage is re-derived per pixel from the prefetched
    per-tile scalars (4 arrays per previous pass: by, bx, smin,
    visited).  The current window is s_cap slots anchored via the
    prefetched (by_cur, bx_cur, smin_cur).
    """
    band_h, band_w = _band_dims(d_max_y, d_max_x, th, tw, band_dtype=band_dtype)
    n_t = 2 * d_max_y + 2 + 7
    n_s_full = 2 * d_max_x + 2
    n_s = min(s_cap, n_s_full) if s_cap else n_s_full
    n_prev = len(prev_n_s)
    assert band_w >= tw + 127 + n_s_full
    wdt = jnp.bfloat16 if precision == "bf16" else jnp.float32

    def kernel(*refs, n_i, n_j, total):
        (sel_ref, by_ref, bx_ref, smin_ref) = refs[:4]
        prev_refs = [refs[4 + 4 * q : 8 + 4 * q] for q in range(n_prev)]
        (r0_ref, flow_ref, m1_ref, r1_ref,
         m_ref, clip_ref, rmdy_ref, rmdx_ref,
         band2, acc5, sem2) = refs[4 + 4 * n_prev :]
        step = pl.program_id(0)

        def tile_geometry(flat_idx):
            tj_ = flat_idx % n_j
            rest = flat_idx // n_j
            ti_ = rest % n_i
            bb_ = rest // n_i
            row0_ = jnp.clip(
                (ti_ + i_off) * th + by_ref[flat_idx] - d_max_y + pad_y,
                0, hp - band_h,
            )
            col0_ = jnp.clip(
                (tj_ + j_off) * tw + bx_ref[flat_idx] - d_max_x + pad_x,
                0, wp - band_w,
            )
            row0a_ = pl.multiple_of((row0_ // 8) * 8, 8)
            col0a_ = pl.multiple_of((col0_ // 128) * 128, 128)
            return bb_, ti_, tj_, row0_, col0_, row0a_, col0a_

        def band_dma(step_, slot):
            flat = sel_ref[step_]
            bb_, _, _, _, _, row0a_, col0a_ = tile_geometry(flat)
            return pltpu.make_async_copy(
                r1_ref.at[bb_ + r1_offset, :, pl.ds(row0a_, band_h), pl.ds(col0a_, band_w)],
                band2.at[slot],
                sem2.at[slot],
            )

        cur = step % 2

        @pl.when(step == 0)
        def _():
            band_dma(step, cur).start()

        @pl.when(step + 1 < total)
        def _():
            band_dma(step + 1, (step + 1) % 2).start()

        band_dma(step, cur).wait()

        flat_idx = sel_ref[step]
        _, ti, tj, row0, col0, row0a, col0a = tile_geometry(flat_idx)
        y0g = (ti + i_off) * th
        x0g = (tj + j_off) * tw
        m_col = col0 - col0a
        band = band2[cur]
        fx = flow_ref[0, 0]
        fy = flow_ref[0, 1]

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
        live = inside & (ii < h) & (jj < w)
        dev_y = y1i - ii
        dev_x = x1i - jj

        def window_coverage(by_v, bx_v, smin_v, n_s_q):
            """Per-pixel membership of the (by_v, bx_v, smin_v) window,
            bit-identical to the pass that executed it."""
            row0_q = jnp.clip(y0g + by_v - d_max_y + pad_y, 0, hp - band_h)
            row0a_q = (row0_q // 8) * 8
            t_raw_q = dev_y + (y0g - (row0a_q - pad_y))
            t_ok_q = (t_raw_q >= 0) & (t_raw_q <= n_t - 1)
            col0_q = jnp.clip(x0g + bx_v - d_max_x + pad_x, 0, wp - band_w)
            s_raw_q = dev_x + (x0g - (col0_q - pad_x))
            s_ok_q = (s_raw_q >= 0) & (s_raw_q <= n_s_full - 1)
            d_q = s_raw_q - smin_v
            return t_ok_q & s_ok_q & (d_q >= 0) & (d_q <= n_s_q - 1)

        cov_prev = jnp.zeros((th, tw), jnp.bool_)
        for q in range(n_prev):
            by_q, bx_q, smin_q, vis_q = prev_refs[q]
            cov_q = window_coverage(
                by_q[flat_idx], bx_q[flat_idx], smin_q[flat_idx], prev_n_s[q]
            )
            cov_prev = cov_prev | (cov_q & (vis_q[flat_idx] > 0))
        cov_prev = live & cov_prev

        # Current window (anchor smin precomputed by the driver).
        smin2 = smin_ref[flat_idx]
        t_raw = dev_y + (y0g - (row0a - pad_y))
        t_idx = jnp.clip(t_raw, 0, n_t - 1)
        t_ok = t_raw == t_idx
        s_raw = dev_x + (x0g - (col0 - pad_x))
        s_full = jnp.clip(s_raw, 0, n_s_full - 1)
        s_ok_band = s_raw == s_full
        roll_shift = -(m_col + smin2)
        s_idx = jnp.clip(s_full - smin2, 0, n_s - 1)
        in_w2 = s_ok_band & (s_full - smin2 >= 0) & (s_full - smin2 <= n_s - 1)
        covered2 = live & t_ok & in_w2

        resid = live & ~(cov_prev | covered2)
        clip_ref[step] = jnp.sum(resid.astype(jnp.int32))
        big = jnp.int32(1 << 20)
        rmdy_ref[step] = jnp.min(jnp.where(resid, dev_y, big))
        rmdx_ref[step] = jnp.min(jnp.where(resid, dev_x, big))

        bandf = band.reshape(5 * band_h, band_w)
        if bandf.dtype != jnp.float32:
            bandf = bandf.astype(jnp.float32)  # dynamic rolls are 32-bit-only
        rolled = pltpu.roll(bandf, shift=roll_shift, axis=1)
        if precision == "bf16":
            rolled = rolled.astype(jnp.bfloat16)
        bandv = [rolled[c * band_h : (c + 1) * band_h] for c in range(5)]

        missed = live & ~cov_prev
        live2 = missed & t_ok
        live_t = jnp.where(live2, t_idx, -1)
        tmin = jnp.min(jnp.where(live2, t_idx, n_t - 1))
        tmax = jnp.max(live_t)
        smin_b = jnp.min(jnp.where(live2, s_idx, n_s - 1))
        smax = jnp.max(jnp.where(live2, s_idx, 0))
        acc5[...] = jnp.zeros((5, th, tw), jnp.float32)
        axw = ax.astype(wdt)
        one_m_axw = (1.0 - ax).astype(wdt)
        _SB = 4
        # One extra slot/row for the +1 bilinear corners of last-slot
        # pixels (same boundary-shell rule as the main pass).
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

        m1 = m1_ref[0]
        m_ref[0, 0] = jnp.where(cov_prev, m1[0], r4 * r4 + r6 * r6)
        m_ref[0, 1] = jnp.where(cov_prev, m1[1], (r4 + r5) * r6)
        m_ref[0, 2] = jnp.where(cov_prev, m1[2], r5 * r5 + r6 * r6)
        m_ref[0, 3] = jnp.where(cov_prev, m1[3], r4 * r2 + r6 * r3)
        m_ref[0, 4] = jnp.where(cov_prev, m1[4], r6 * r2 + r5 * r3)

    return kernel, band_h, band_w


def update_matrices_banded_tiles_cf(
    sel: jnp.ndarray,
    m1: jnp.ndarray,
    r0_cf: jnp.ndarray,
    flow_cf: jnp.ndarray,
    r1p: jnp.ndarray,
    h: int,
    w: int,
    cur_window,
    prev_windows,
    d_max_y: int = 8,
    d_max_x: int = 16,
    base_max: int = 56,
    s_cap: int = 14,
    precision: str = "fp32",
    r1_offset: int = 0,
    th: int = _TH,
    tw: int = _TW,
    active: Optional[Tuple[int, int, int, int]] = None,
    ghost: bool = False,
    interpret: bool = False,
):
    """One follow-up window pass over the K tiles listed in ``sel``.

    sel: (K,) int32 flat tile ids ((b * n_i + i) * n_j + j) — typically
    the top-K residual tiles (duplicate-free; clean tiles are valid
    no-ops).  m1: the previous M (B, 5, ht, wt).
    cur_window: (by, bx, smin) — (T,) int32 per-tile anchor scalars of
    THIS pass (T = B * n_i * n_j), usually from window_from_residuals.
    prev_windows: sequence of (by, bx, smin, visited, n_s) describing
    every previous pass's window (visited: (T,) int32 0/1; n_s: its
    static slot width).
    Returns (merged M, clip (K,), resid_min_dy (K,), resid_min_dx (K,))
    — the merged buffer keeps every unselected tile untouched (aliased
    in place), and the residual outputs feed the next pass's anchors.
    """
    b = flow_cf.shape[0]
    ht = -(-h // th) * th
    wt = -(-w // tw) * tw
    pad_y = base_max + d_max_y + 2
    pad_x = base_max + d_max_x + 2
    hp, wp = r1p.shape[-2], r1p.shape[-1]
    # ROI-aware dispatch: sel ids / flow / m1 are compact over the
    # active (i0, i1, j0, j1) subgrid; r0 stays full-grid (offset
    # block maps) and r1p is addressed globally (see _make_kernel).
    if active is None:
        i0, j0 = 0, 0
        n_i = ht // th
        n_j = wt // tw
    else:
        i0, i1, j0, j1 = active
        n_i = i1 - i0
        n_j = j1 - j0
    k = sel.shape[0]
    by_c, bx_c, smin_c = cur_window
    prev_arrays = []
    prev_n_s = []
    for (by_q, bx_q, smin_q, vis_q, n_s_q) in prev_windows:
        prev_arrays.extend([by_q, bx_q, smin_q, vis_q])
        prev_n_s.append(n_s_q)

    kernel, band_h, band_w = _make_kernel2(
        h, w, hp, wp, pad_y, pad_x, d_max_y, d_max_x,
        prev_n_s=tuple(prev_n_s), s_cap=s_cap, precision=precision,
        r1_offset=r1_offset, th=th, tw=tw, band_dtype=r1p.dtype,
        i_off=i0, j_off=j0,
    )

    def tile_of(step, sel_ref, *rest):
        flat = sel_ref[step]
        tj = flat % n_j
        rest_ = flat // n_j
        ti = rest_ % n_i
        bb = rest_ // n_i
        return bb, ti, tj

    def dyn_spec(nc, oi=0, oj=0):
        return pl.BlockSpec(
            (1, nc, th, tw),
            lambda s, *refs: (
                tile_of(s, *refs)[0], 0,
                tile_of(s, *refs)[1] + oi,
                tile_of(s, *refs)[2] + oj,
            ),
            memory_space=pltpu.VMEM,
        )

    n_scalar = 4 + 4 * len(prev_windows)
    og = 1 if ghost else 0
    out, clip, rmdy, rmdx = pl.pallas_call(
        functools.partial(kernel, n_i=n_i, n_j=n_j, total=k),
        out_shape=(
            jax.ShapeDtypeStruct(
                (b, 5, (n_i + 2 * og) * th, (n_j + 2 * og) * tw), jnp.float32),
            jax.ShapeDtypeStruct((k,), jnp.int32),
            jax.ShapeDtypeStruct((k,), jnp.int32),
            jax.ShapeDtypeStruct((k,), jnp.int32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_scalar,
            grid=(k,),
            in_specs=[
                dyn_spec(5, oi=i0, oj=j0),   # r0 (full-grid)
                dyn_spec(2),   # flow (compact)
                # m1: the previous M, aliased to the merged output —
                # with ghost=True both carry the one-tile ghost ring.
                dyn_spec(5, oi=og, oj=og),
                pl.BlockSpec(memory_space=pl.ANY),  # full r1, DMA'd per tile
            ],
            out_specs=(
                dyn_spec(5, oi=og, oj=og),
                # Whole (K,) vectors as resident SMEM blocks (TPU
                # rejects size-1 rank-1 blocks); written at [step].
                pl.BlockSpec((k,), lambda s, *refs: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((k,), lambda s, *refs: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((k,), lambda s, *refs: (0,), memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 5, band_h, band_w), r1p.dtype),
                pltpu.VMEM((5, th, tw), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        input_output_aliases={n_scalar + 2: 0},
        interpret=interpret,
    )(
        sel, by_c, bx_c, smin_c, *prev_arrays,
        r0_cf, flow_cf, m1, r1p,
    )
    return out, clip, rmdy, rmdx


def window_from_residuals(
    rmdy: jnp.ndarray,
    rmdx: jnp.ndarray,
    d_max_y: int,
    d_max_x: int,
    base_max: int,
    s_cap: int,
):
    """Anchor scalars (by, bx, smin) for a follow-up window.

    rmdy/rmdx: (T,) min floor candidates of the still-uncovered pixels
    (sentinel 1<<20 for clean tiles — their windows are harmless
    no-ops and their residual counts keep them out of top-k).
    Anchoring the band at the min uncovered candidate makes the
    guaranteed coverage [min, min + 2*d_max + 1] per axis, anywhere
    within +-base_max.
    """
    n_s_full = 2 * d_max_x + 2
    n_s = min(s_cap, n_s_full) if s_cap else n_s_full
    by = jnp.clip(rmdy + d_max_y, -base_max, base_max).astype(jnp.int32)
    bx = jnp.clip(rmdx + d_max_x, -base_max, base_max).astype(jnp.int32)
    smin = jnp.clip(rmdx - (bx - d_max_x), 0, max(n_s_full - n_s, 0)).astype(jnp.int32)
    return by, bx, smin


# ---------------------------------------------------------------------------
# Banded bilinear sampler (generic C-channel warp, clamped coordinates)
# ---------------------------------------------------------------------------


def _make_sample_kernel(
    channels: int,
    h: int,
    w: int,
    hp: int,
    wp: int,
    pad_y: int,
    pad_x: int,
    d_max_y: int,
    d_max_x: int,
    s_cap: int,
    th: int = _TH,
    tw: int = _TW,
):
    """C-channel banded bilinear sampler (the TV-L1 warp).

    Same band-DMA / anchored-window / lane-roll machinery as
    :func:`_make_kernel`, but the epilogue just writes the sampled
    planes — this replaces the ~20 ns/index general gather that made
    the XLA TV-L1 warp (ops/tvl1.py _warp_bilinear) 100x off the
    bandwidth bound.  Coordinate semantics are cv2.remap-style clamp:
    gx = clip(x + u, 0, w-1) (not Farnebäck's border fallback), so
    every pixel is live and edge padding makes boundary reads exact.
    Candidates outside the anchored window are clamped AND counted in
    the clip output (the TV-L1 driver treats nonzero clips exactly like
    the Farnebäck escalation ladder).
    """
    band_h, band_w = _band_dims(d_max_y, d_max_x, th, tw)
    n_t = 2 * d_max_y + 2 + 7
    n_s_full = 2 * d_max_x + 2
    n_s = min(s_cap, n_s_full) if s_cap else n_s_full
    _SB = 4
    assert band_w >= tw + 127 + n_s_full

    def kernel(
        by_ref, bx_ref, flow_ref, src_ref,
        out_ref, clip_ref,
        band2, accc, sem2, *, n_i, n_j,
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
                src_ref.at[bb_, :, pl.ds(row0a_, band_h), pl.ds(col0a_, band_w)],
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

        fx = flow_ref[0, 0]
        fy = flow_ref[0, 1]
        _, row0, col0, row0a, col0a = tile_geometry(idx)
        m_col = col0 - col0a
        band = band2[cur]

        ii = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + y0g
        jj = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + x0g
        # Clamp in continuous coordinates (cv2.remap border-replicate
        # semantics); every on-grid pixel is then live.
        gx = jnp.clip(jj.astype(jnp.float32) + fx, 0.0, w - 1.0)
        gy = jnp.clip(ii.astype(jnp.float32) + fy, 0.0, h - 1.0)
        x1f = jnp.floor(gx)
        y1f = jnp.floor(gy)
        ax = gx - x1f
        ay = gy - y1f
        x1i = x1f.astype(jnp.int32)
        y1i = y1f.astype(jnp.int32)
        live = (ii < h) & (jj < w)

        t_raw = y1i - ii + (y0g - (row0a - pad_y))
        t_idx = jnp.clip(t_raw, 0, n_t - 1)
        s_raw = x1i - jj + (x0g - (col0 - pad_x))
        s_full = jnp.clip(s_raw, 0, n_s_full - 1)
        smin = jnp.min(jnp.where(live, s_full, n_s_full - 1))
        smin = jnp.clip(smin, 0, max(n_s_full - n_s, 0))
        roll_shift = -(m_col + smin)
        s_idx = jnp.clip(s_full - smin, 0, n_s - 1)
        s_over = (s_raw != s_full) | (s_full - smin != s_idx)
        missed = live & ((t_raw != t_idx) | s_over)
        clip_ref[0, ti, tj] = jnp.sum(missed.astype(jnp.int32))

        rolled = pltpu.roll(
            band.reshape(channels * band_h, band_w), shift=roll_shift, axis=1
        )
        bandv = [rolled[c * band_h : (c + 1) * band_h] for c in range(channels)]

        live_t = jnp.where(live, t_idx, -1)
        tmin = jnp.min(jnp.where(live, t_idx, n_t - 1))
        tmax = jnp.max(live_t)
        smin_b = jnp.min(jnp.where(live, s_idx, n_s - 1))
        smax = jnp.max(jnp.where(live, s_idx, 0))
        accc[...] = jnp.zeros((channels, th, tw), jnp.float32)
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
                        inner = [
                            jnp.zeros((th, tw), jnp.float32)
                            for _ in range(channels)
                        ]
                        for sv in range(sb, min(sb + _SB, n_s + 1)):
                            wx = (
                                jnp.where(s_idx == sv, 1.0 - ax, 0.0)
                                if sv < n_s
                                else jnp.zeros((th, tw), jnp.float32)
                            )
                            if sv >= 1:
                                wx = wx + jnp.where(s_idx == sv - 1, ax, 0.0)
                            for c in range(channels):
                                inner[c] = inner[c] + wx * bandv[c][t : t + th, sv : sv + tw]
                        for c in range(channels):
                            accc[c] += wy * inner[c]

        for c in range(channels):
            out_ref[0, c] = accc[c]

    return kernel, band_h, band_w


def warp_sample_banded_cf(
    flow_cf: jnp.ndarray,
    srcp: jnp.ndarray,
    h: int,
    w: int,
    d_max_y: int = 8,
    d_max_x: int = 16,
    base_max: int = 56,
    s_cap: int = 14,
    th: int = _TH,
    tw: int = _TW,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Banded C-channel bilinear warp: sample srcp at (x, y) + flow.

    flow_cf: (B, 2, ht, wt) channel-first displacement (x, y order, the
    warp lattice of :func:`warp_grid`); srcp: (B, C, hp, wp) source
    planes padded by :func:`pad_for_band` (same th/tw).  Returns
    (samples (B, C, ht, wt), clip (B, n_i, n_j)).  Only [:h, :w] of the
    samples is meaningful.  Coordinates are clamped to the image (cv2
    border-replicate), so there is no out-of-bounds fallback channel —
    the use case is TV-L1's per-warp (I1, I1x, I1y) resampling
    (ops/tvl1.py), replacing three full-image general gathers.
    """
    b, c = srcp.shape[0], srcp.shape[1]
    ht = -(-h // th) * th
    wt = -(-w // tw) * tw
    if flow_cf.shape[-2] != ht or flow_cf.shape[-1] != wt:
        raise ValueError(
            f"flow_cf spatial dims {flow_cf.shape[-2:]} must equal the "
            f"({th},{tw}) warp lattice ({ht},{wt})"
        )
    pad_y = base_max + d_max_y + 2
    pad_x = base_max + d_max_x + 2
    hp, wp = srcp.shape[-2], srcp.shape[-1]
    kernel, band_h, band_w = _make_sample_kernel(
        c, h, w, hp, wp, pad_y, pad_x, d_max_y, d_max_x,
        s_cap=s_cap, th=th, tw=tw,
    )
    n_i = ht // th
    n_j = wt // tw

    ftiles = flow_cf[:, :, :ht, :wt].reshape(b, 2, n_i, th, n_j, tw)
    bases = jnp.round(jnp.mean(ftiles, axis=(3, 5))).astype(jnp.int32)
    bases = jnp.clip(bases, -base_max, base_max)
    bx_flat = bases[:, 0].reshape(-1)
    by_flat = bases[:, 1].reshape(-1)

    return pl.pallas_call(
        functools.partial(kernel, n_i=n_i, n_j=n_j),
        out_shape=(
            jax.ShapeDtypeStruct((b, c, ht, wt), jnp.float32),
            jax.ShapeDtypeStruct((b, n_i, n_j), jnp.int32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, n_i, n_j),
            in_specs=[
                pl.BlockSpec(
                    (1, 2, th, tw),
                    lambda bb, i, j, *refs: (bb, 0, i, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(
                    (1, c, th, tw),
                    lambda bb, i, j, *refs: (bb, 0, i, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, n_i, n_j), lambda bb, i, j, *refs: (bb, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, c, band_h, band_w), jnp.float32),
                pltpu.VMEM((c, th, tw), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
    )(by_flat, bx_flat, flow_cf, srcp)


# ---------------------------------------------------------------------------
# Fused polynomial expansion
# ---------------------------------------------------------------------------


def _poly_kernel_factory(g, xg, xxg, igs, n: int, th: int, tw: int,
                         n_slots: int = 2):
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
    band_h = th + 16
    band_w = tw + 256
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
                img_ref.at[bb_, pl.ds(ti_ * th, band_h), pl.ds(tj_ * tw, band_w)],
                band2.at[slot],
                sem2.at[slot],
            )

        # Multi-buffered pipeline (see _make_kernel: depth > 2 hides
        # DMA issue-to-complete latency, not just transfer time).
        cur = idx % n_slots
        ahead = n_slots - 1

        @pl.when(idx == 0)
        def _():
            for d in range(ahead):

                @pl.when(d < total)
                def _(d=d):
                    band_dma(d, d % n_slots).start()

        @pl.when(idx + ahead < total)
        def _():
            band_dma(idx + ahead, (idx + ahead) % n_slots).start()

        band_dma(idx, cur).wait()
        band = band2[cur]

        # Vertical pass over only the columns the horizontal pass
        # reads ([col_off, col_off + tw + 2n]) — the full band width
        # (tw + 256) ran ~1.3x the vertical MACs at tw = 768.
        bs = band[:, col_off : col_off + tw + 2 * n]
        t0 = None
        t1 = None
        t2 = None
        for k in range(2 * n + 1):
            sl = bs[row_off + k : row_off + k + th, :]
            t0 = sl * gl[k] if t0 is None else t0 + sl * gl[k]
            t1 = sl * xgl[k] if t1 is None else t1 + sl * xgl[k]
            t2 = sl * xxgl[k] if t2 is None else t2 + sl * xxgl[k]

        # Horizontal pass on the tile columns.
        b1 = b2 = b3 = b4 = b5 = b6 = None
        for k in range(2 * n + 1):
            s0 = t0[:, k : k + tw]
            s1 = t1[:, k : k + tw]
            s2 = t2[:, k : k + tw]
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


def poly_exp_fused_cf(
    img: jnp.ndarray, n: int = 5, sigma: float = 1.2, grid=None,
    n_slots: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Channel-first fused polynomial expansion: (B, H, W) → (B, 5, ht, wt).

    ``grid`` is the target padded extent (ht, wt) — usually the warp
    kernel's per-level grid, so the output feeds
    update_matrices_banded_cf with zero re-padding; None falls back to
    the legacy (_TH_P, _TW_P) lattice.  Only [:h, :w] is the true
    expansion (the padding holds stencil-of-replicated-border values —
    finite but not meaningful).  Tile sizes are chosen per call to
    divide the grid exactly (plane_tiles), so no pixel outside the grid
    is ever computed.
    """
    from btcs_pnes_optical_flow_tpu.ops.farneback import _poly_exp_tables

    if n > 8:
        # The band layout hard-codes an 8-row / 128-col halo (row_off =
        # 8 - n would go negative and slice wrong rows silently).
        raise ValueError(f"poly_exp_fused supports poly_n <= 8, got {n}")
    g, xg, xxg, igs = _poly_exp_tables(n, sigma)
    b, h, w = img.shape
    if grid is None:
        ht = -(-h // _TH_P) * _TH_P
        wt = -(-w // _TW_P) * _TW_P
    else:
        ht, wt = grid
        if ht < h or wt < w:
            raise ValueError(f"grid {grid} must cover the image ({h}, {w})")
    th, tw = plane_tiles(ht, wt, channels=1)
    # Host padding: 8 rows / 128 cols of halo alignment on the leading
    # side, halo + tile padding on the trailing side; edge mode
    # reproduces the replicate border.
    imgp = jnp.pad(
        img.astype(jnp.float32),
        ((0, 0), (8, 8 + ht - h), (128, 128 + wt - w)),
        mode="edge",
    )
    kernel, band_h, band_w = _poly_kernel_factory(
        g, xg, xxg, igs, n, th, tw, n_slots=n_slots
    )
    n_i = ht // th
    n_j = wt // tw
    return pl.pallas_call(
        functools.partial(kernel, n_i=n_i, n_j=n_j),
        out_shape=jax.ShapeDtypeStruct((b, 5, ht, wt), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(b, n_i, n_j),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, 5, th, tw),
                lambda bb, i, j, *refs: (bb, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((n_slots, band_h, band_w), jnp.float32),
                pltpu.SemaphoreType.DMA((n_slots,)),
            ],
        ),
        interpret=interpret,
    )(imgp)


@functools.partial(jax.jit, static_argnames=("n", "sigma", "interpret"))
def poly_exp_fused(
    img: jnp.ndarray, n: int = 5, sigma: float = 1.2, interpret: bool = False
) -> jnp.ndarray:
    """Fused Pallas polynomial expansion: (B, H, W) → (B, H, W, 5).

    Matches ops.farneback.poly_exp (replicate borders) to fp precision.
    """
    b, h, w = img.shape
    out = poly_exp_fused_cf(img, n, sigma, interpret=interpret)
    return jnp.moveaxis(out[:, :, :h, :w], 1, -1)


# ---------------------------------------------------------------------------
# Fused window-average + 2x2 solve (flow update)
# ---------------------------------------------------------------------------


def _sliding_sum(a, win: int, out_len: int, off: int, axis: int):
    """s[r] = sum_{k < win} a[off + r + k] along ``axis`` via a
    shift-doubling chain: ~log2(win) full-extent adds + one add per
    set bit of ``win``, vs win-1 adds for the naive tap loop — ~2x
    fewer VPU passes for the 15-tap box window.  Static slices only
    (Mosaic lane/sublane shifts)."""

    def sl(x, start, length):
        if axis == 0:
            return x[start : start + length]
        return x[:, start : start + length]

    def ext(x):
        return x.shape[axis]

    chains = {1: a}
    p = 1
    while 2 * p <= win:
        prev = chains[p]
        chains[2 * p] = sl(prev, 0, ext(prev) - p) + sl(prev, p, ext(prev) - p)
        p *= 2
    acc = None
    pos = 0
    rem = win
    for p in sorted(chains, reverse=True):
        while rem >= p:
            blk = sl(chains[p], off + pos, out_len)
            acc = blk if acc is None else acc + blk
            pos += p
            rem -= p
    return acc


def _flow_kernel_factory(weights, winsize: int, th: int, tw: int,
                         n_slots: int = 2, border=None, dma_off=(0, 0)):
    """Box or Gaussian window sum over the 5 M planes + per-pixel solve.

    border: (h, w) true image extent when mp's halo is CONSTANT-ZERO
    (the round-5 pad_for_solve) — the kernel replicates the true border
    rows/cols into the visible pad region of each band before summing,
    reproducing the edge-pad semantics in VMEM instead of re-writing
    the whole M through HBM (the edge-mode jnp.pad cost 31 ms per L0
    iteration — more than the window solve itself).  None = bands used
    as DMA'd (legacy edge-padded mp).
    """
    wl = [float(v) for v in weights]
    half = winsize // 2
    band_h = th + 16
    band_w = tw + 256
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
                m_ref.at[
                    bb_, :,
                    pl.ds(ti_ * th + dma_off[0], band_h),
                    pl.ds(tj_ * tw + dma_off[1], band_w),
                ],
                band2.at[slot],
                sem2.at[slot],
            )

        # Multi-buffered pipeline (see _make_kernel).
        cur = idx % n_slots
        ahead = n_slots - 1

        @pl.when(idx == 0)
        def _():
            for d in range(ahead):

                @pl.when(d < total)
                def _(d=d):
                    band_dma(d, d % n_slots).start()

        @pl.when(idx + ahead < total)
        def _():
            band_dma(idx + ahead, (idx + ahead) % n_slots).start()

        band_dma(idx, cur).wait()
        band = band2[cur]

        if border is not None:
            hh, ww = border
            ri = jax.lax.broadcasted_iota(jnp.int32, (band_h, band_w), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (band_h, band_w), 1)
            # Band rows of the first pad row for the q-th-from-last
            # tile row (and analogously pad cols): every tile whose
            # band can see the zero halo gets a static replicate mask.
            bot_fixes = []
            q = 1
            while n_i - q >= 0 and hh + 8 - (n_i - q) * th < band_h:
                bot_fixes.append((n_i - q, hh + 8 - (n_i - q) * th))
                q += 1
            rt_fixes = []
            q = 1
            while n_j - q >= 0 and ww + 128 - (n_j - q) * tw < band_w:
                rt_fixes.append((n_j - q, ww + 128 - (n_j - q) * tw))
                q += 1

        def fix_borders(bc):
            """Replicate true border rows/cols into the zero halo —
            rows first, then cols, so corners get the corner pixel."""
            if border is None:
                return bc
            out = jnp.where(
                (ti == 0) & (ri < 8),
                jnp.broadcast_to(bc[8:9, :], (band_h, band_w)), bc,
            )
            for (tile_i, bot) in bot_fixes:
                if bot < 1:
                    continue
                out = jnp.where(
                    (ti == tile_i) & (ri >= bot),
                    jnp.broadcast_to(out[bot - 1 : bot, :], (band_h, band_w)),
                    out,
                )
            out = jnp.where(
                (tj == 0) & (ci < 128),
                jnp.broadcast_to(out[:, 128:129], (band_h, band_w)), out,
            )
            for (tile_j, rt) in rt_fixes:
                if rt < 1:
                    continue
                out = jnp.where(
                    (tj == tile_j) & (ci >= rt),
                    jnp.broadcast_to(out[:, rt - 1 : rt], (band_h, band_w)),
                    out,
                )
            return out

        # Box windows (flags=0, the reference default) sum with the
        # shift-doubling chain — ~2x fewer VPU passes than the tap
        # loops; Gaussian windows keep the weighted taps.
        uniform = all(abs(x - wl[0]) < 1e-15 for x in wl)
        scale2 = float(wl[0] * wl[0])
        sums = []
        for c in range(5):
            bc = fix_borders(band[c])
            # The horizontal pass only reads cols [col_off, col_off +
            # tw + winsize - 1); slicing first cuts the vertical MACs
            # to the needed lanes (the full band_w = tw + 256 ran 1.3x
            # the work at tw = 768).
            bcs = bc[:, col_off : col_off + tw + winsize - 1]
            if uniform:
                v = _sliding_sum(bcs, winsize, th, row_off, axis=0)
                hsum = _sliding_sum(v, winsize, tw, 0, axis=1) * scale2
            else:
                v = None
                for k in range(winsize):
                    sl = bcs[row_off + k : row_off + k + th, :]
                    v = sl * wl[k] if v is None else v + sl * wl[k]
                hsum = None
                for k in range(winsize):
                    s = v[:, k : k + tw]
                    hsum = s * wl[k] if hsum is None else hsum + s * wl[k]
            sums.append(hsum)

        g11, g12, g22, h1, h2 = sums
        idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
        out_ref[0, 0] = (g11 * h2 - g12 * h1) * idet
        out_ref[0, 1] = (g22 * h1 - g12 * h2) * idet

    return kernel, band_h, band_w


def update_flow_fused_cf(
    mp: jnp.ndarray, h: int, w: int, winsize: int = 15, gaussian_win: bool = False,
    n_slots: int = 2,
    halo: Tuple[int, int] = (8, 128),
    interpret: bool = False,
    # tile sizes are derived from mp's own grid via plane_tiles
) -> jnp.ndarray:
    """Channel-first fused window-average + solve.

    mp: (B, 5, ht + 2*halo[0], wt + 2*halo[1]) — M with an aligned halo
    ring around the (th, tw)-padded true grid.  The classic form is
    halo=(8, 128) from :func:`pad_for_solve` (constant-zero ring); with
    halo=(warp_th, warp_tw) mp is the warp kernel's ghost-ring M
    (update_matrices_banded_cf(ghost=True)) consumed DIRECTLY — no
    inter-iteration pad copy at all.  Halo values need not be
    meaningful: the kernel's fix_borders replicates the true border
    rows/cols into every halo position a window sum can see.  Returns
    flow (B, 2, ht, wt); only [:h, :w] is meaningful, but the padding
    values are solves of replicated normal equations — finite and
    representative, so the output feeds update_matrices_banded_cf
    directly (its per-tile base means tolerate them).
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
    gy, gx = halo
    if gy < 8 or gy % 8 or gx < 128 or gx % 128:
        raise ValueError(f"halo {halo} must be (8k >= 8, 128k >= 128)")
    b = mp.shape[0]
    ht = mp.shape[-2] - 2 * gy
    wt = mp.shape[-1] - 2 * gx
    if ht % 8 or wt % 128 or ht < h or wt < w:
        raise ValueError(
            f"mp spatial dims {mp.shape[-2:]} must be (ht+{2*gy}, wt+{2*gx})"
        )
    th, tw = plane_tiles(ht, wt, channels=5)
    kernel, band_h, band_w = _flow_kernel_factory(
        weights, winsize, th, tw, n_slots=n_slots, border=(h, w),
        dma_off=(gy - 8, gx - 128),
    )
    n_i = ht // th
    n_j = wt // tw
    return pl.pallas_call(
        functools.partial(kernel, n_i=n_i, n_j=n_j),
        out_shape=jax.ShapeDtypeStruct((b, 2, ht, wt), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(b, n_i, n_j),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, 2, th, tw),
                lambda bb, i, j, *refs: (bb, 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((n_slots, 5, band_h, band_w), jnp.float32),
                pltpu.SemaphoreType.DMA((n_slots,)),
            ],
        ),
        interpret=interpret,
    )(mp)


def pad_for_solve(m_cf: jnp.ndarray, h: int, w: int, grid=None) -> jnp.ndarray:
    """Zero-pad the true [:h, :w] grid of channel-first M into the
    (8, 128)-haloed, grid-padded layout update_flow_fused_cf expects.
    One fused slice+pad — the only per-iteration HLO glue left on the
    hot path.  ``grid``: target (ht, wt) — usually the warp grid, so
    the solve output feeds the next warp iteration with zero re-padding;
    None falls back to the legacy (_TH_P, _TW_P) lattice.

    Round 5: the halo is CONSTANT ZERO (one XLA Pad op, 8.4 ms at the
    L0 chunk vs 31.2 ms for the edge-mode concatenation chain —
    scripts/probe_pads.py); the border-replicate semantics the window
    sums need are reproduced in VMEM by the solve kernel's
    fix_borders (idempotent, so an edge-padded mp is also accepted)."""
    if grid is None:
        ht = -(-h // _TH_P) * _TH_P
        wt = -(-w // _TW_P) * _TW_P
    else:
        ht, wt = grid
    return jnp.pad(
        m_cf[:, :, :h, :w],
        ((0, 0), (0, 0), (8, 8 + ht - h), (128, 128 + wt - w)),
    )


@functools.partial(jax.jit, static_argnames=("winsize", "gaussian_win", "interpret"))
def update_flow_fused(
    m: jnp.ndarray, winsize: int = 15, gaussian_win: bool = False, interpret: bool = False
) -> jnp.ndarray:
    """Fused Pallas window-average + solve: M (B,H,W,5) → flow (B,H,W,2).

    Matches ops.farneback.update_flow (replicate borders).
    """
    b, h, w, _ = m.shape
    mp = pad_for_solve(jnp.moveaxis(m, -1, 1), h, w)
    out = update_flow_fused_cf(mp, h, w, winsize, gaussian_win, interpret=interpret)
    return jnp.moveaxis(out[:, :, :h, :w], 1, -1)
