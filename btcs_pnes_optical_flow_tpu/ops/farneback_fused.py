"""Glue-free Farnebäck driver: the whole pyramid loop in kernel layout.

The round-1 profiling methodology (scripts/profile_inprog.py) showed the
banded Pallas kernels themselves are fast, but the HLO *around* them —
a moveaxis/pad/slice chain on every update_matrices / update_flow call,
executed 3× per pyramid level — cost more than half of the end-to-end
flow time (~360 of 673 ms at the 480p/chunk-256 bench point).  This
driver keeps every array in the kernels' native channel-first layout
across the whole level loop:

- poly_exp_fused_cf writes (B, 5, ht, wt) tile-padded planes that
  update_matrices_banded_cf reads *directly* (tile sizes are chosen so
  the geometries nest);
- the big band padding of the warped-from coefficients is built once
  per level (pad_for_band) and reused by all iterations;
- update_flow_fused_cf's output geometry is itself a valid warp-kernel
  input, so the iteration loop's only remaining HLO is one fused
  slice+pad of M (pad_for_solve) per iteration;
- flow transposes to channel-last exactly once, at the very end.

It also hosts the frame-*sequence* entry point: for consecutive video
pairs, frame i is `curr` of pair i-1 and `prev` of pair i (reference
hot loop optical_flow.py:222-250 carries prev_gray forward the same
way), so the polynomial expansion and level images of interior frames
are shared between the two pairs that use them — poly work per chunk
drops ~2×.  The banded warp kernel reads pair b's warped-from planes
from the stacked (N+1)-frame array at batch index b+1 (r1_offset).

Every update_matrices call returns per-tile clip counts (pixels whose
displacement strayed past warp_d_max_y/x or warp_s_cap of the tile mean —
where the banded approximation breaks); the drivers aggregate them per
pair so callers can detect and re-run affected pairs via the exact
path instead of silently using corrupt flow.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from btcs_pnes_optical_flow_tpu.config import FarnebackParams
from btcs_pnes_optical_flow_tpu.ops import cvx
from btcs_pnes_optical_flow_tpu.ops.farneback import _level_image
from btcs_pnes_optical_flow_tpu.ops.farneback_pallas import (
    _TH,
    pad_for_band,
    pad_for_solve,
    poly_exp_fused_cf,
    update_flow_fused_cf,
    update_matrices_banded_cf,
    update_matrices_banded_tiles_cf,
    warp_grid,
    window_from_residuals,
)


def fused_supported(params: FarnebackParams) -> bool:
    """Static-parameter envelope of the fused Pallas kernels."""
    return params.poly_n <= 8 and params.winsize // 2 <= 8


def _init_flow_cf(
    n: int, hk: int, wk: int, ht: int, wt: int, scale: float,
    flow0: Optional[jnp.ndarray],
) -> jnp.ndarray:
    if flow0 is None:
        return jnp.zeros((n, 2, ht, wt), jnp.float32)
    f = cvx.resize_bilinear(jnp.moveaxis(flow0, -1, 1).astype(jnp.float32), hk, wk)
    return jnp.pad(f * scale, ((0, 0), (0, 0), (0, ht - hk), (0, wt - wk)), mode="edge")


def _fused_level_loop(polys_of_level, n: int, h: int, w: int,
                      params: FarnebackParams, flow0, interpret: bool):
    """Shared pyramid loop.

    polys_of_level(k, hk, wk, grid, tw_k) -> (r0_cf, r1p, r1_offset):
    channel-first coefficient planes for level k (true grid [:hk, :wk],
    padded to ``grid`` = the level's warp lattice) and the band-padded
    warped-from planes.

    Every level picks its own zero-waste kernel geometry (warp_grid):
    at 480p the legacy fixed (32, 256) warp / (64, 512) plane lattices
    computed 1.2x-1.7x the true pixel count in grid padding — the
    whole 480p-vs-1080p pixel-efficiency gap of round 2.
    """
    klev = params.num_levels(h, w)
    inv_scale = 1.0 / params.pyr_scale
    flow = None
    hk_prev = wk_prev = None
    clip_total = jnp.zeros((n,), jnp.int32)
    for k in range(klev, -1, -1):
        hk, wk = params.level_size(h, w, k)
        ht, wt, tw_k = warp_grid(hk, wk)
        if k >= 1 and params.warp_coarse_tw is not None:
            twc = params.warp_coarse_tw
            wtc = -(-wk // twc) * twc
            if wtc < wt:  # only when it actually shrinks the grid
                tw_k, wt = twc, wtc
        if k >= 1 and params.warp_coarse_reach is not None:
            d_y, d_x, s_cap = params.warp_coarse_reach
        else:
            d_y, d_x, s_cap = (
                params.warp_d_max_y, params.warp_d_max_x, params.warp_s_cap
            )
        r0_cf, r1p, r1_offset = polys_of_level(k, hk, wk, (ht, wt), tw_k, d_y, d_x)

        if flow is None:
            f0 = flow0 if params.use_initial_flow else None
            flow = _init_flow_cf(n, hk, wk, ht, wt, params.pyr_scale**k, f0)
        else:
            # Matmul-form resize: bit-equal to the gather formulation
            # at HIGHEST precision (cvx.resize_bilinear_mm docstring),
            # measured faster at this batch, and removes a general
            # gather from the hot program.  Flow is finite everywhere
            # by construction (the mm form's NaN caveat is moot).
            fr = cvx.resize_bilinear_mm(flow[:, :, :hk_prev, :wk_prev], hk, wk)
            flow = jnp.pad(
                fr * inv_scale,
                ((0, 0), (0, 0), (0, ht - hk), (0, wt - wk)),
                mode="edge",
            )

        # ROI-aware dispatch (config.FarnebackParams.roi_active_px):
        # quantize this level's active pixel box to its warp lattice;
        # warp/solve/dual passes run compact over the active subgrid
        # and the rest of the grid keeps the level's init flow (finite;
        # never consumed by the ROI reduction — the box includes the
        # full analysis halo).
        act = None
        if params.roi_active_px is not None and k < len(params.roi_active_px):
            y_lo, y_hi, x_lo, x_hi = params.roi_active_px[k]
            ai0 = min(max(0, y_lo // _TH), ht // _TH - 1)
            ai1 = max(ai0 + 1, min(ht // _TH, -(-y_hi // _TH)))
            aj0 = min(max(0, x_lo // tw_k), wt // tw_k - 1)
            aj1 = max(aj0 + 1, min(wt // tw_k, -(-x_hi // tw_k)))
            if (ai1 - ai0) * (aj1 - aj0) < (ht // _TH) * (wt // tw_k):
                act = (ai0, ai1, aj0, aj1)
        if act is not None:
            ai0, ai1, aj0, aj1 = act
            flow_full = flow
            flow = flow[:, :, ai0 * _TH : ai1 * _TH, aj0 * tw_k : aj1 * tw_k]
            # True-image extent inside the compact subgrid (solve
            # border replicate starts there).
            hk_s = min(hk, ai1 * _TH) - ai0 * _TH
            wk_s = min(wk, aj1 * tw_k) - aj0 * tw_k
            grid_s = ((ai1 - ai0) * _TH, (aj1 - aj0) * tw_k)
            n_i = ai1 - ai0
            n_j = aj1 - aj0
        else:
            hk_s, wk_s, grid_s = hk, wk, (ht, wt)
            n_i = ht // _TH
            n_j = wt // tw_k
        n_s_full = 2 * d_x + 2
        n_s1 = min(s_cap, n_s_full) if s_cap else n_s_full
        n_passes = params.warp_dual_passes if params.warp_dual_frac > 0 else 0
        for _ in range(params.iters_at(k)):
            m, clip, (bases1, smin1, rmdy, rmdx) = update_matrices_banded_cf(
                r0_cf, flow, r1p, hk, wk,
                d_max_y=d_y,
                d_max_x=d_x,
                base_max=params.warp_base_max,
                s_cap=s_cap,
                precision=params.warp_precision,
                r1_offset=r1_offset,
                tw=tw_k,
                n_slots=params.warp_dma_slots,
                active=act,
                ghost=True,
                interpret=interpret,
            )
            if n_passes:
                # Bucketed follow-up windows: each pass re-visits the
                # top-K residual tiles with a fresh window anchored at
                # the pixels every previous window missed, merging in
                # place (update_matrices_banded_tiles_cf).  Per-tile
                # residual counts/anchors chain through kernel scalar
                # outputs — no coverage planes.
                total_tiles = n * n_i * n_j
                kk = min(
                    total_tiles, max(1, math.ceil(total_tiles * params.warp_dual_frac))
                )
                u0 = clip.reshape(total_tiles)
                mdy0 = rmdy.reshape(total_tiles)
                mdx0 = rmdx.reshape(total_tiles)

                def run_passes(args):
                    m, u, mdy, mdx = args
                    prev = [(
                        bases1[:, 1].reshape(total_tiles),
                        bases1[:, 0].reshape(total_tiles),
                        smin1.reshape(total_tiles),
                        jnp.ones((total_tiles,), jnp.int32),
                        n_s1,
                    )]
                    for _p in range(n_passes):
                        _, sel = jax.lax.top_k(u, kk)
                        sel = sel.astype(jnp.int32)
                        cur = window_from_residuals(
                            mdy, mdx,
                            d_y, d_x,
                            params.warp_base_max, n_s1,
                        )
                        m, clip_k, rmdy_k, rmdx_k = update_matrices_banded_tiles_cf(
                            sel, m, r0_cf, flow, r1p, hk, wk,
                            cur_window=cur,
                            prev_windows=prev,
                            d_max_y=d_y,
                            d_max_x=d_x,
                            base_max=params.warp_base_max,
                            s_cap=n_s1,
                            precision=params.warp_precision,
                            r1_offset=r1_offset,
                            tw=tw_k,
                            active=act,
                            ghost=True,
                            interpret=interpret,
                        )
                        u = u.at[sel].set(clip_k)
                        mdy = mdy.at[sel].set(rmdy_k)
                        mdx = mdx.at[sel].set(rmdx_k)
                        prev.append((
                            cur[0], cur[1], cur[2],
                            jnp.zeros((total_tiles,), jnp.int32).at[sel].set(1),
                            n_s1,
                        ))
                    return m, jnp.sum(u.reshape(n, n_i * n_j), axis=1)

                def skip_passes(args):
                    m, u, _mdy, _mdx = args
                    return m, jnp.sum(u.reshape(n, n_i * n_j), axis=1)

                if interpret:
                    # Interpret mode always runs the passes (lax.cond's
                    # kernels-in-branches path is hardware-only here,
                    # and tests must cover the pass machinery).
                    m, clip_pair = run_passes((m, u0, mdy0, mdx0))
                else:
                    # On the clean-envelope path (every recorded bench:
                    # zero clips) the passes are numerically identity
                    # (a follow-up window on a fully-covered tile keeps
                    # m1 everywhere), so the top_k + K-tile kernels are
                    # dispatched only when something actually clipped.
                    m, clip_pair = jax.lax.cond(
                        jnp.sum(u0) > 0, run_passes, skip_passes,
                        (m, u0, mdy0, mdx0),
                    )
            else:
                clip_pair = jnp.sum(clip, axis=(1, 2))
            clip_total = clip_total + clip_pair
            # The warp wrote M with a one-tile ghost ring (ghost=True),
            # so the solve DMAs its haloed bands straight out of M —
            # the per-iteration pad_for_solve copy (the single largest
            # row of the round-5 per-op ledger, ~149 ms/chunk over all
            # levels) no longer exists on this path.
            flow = update_flow_fused_cf(
                m, hk_s, wk_s, params.winsize, params.gaussian_win,
                halo=(_TH, tw_k), interpret=interpret
            )
        if act is not None:
            # Re-embed the refined subgrid into the full-lattice flow
            # (the rest keeps the init): the next level's upsample and
            # the final output read a full grid.
            flow = jax.lax.dynamic_update_slice(
                flow_full, flow, (0, 0, ai0 * _TH, aj0 * tw_k)
            )
        hk_prev, wk_prev = hk, wk

    out = jnp.moveaxis(flow[:, :, :h, :w], 1, -1)
    return out, clip_total


def _transposed_params(params: FarnebackParams) -> FarnebackParams:
    """Swap the per-axis warp reach for the (W, H)-layout run.

    In transposed arrays the kernel's sublane candidate axis carries
    image-x displacement and the lane axis image-y, so the configured
    image-semantic reaches (warp_d_max_y/x) swap roles.
    """
    import dataclasses

    cr = params.warp_coarse_reach
    rap = params.roi_active_px
    return dataclasses.replace(
        params,
        warp_layout="native",
        warp_d_max_y=params.warp_d_max_x,
        warp_d_max_x=params.warp_d_max_y,
        warp_coarse_reach=(cr[1], cr[0], cr[2]) if cr is not None else None,
        roi_active_px=tuple(
            (x_lo, x_hi, y_lo, y_hi) for (y_lo, y_hi, x_lo, x_hi) in rap
        ) if rap is not None else None,
    )


def roi_dispatch_params(
    params: FarnebackParams, h: int, w: int, roi_masks
) -> FarnebackParams:
    """FarnebackParams with per-level ROI-active boxes (VERDICT r4 #2).

    The reference consumes flow ONLY inside the ROI polygon
    (optical_flow.py:185-187, np.nanmean over roi_mask), so tiles that
    cannot influence any ROI pixel need not be dispatched.  Flow at a
    pixel depends on a bounded neighborhood: each solve iteration
    extends influence by winsize//2 (the window sum), and each
    coarser level feeds the finer level's init through a bilinear
    resize (2 px support).  Working fine→coarse:

        need(0)  = ROI bounding box
        box(k)   = need(k) ⊕ (iters_at(k)·(winsize//2) + 10)
        need(k+1)= box(k)/2 ⊕ 2

    box(k) is stored in ``roi_active_px`` (image y/x order; the
    transposed driver swaps it) and quantized to each level's warp
    lattice at trace time.  EPE inside the ROI is unchanged — the
    boundary strips that see replicated/init values lie outside
    need(k) by construction (differentially gated in
    tests/test_fused_driver.py).

    roi_masks: (R, H, W) or (H, W) bool array-like.
    """
    import dataclasses

    m = np.asarray(roi_masks)
    if m.ndim == 2:
        m = m[None]
    any_mask = m.any(axis=0)
    ys, xs = np.nonzero(any_mask)
    if ys.size == 0:
        return params
    need = (int(ys.min()), int(ys.max()) + 1, int(xs.min()), int(xs.max()) + 1)
    boxes = []
    for k in range(params.num_levels(h, w) + 1):
        halo = params.iters_at(k) * (params.winsize // 2) + 10
        box = (need[0] - halo, need[1] + halo, need[2] - halo, need[3] + halo)
        boxes.append(box)
        need = (
            box[0] // 2 - 2, -(-box[1] // 2) + 2,
            box[2] // 2 - 2, -(-box[3] // 2) + 2,
        )
    return dataclasses.replace(params, roi_active_px=tuple(boxes))


def _band_dtype(params: FarnebackParams):
    """Band storage dtype — always None (keep f32).

    bf16 band storage (half the per-tile DMA bytes; the kernels upcast
    after the copy and re-round at the MAC inputs, so sampled values
    are bit-identical to f32 bands) MEASURED SLOWER on v5e:
    51.68 vs 49.51 ms per L0 sweep (scripts/probe_tps_ab.py) — the
    multi-slot pipeline already hides the band DMA entirely, so halving
    its bytes buys nothing and the in-kernel upcast adds VPU work.  The
    capability stays (pad_for_band(dtype=...) + kernels handle bf16
    bands, EPE-gated on TPU) for geometries where DMA is exposed."""
    del params
    return None


def _pairs_impl(prev, curr, params, flow0, interpret):
    n, h, w = prev.shape
    p_f = prev.astype(jnp.float32)
    c_f = curr.astype(jnp.float32)

    def polys_of_level(k, hk, wk, grid, tw_k, d_y, d_x):
        i0, _, _ = _level_image(p_f, k, params, h, w)
        i1, _, _ = _level_image(c_f, k, params, h, w)
        r0 = poly_exp_fused_cf(
            i0, params.poly_n, params.poly_sigma, grid=grid,
            n_slots=params.warp_dma_slots, interpret=interpret
        )
        r1 = poly_exp_fused_cf(
            i1, params.poly_n, params.poly_sigma, grid=grid,
            n_slots=params.warp_dma_slots, interpret=interpret
        )
        r1p = pad_for_band(
            r1, hk, wk, d_y, d_x, params.warp_base_max, tw=tw_k,
            dtype=_band_dtype(params),
        )
        return r0, r1p, 0

    return _fused_level_loop(polys_of_level, n, h, w, params, flow0, interpret)


def _seq_impl(frames, params, flow0, interpret):
    n1, h, w = frames.shape
    n = n1 - 1
    f_all = frames.astype(jnp.float32)

    def polys_of_level(k, hk, wk, grid, tw_k, d_y, d_x):
        lv, _, _ = _level_image(f_all, k, params, h, w)
        p = poly_exp_fused_cf(
            lv, params.poly_n, params.poly_sigma, grid=grid,
            n_slots=params.warp_dma_slots, interpret=interpret
        )
        # Pair b reads r0 from stacked frame b (block specs only touch
        # the first n frames) and its warp band from frame b+1.
        r1p = pad_for_band(
            p, hk, wk, d_y, d_x, params.warp_base_max, tw=tw_k,
            dtype=_band_dtype(params),
        )
        return p, r1p, 1

    return _fused_level_loop(polys_of_level, n, h, w, params, flow0, interpret)


def _flow_t(flow: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """(B, H, W, 2) (dx, dy) <-> (B, W, H, 2) (dy, dx) — an involution."""
    if flow is None:
        return None
    return jnp.swapaxes(flow, -3, -2)[..., ::-1]


@functools.partial(jax.jit, static_argnames=("params", "return_clip", "interpret"))
def farneback_flow_fused(
    prev: jnp.ndarray,
    curr: jnp.ndarray,
    params: FarnebackParams = FarnebackParams(),
    flow0: Optional[jnp.ndarray] = None,
    return_clip: bool = False,
    interpret: bool = False,
):
    """Channel-first fused flow for independent (prev, curr) pairs.

    prev, curr: (B, H, W); returns flow (B, H, W, 2) — plus per-pair
    clip counts (B,) int32 when return_clip is set (0 = banded warp was
    exact vs the gather path; >0 = that pair needs a wider window /
    the exact engine).

    With params.warp_layout == "transposed" (default) the whole pyramid
    runs on (W, H) arrays — Farnebäck is exactly x<->y symmetric, so
    only the output flow needs the spatial+channel swap back; see
    config.FarnebackParams.warp_layout for why this is the fast layout.
    """
    squeeze = prev.ndim == 2
    if squeeze:
        prev, curr = prev[None], curr[None]
        if flow0 is not None and flow0.ndim == 3:
            flow0 = flow0[None]
    if params.warp_layout == "transposed":
        out, clips = _pairs_impl(
            jnp.swapaxes(prev, -1, -2),
            jnp.swapaxes(curr, -1, -2),
            _transposed_params(params),
            _flow_t(flow0),
            interpret,
        )
        out = _flow_t(out)
    else:
        out, clips = _pairs_impl(prev, curr, params, flow0, interpret)
    if squeeze:
        out = out[0]
        clips = clips[0]
    return (out, clips) if return_clip else out


@functools.partial(jax.jit, static_argnames=("params", "return_clip", "interpret"))
def farneback_flow_seq(
    frames: jnp.ndarray,
    params: FarnebackParams = FarnebackParams(),
    flow0: Optional[jnp.ndarray] = None,
    return_clip: bool = False,
    interpret: bool = False,
):
    """Flow for N consecutive pairs of an (N+1, H, W) frame sequence.

    Returns flow (N, H, W, 2) where flow[i] is the displacement field
    from frames[i] to frames[i+1] — identical to farneback_flow(
    frames[:-1], frames[1:]) but with the level images and polynomial
    expansions of interior frames computed once instead of twice (each
    interior frame is `curr` of one pair and `prev` of the next,
    mirroring the reference's carried prev_gray, optical_flow.py:242).
    Honors params.warp_layout like farneback_flow_fused.
    """
    if params.warp_layout == "transposed":
        out, clips = _seq_impl(
            jnp.swapaxes(frames, -1, -2),
            _transposed_params(params),
            _flow_t(flow0),
            interpret,
        )
        out = _flow_t(out)
    else:
        out, clips = _seq_impl(frames, params, flow0, interpret)
    return (out, clips) if return_clip else out
