"""Differential tests for the glue-free channel-first flow driver.

ops/farneback_fused.py is the production TPU path; here it runs in
Pallas interpret mode on CPU against the exact XLA implementation
(ops/farneback.py), the same oracle the hardware kernels are verified
against in tests/test_pallas_kernels.py.  Also covers the banded
warp's clip-count contract (VERDICT round 1 §weak-2: high-shear flow
used to corrupt M planes *silently*) and the s_cap / bf16 knobs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from btcs_pnes_optical_flow_tpu.config import FarnebackParams
from btcs_pnes_optical_flow_tpu.ops.farneback import farneback_flow, update_matrices
from btcs_pnes_optical_flow_tpu.ops.farneback_fused import (
    farneback_flow_fused,
    farneback_flow_seq,
)
from btcs_pnes_optical_flow_tpu.ops.farneback_pallas import update_matrices_banded


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _textured_frames(rng, n, h, w, dx=3, dy=2):
    """Smoothly textured frames translating by (dx, dy) per step."""
    pad = n * max(abs(dx), abs(dy)) + 4
    base = rng.normal(0, 40, (h + 2 * pad, w + 2 * pad)).astype(np.float32)
    # cheap smoothing: two box passes
    k = np.ones(7) / 7.0
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, base)
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    base = base * 12 + 128
    out = np.empty((n, h, w), np.uint8)
    for i in range(n):
        y0 = pad - i * dy
        x0 = pad - i * dx
        out[i] = np.clip(base[y0 : y0 + h, x0 : x0 + w], 0, 255).astype(np.uint8)
    return out


def test_fused_pair_matches_exact(rng):
    frames = _textured_frames(rng, 3, 96, 160)
    ref = np.asarray(
        farneback_flow(
            jnp.asarray(frames[:-1]), jnp.asarray(frames[1:]),
            FarnebackParams(warp_engine="exact"),
        )
    )
    out, clips = farneback_flow_fused(
        jnp.asarray(frames[:-1]), jnp.asarray(frames[1:]), FarnebackParams(),
        return_clip=True, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
    assert int(np.asarray(clips).sum()) == 0


@pytest.mark.slow
def test_fused_seq_matches_pair(rng):
    # 64x96 (vs the full-pyramid anchor above at 96x160): this compares
    # two implementations of the same driver, so the smaller grid keeps
    # the assertion power while cutting interpret-mode cost ~3x — and
    # exercises the 128-wide warp-tile selection of warp_grid().
    frames = _textured_frames(rng, 4, 64, 96)
    pair = np.asarray(
        farneback_flow_fused(
            jnp.asarray(frames[:-1]), jnp.asarray(frames[1:]), FarnebackParams(),
            interpret=True,
        )
    )
    seq, clips = farneback_flow_seq(
        jnp.asarray(frames), FarnebackParams(), return_clip=True, interpret=True
    )
    # Sharing the per-frame poly expansions must not change the result.
    np.testing.assert_allclose(np.asarray(seq), pair, atol=1e-5)
    assert np.asarray(clips).shape == (3,)


@pytest.mark.slow
def test_fused_s_cap_and_bf16_epe(rng):
    frames = _textured_frames(rng, 3, 64, 96)
    p, c = jnp.asarray(frames[:-1]), jnp.asarray(frames[1:])
    ref = np.asarray(farneback_flow(p, c, FarnebackParams(warp_engine="exact")))
    capped, clips = farneback_flow_fused(
        p, c, FarnebackParams(warp_s_cap=6), return_clip=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(capped), ref, atol=1e-4)
    assert int(np.asarray(clips).sum()) == 0
    bf16 = np.asarray(
        farneback_flow_fused(p, c, FarnebackParams(warp_precision="bf16"), interpret=True)
    )
    # bf16 candidate MACs: well inside the 0.1 px reference contract.
    assert np.abs(bf16 - ref).max() < 0.05


def test_banded_clip_detects_high_shear(rng):
    """VERDICT round-1 adversarial case: rotation-like flow varying more
    than d_max across one tile must be *detected*, never silent."""
    h, w = 64, 512
    r0 = jnp.asarray(rng.normal(size=(1, h, w, 5)).astype(np.float32))
    r1 = jnp.asarray(rng.normal(size=(1, h, w, 5)).astype(np.float32))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # ±19 px horizontal deviation within a 32-row tile (> d_max_x=16)
    # and ±19 px vertical within a 256-col tile (> d_max_y=8).
    flow_rot = jnp.asarray(
        np.stack([(yy - h / 2) * 1.2, -(xx - w / 2) * 0.15], -1)[None]
    )
    m, clip = update_matrices_banded(r0, r1, flow_rot, return_clip=True, interpret=True)
    m_ref = np.asarray(update_matrices(r0, r1, flow_rot))
    corrupt = np.abs(np.asarray(m) - m_ref).max() > 1.0
    assert corrupt  # the banded approximation really is violated here...
    assert int(np.asarray(clip).sum()) > 0  # ...and the kernel reports it

    # Round 1's actual adversarial reproducer (~20 px spread across one
    # tile) sat just past the old symmetric d_max=4 and corrupted 22% of
    # pixels silently; the asymmetric window now covers it *exactly*.
    flow_mod = jnp.asarray(np.stack([(xx - w / 2) * 0.078, 0 * yy], -1)[None])
    m3, clip3 = update_matrices_banded(r0, r1, flow_mod, return_clip=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(m3), np.asarray(update_matrices(r0, r1, flow_mod)), atol=2e-5
    )
    assert int(np.asarray(clip3).sum()) == 0

    # A smooth flow stays exact and clip-free.
    flow_s = jnp.asarray(
        np.stack([2.0 + 0.002 * xx, -1.0 + 0.003 * yy], -1)[None]
    )
    m2, clip2 = update_matrices_banded(r0, r1, flow_s, return_clip=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(m2), np.asarray(update_matrices(r0, r1, flow_s)), atol=2e-5
    )
    assert int(np.asarray(clip2).sum()) == 0


def test_s_cap_overflow_is_counted(rng):
    h, w = 64, 512
    r0 = jnp.asarray(rng.normal(size=(1, h, w, 5)).astype(np.float32))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # ~7.7 px horizontal span across a 256-wide tile: exceeds s_cap=4.
    flow_w = jnp.asarray(np.stack([2.0 + 0.03 * xx, 0 * yy], -1)[None])
    _, clip = update_matrices_banded(
        r0, r0, flow_w, s_cap=4, return_clip=True, interpret=True
    )
    assert int(np.asarray(clip).sum()) > 0


@pytest.mark.slow
def test_fused_use_initial_flow(rng):
    frames = _textured_frames(rng, 2, 64, 96)
    p, c = jnp.asarray(frames[0]), jnp.asarray(frames[1])
    params = FarnebackParams(use_initial_flow=True)
    f0 = jnp.asarray(np.tile(np.array([3.0, 2.0], np.float32), (64, 96, 1)))
    ref = np.asarray(
        farneback_flow(p, c, FarnebackParams(use_initial_flow=True, warp_engine="exact"), f0)
    )
    out = np.asarray(farneback_flow_fused(p, c, params, f0, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)


@pytest.mark.slow
def test_dual_window_covers_bimodal_flow(rng):
    """Bucketed follow-up window: bimodal motion (static background +
    fast region spanning ~27 slots) exceeds the anchored span cap, but
    the top-K re-visit with residual-anchored bases must recover it
    exactly — and account every pixel it cannot (none here)."""

    import jax

    from btcs_pnes_optical_flow_tpu.ops.farneback_pallas import (
        pad_for_band,
        update_matrices_banded_cf,
        update_matrices_banded_tiles_cf,
        window_from_residuals,
    )

    B, H, W = 1, 64, 512
    r0 = rng.standard_normal((B, H, W, 5)).astype(np.float32)
    r1 = rng.standard_normal((B, H, W, 5)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    blob = np.exp(-(((xx - 256) / 60.0) ** 2 + ((yy - 32) / 20.0) ** 2))
    flow = np.stack([25.0 * blob, 3.0 * blob], -1)[None].astype(np.float32)

    d_y, d_x, cap = 8, 16, 14
    r0t = jnp.moveaxis(jnp.asarray(r0), -1, 1)
    ft = jnp.moveaxis(jnp.asarray(flow), -1, 1)
    r1p = pad_for_band(jnp.moveaxis(jnp.asarray(r1), -1, 1), H, W, d_y, d_x)
    m1, clip1, (bases1, smin1, rmdy, rmdx) = update_matrices_banded_cf(
        r0t, ft, r1p, H, W, d_max_y=d_y, d_max_x=d_x, s_cap=cap, interpret=True
    )
    assert int(np.asarray(clip1).sum()) > 0  # cap really is exceeded

    total = int(np.prod(clip1.shape))
    _, sel = jax.lax.top_k(clip1.reshape(total), total)  # full budget
    cur = window_from_residuals(
        rmdy.reshape(total), rmdx.reshape(total), d_y, d_x, 56, cap
    )
    prev = [(
        bases1[:, 1].reshape(total), bases1[:, 0].reshape(total),
        smin1.reshape(total), jnp.ones((total,), jnp.int32), cap,
    )]
    m2, clip2, _, _ = update_matrices_banded_tiles_cf(
        sel.astype(jnp.int32), m1, r0t, ft, r1p, H, W,
        cur_window=cur, prev_windows=prev,
        d_max_y=d_y, d_max_x=d_x, s_cap=cap, interpret=True,
    )
    assert int(np.asarray(clip2).sum()) == 0  # follow-up covers all
    m_ref = np.asarray(update_matrices(jnp.asarray(r0), jnp.asarray(r1), jnp.asarray(flow)))
    got = np.moveaxis(np.asarray(m2)[:, :, :H, :W], 1, -1)
    np.testing.assert_allclose(got, m_ref, atol=1e-4)


@pytest.mark.slow
def test_iter_schedule_and_coarse_reach_match_exact(rng):
    """Round-3 production knobs: a per-level iteration schedule and a
    tightened coarse-level candidate window must stay exact vs the XLA
    engine running the *same* schedule (the banded approximation is
    iteration-for-iteration equivalent whenever no candidate clips)."""
    frames = _textured_frames(rng, 3, 64, 96)
    p, c = jnp.asarray(frames[:-1]), jnp.asarray(frames[1:])
    params = FarnebackParams(
        iter_schedule=(3, 1), warp_coarse_reach=(4, 8, 8)
    )
    ref = np.asarray(
        farneback_flow(
            p, c,
            FarnebackParams(warp_engine="exact", iter_schedule=(3, 1)),
        )
    )
    out, clips = farneback_flow_fused(
        p, c, params, return_clip=True, interpret=True
    )
    assert int(np.asarray(clips).sum()) == 0
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
    # The schedule really changes the result vs the reference schedule
    # (guards against iters_at being ignored by either engine).
    ref_full = np.asarray(
        farneback_flow(p, c, FarnebackParams(warp_engine="exact"))
    )
    assert np.abs(ref_full - ref).max() > 1e-6


def test_roi_dispatch_matches_full_inside_roi(rng):
    """ROI-aware dispatch (roi_dispatch_params / roi_active_px): tiles
    outside ROI ⊕ halo are never dispatched, and the flow INSIDE the
    ROI bounding box must be bit-equal to the full-frame dispatch —
    the active box includes every iteration's winsize-window reach, so
    the boundary strips that see replicated/init values cannot
    influence any ROI pixel (VERDICT r4 #2)."""
    from btcs_pnes_optical_flow_tpu.ops.farneback_fused import roi_dispatch_params

    h, w = 192, 300
    frames = _textured_frames(rng, 3, h, w)
    p = FarnebackParams(
        levels=2, iterations=2, winsize=7, warp_d_max_y=4, warp_d_max_x=4,
        warp_s_cap=4, warp_base_max=24,
    )
    mask = np.zeros((h, w), bool)
    mask[80:110, 60:240] = True
    p_roi = roi_dispatch_params(p, h, w, mask)
    assert p_roi.roi_active_px is not None
    # The level-0 box must be a strict subset of the frame (otherwise
    # this test exercises nothing).
    y_lo, y_hi, x_lo, x_hi = p_roi.roi_active_px[0]
    assert y_lo > 0 or y_hi < h

    full, clips_f = farneback_flow_fused(
        jnp.asarray(frames[:-1]), jnp.asarray(frames[1:]), p,
        return_clip=True, interpret=True,
    )
    roi, clips_r = farneback_flow_fused(
        jnp.asarray(frames[:-1]), jnp.asarray(frames[1:]), p_roi,
        return_clip=True, interpret=True,
    )
    full = np.asarray(full)
    roi = np.asarray(roi)
    np.testing.assert_array_equal(
        roi[:, 80:110, 60:240], full[:, 80:110, 60:240]
    )
    # Flow everywhere stays finite (init outside the active box).
    assert np.isfinite(roi).all()
    assert int(np.asarray(clips_r).sum()) == 0, "clean translation must not clip"
