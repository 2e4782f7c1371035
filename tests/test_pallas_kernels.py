"""Pallas TPU kernel differential tests (skipped off-TPU).

The CPU suite exercises the exact XLA paths; these tests pin the Pallas
kernels (banded warp + fused poly expansion + fused window solve) to
the exact implementations on real TPU hardware.  Run manually with:
  BTCS_TPU_TESTS=1 python -m pytest tests/test_pallas_kernels.py -q
"""

import numpy as np
import pytest

import jax

if jax.default_backend() != "tpu":  # pragma: no cover
    pytest.skip("Pallas TPU kernels require TPU hardware", allow_module_level=True)

import jax.numpy as jnp

from btcs_pnes_optical_flow_tpu.ops import farneback as fb
from btcs_pnes_optical_flow_tpu.ops import farneback_pallas as fbp


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    B, H, W = 2, 96, 160
    r0 = jnp.asarray(rng.normal(size=(B, H, W, 5)).astype(np.float32))
    r1 = jnp.asarray(rng.normal(size=(B, H, W, 5)).astype(np.float32))
    yy, xx = np.mgrid[0:H, 0:W]
    fx = (2.0 + 2.5 * np.sin(xx / 80) + 1.8 * np.cos(yy / 60)).astype(np.float32)
    fy = (-1.0 + 2.2 * np.cos(xx / 100)).astype(np.float32)
    flow = jnp.asarray(np.broadcast_to(np.stack([fx, fy], -1), (B, H, W, 2)).copy())
    img = jnp.asarray(rng.normal(100, 30, (B, H, W)).astype(np.float32))
    return r0, r1, flow, img


def test_banded_um_matches_exact(data):
    r0, r1, flow, _ = data
    ref = np.asarray(fb.update_matrices(r0, r1, flow))
    out = np.asarray(fbp.update_matrices_banded(r0, r1, flow))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_poly_exp_fused_matches_exact(data):
    _, _, _, img = data
    ref = np.asarray(fb.poly_exp(img, 5, 1.2))
    out = np.asarray(fbp.poly_exp_fused(img, 5, 1.2))
    np.testing.assert_allclose(out, ref, atol=1e-3)


@pytest.mark.parametrize("gw", [False, True])
def test_update_flow_fused_matches_exact(data, gw, rng):
    B, H, W = 2, 96, 160
    a = rng.normal(size=(B, H, W))
    b2 = rng.normal(size=(B, H, W))
    c = rng.normal(size=(B, H, W))
    m = jnp.asarray(np.stack([a * a + 0.5, a * b2 * 0.3, b2 * b2 + 0.5, a * c, b2 * c], -1).astype(np.float32))
    ref = np.asarray(fb.update_flow(m, 15, gw))
    out = np.asarray(fbp.update_flow_fused(m, 15, gw))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_fused_480p_bench_geometry_vs_exact(rng):
    """Pin the production fused driver at the REAL bench geometry.

    480x640 is the clinical resolution (reference optical_flow.py:48-56
    params): the warp grid is 480x768 (15x3 tiles of 32x256 with a
    tail-tile column), the plane kernels pick their own zero-waste
    tiles, and the default multi-window dual passes run.  Round 2
    benchmarked this geometry but only differentially pinned <=96x160;
    a tiling/offset bug specific to tail tiles or the per-level grids
    would have been invisible.  clip==0 must imply allclose vs the
    exact XLA engine.
    """
    from btcs_pnes_optical_flow_tpu.ops.farneback_fused import farneback_flow_seq

    h, w = 480, 640
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)

    def tex(fx, fy):
        x2, y2 = xx + fx, yy + fy
        img = (
            np.sin(x2 / 13) * np.cos(y2 / 11)
            + 0.6 * np.sin(x2 / 5 + y2 / 7)
            + 0.3 * np.cos(x2 / 29 - y2 / 17)
        ) * 55 + 128
        return np.clip(img + rng.normal(0, 1, (h, w)), 0, 255).astype(np.float32)

    # Violent but band-feasible multi-modal motion: large smooth
    # translation + rotation-like shear, within-tile spread under
    # (d_max_y, d_max_x) and |mean| <= base_max.
    fx = 14.0 * np.sin(2 * np.pi * xx / 1900) + 6.0 * np.cos(2 * np.pi * yy / 1100)
    fy = -9.0 * np.cos(2 * np.pi * xx / 1700) + 4.0 * np.sin(2 * np.pi * yy / 900)
    f0 = tex(0, 0)
    f1 = tex(fx, fy)
    frames = jnp.asarray(np.stack([f0, f1, f0]))  # 2 pairs: forward + reverse

    from btcs_pnes_optical_flow_tpu.config import FarnebackParams

    p = FarnebackParams()
    fused, clips = farneback_flow_seq(frames, p, return_clip=True)
    fused = np.asarray(fused)
    clips = np.asarray(clips)
    assert clips.sum() == 0, f"banded warp clipped {clips} candidates at bench geometry"

    exact = np.asarray(fb.farneback_flow(frames[:-1], frames[1:]))
    diff = np.abs(fused - exact).max()
    assert diff < 1e-3, f"banded vs exact differ by {diff} px at 480p"


def test_fused_480p_bf16_epe_gate(rng):
    """EPE regression gate for the bf16 production-throughput config.

    warp_precision="bf16" runs the banded warp's candidate MACs in
    bfloat16 (fp32 accumulation) for ~2x VPU width (+7% end to end,
    docs/PERFORMANCE.md).  bench.py uses it as the production setting;
    this gate pins its accuracy cost at the real bench geometry so a
    kernel change that silently degrades bf16 (e.g. moving an
    accumulation into bf16) fails CI rather than the 0.1 px reference
    contract (reference optical_flow.py:48-56 params).
    """
    from btcs_pnes_optical_flow_tpu.config import FarnebackParams
    from btcs_pnes_optical_flow_tpu.ops.farneback_fused import farneback_flow_seq

    h, w = 480, 640
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)

    def tex(fx, fy):
        x2, y2 = xx + fx, yy + fy
        img = (
            np.sin(x2 / 13) * np.cos(y2 / 11)
            + 0.6 * np.sin(x2 / 5 + y2 / 7)
            + 0.3 * np.cos(x2 / 29 - y2 / 17)
        ) * 55 + 128
        return np.clip(img + rng.normal(0, 1, (h, w)), 0, 255).astype(np.float32)

    fx = 14.0 * np.sin(2 * np.pi * xx / 1900) + 6.0 * np.cos(2 * np.pi * yy / 1100)
    fy = -9.0 * np.cos(2 * np.pi * xx / 1700) + 4.0 * np.sin(2 * np.pi * yy / 900)
    frames = jnp.asarray(np.stack([tex(0, 0), tex(fx, fy)]))

    exact = np.asarray(fb.farneback_flow(frames[:-1], frames[1:]))
    got, clips = farneback_flow_seq(
        frames, FarnebackParams(warp_precision="bf16"), return_clip=True
    )
    assert int(np.asarray(clips).sum()) == 0
    epe = np.sqrt(((np.asarray(got) - exact) ** 2).sum(-1))
    # Measured ~1e-2 px; the reference contract is 0.1 px.  Gate at the
    # midpoint so drift is caught well before the contract breaks.
    assert epe.max() < 0.05, f"bf16 EPE {epe.max():.4f} px exceeds the 0.05 gate"


def test_tvl1_banded_matches_exact_on_tpu(rng):
    """Banded sampler end to end on hardware: TV-L1 with the banded
    Pallas warp vs the exact XLA gather warp (BASELINE config 5)."""
    from btcs_pnes_optical_flow_tpu.ops.tvl1 import TVL1Params, tvl1_flow

    h, w = 120, 160
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)

    def tex(sx, sy):
        x2, y2 = xx + sx, yy + sy
        img = (np.sin(x2 / 6) * np.cos(y2 / 7) + 0.6 * np.sin(x2 / 11 + y2 / 5)) * 55 + 128
        return np.clip(img, 0, 255).astype(np.float32)

    f0 = tex(0, 0)
    f1 = tex(2.3, -1.4)
    ref = np.asarray(
        tvl1_flow(jnp.asarray(f0), jnp.asarray(f1), TVL1Params(warp_engine="exact"))
    )
    got, clips = tvl1_flow(
        jnp.asarray(f0), jnp.asarray(f1), TVL1Params(warp_engine="banded"),
        return_clip=True,
    )
    assert int(np.asarray(clips)) == 0
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_warp_sample_banded_matches_xla_gather(rng):
    """The generic C-channel banded sampler vs jnp gather bilinear."""
    from btcs_pnes_optical_flow_tpu.ops.farneback_pallas import (
        pad_for_band,
        warp_grid,
        warp_sample_banded_cf,
    )
    from btcs_pnes_optical_flow_tpu.ops.tvl1 import _warp_bilinear

    b, c, h, w = 2, 3, 100, 150
    src = rng.normal(size=(b, c, h, w)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    u = (3.0 + 1.5 * np.sin(xx / 40) - 1.0 * np.cos(yy / 30)).astype(np.float32)
    v = (-2.0 + 1.2 * np.cos(xx / 50)).astype(np.float32)
    u = np.broadcast_to(u, (b, h, w)).copy()
    v = np.broadcast_to(v, (b, h, w)).copy()

    ht, wt, tw = warp_grid(h, w)
    srcp = pad_for_band(jnp.asarray(src), h, w, 8, 16, 56, tw=tw)
    flow_cf = jnp.pad(
        jnp.asarray(np.stack([u, v], 1)),
        ((0, 0), (0, 0), (0, ht - h), (0, wt - w)), mode="edge",
    )
    samples, clip = warp_sample_banded_cf(flow_cf, srcp, h, w, tw=tw)
    assert int(np.asarray(clip).sum()) == 0
    got = np.asarray(samples)[:, :, :h, :w]
    for ch in range(c):
        ref = np.asarray(
            _warp_bilinear(jnp.asarray(src[:, ch]), jnp.asarray(u), jnp.asarray(v))
        )
        np.testing.assert_allclose(got[:, ch], ref, atol=1e-5)


def test_full_flow_banded_vs_cv2(rng):
    import cv2

    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    def tex(sh):
        x2, y2 = xx + sh[0], yy + sh[1]
        img = (np.sin(x2 / 7) * np.cos(y2 / 9) + 0.5 * np.sin(x2 / 3 + y2 / 5)) * 60 + 128
        return np.clip(img + rng.normal(0, 1, (h, w)), 0, 255).astype(np.uint8)

    f0, f1 = tex((0, 0)), tex((1.7, -2.3))
    ref = cv2.calcOpticalFlowFarneback(f0, f1, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    mine = np.asarray(fb.farneback_flow(jnp.asarray(f0), jnp.asarray(f1)))
    epe = np.sqrt(((ref - mine) ** 2).sum(-1))
    assert epe.max() < 1e-3  # BASELINE target is < 0.1 px
