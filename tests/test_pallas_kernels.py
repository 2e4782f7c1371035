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
