"""TV-L1 variational flow: convergence on known motion."""

import numpy as np
import pytest

import jax.numpy as jnp

from btcs_pnes_optical_flow_tpu.ops.tvl1 import TVL1Params, tvl1_flow


def _texture(h, w, rng, shift=(0.0, 0.0)):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    xx = xx + shift[0]
    yy = yy + shift[1]
    img = (np.sin(xx / 6) * np.cos(yy / 7) + 0.6 * np.sin(xx / 11 + yy / 5)) * 55 + 128
    return np.clip(img + rng.normal(0, 1, (h, w)), 0, 255).astype(np.uint8)


def test_tvl1_recovers_translation(rng):
    h, w = 64, 80
    f0 = _texture(h, w, rng)
    f1 = _texture(h, w, rng, shift=(1.2, -0.7))
    flow = np.asarray(tvl1_flow(jnp.asarray(f0), jnp.asarray(f1)))
    inner = flow[12:-12, 12:-12]
    # The warp convention: I1 sampled at x+flow matches I0 → flow ≈ -shift... or +
    epe_a = np.sqrt((inner[..., 0] + 1.2) ** 2 + (inner[..., 1] - 0.7) ** 2).mean()
    epe_b = np.sqrt((inner[..., 0] - 1.2) ** 2 + (inner[..., 1] + 0.7) ** 2).mean()
    assert min(epe_a, epe_b) < 0.25, (epe_a, epe_b)


def test_tvl1_zero_motion(rng):
    f0 = _texture(48, 56, rng)
    flow = np.asarray(tvl1_flow(jnp.asarray(f0), jnp.asarray(f0)))
    assert np.abs(flow).max() < 0.05


def test_tvl1_batched(rng):
    f0 = _texture(48, 56, rng)
    f1 = _texture(48, 56, rng, shift=(0.8, 0.4))
    single = np.asarray(tvl1_flow(jnp.asarray(f0), jnp.asarray(f1)))
    batched = np.asarray(
        tvl1_flow(jnp.asarray(np.stack([f0, f0])), jnp.asarray(np.stack([f1, f1])))
    )
    np.testing.assert_allclose(batched[0], single, atol=1e-4)
    np.testing.assert_allclose(batched[1], single, atol=1e-4)
