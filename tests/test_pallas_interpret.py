"""Pallas kernel logic under the interpreter (runs on the CPU suite).

The interpreter executes the same kernel Python (DMAs become copies,
rolls become jnp.roll), so the banded-warp geometry, the predicated
candidate accumulation, and the fused halo kernels get differential
coverage without TPU hardware (SURVEY.md §5: "Pallas kernels validated
under interpret mode").  Shapes stay tiny — the interpreter is slow.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from btcs_pnes_optical_flow_tpu.ops import farneback as fb
from btcs_pnes_optical_flow_tpu.ops import farneback_pallas as fbp


def test_banded_um_interpret_matches_exact(rng):
    b, h, w = 1, 40, 300
    r0 = jnp.asarray(rng.normal(size=(b, h, w, 5)).astype(np.float32))
    r1 = jnp.asarray(rng.normal(size=(b, h, w, 5)).astype(np.float32))
    yy, xx = np.mgrid[0:h, 0:w]
    fx = (1.5 + 1.2 * np.sin(xx / 60)).astype(np.float32)
    fy = (-0.8 + 0.9 * np.cos(yy / 25)).astype(np.float32)
    flow = jnp.asarray(np.broadcast_to(np.stack([fx, fy], -1), (b, h, w, 2)).copy())
    ref = np.asarray(fb.update_matrices(r0, r1, flow))
    out = np.asarray(fbp.update_matrices_banded(r0, r1, flow, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_poly_exp_interpret_matches_exact(rng):
    img = jnp.asarray(rng.normal(100, 30, (1, 40, 300)).astype(np.float32))
    ref = np.asarray(fb.poly_exp(img, 5, 1.2))
    out = np.asarray(fbp.poly_exp_fused(img, 5, 1.2, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_update_flow_interpret_matches_exact(rng):
    b, h, w = 1, 40, 300
    a = rng.normal(size=(b, h, w))
    b2 = rng.normal(size=(b, h, w))
    c = rng.normal(size=(b, h, w))
    m = jnp.asarray(
        np.stack([a * a + 0.5, a * b2 * 0.3, b2 * b2 + 0.5, a * c, b2 * c], -1).astype(np.float32)
    )
    ref = np.asarray(fb.update_flow(m, 15, False))
    out = np.asarray(fbp.update_flow_fused(m, 15, False, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4)
