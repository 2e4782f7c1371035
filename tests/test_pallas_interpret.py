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


def _banded_cf_case(rng, h=120, w=500, b=2, dtype=None, precision="fp32"):
    """Shared fixture geometry for the kept kernel config space
    (VERDICT r4 #8): n_i=4, n_j=2 so both merge axes exist, band in
    ``dtype`` (None = f32).  Reach shrunk to (4, 4)/s_cap 4 — the full
    (8, 16)/34-slot kernel is ~900 static slot instances, too big for
    the interpreter; the merged-tile and bf16-band plumbing under test
    is reach-independent."""
    ht, wt, tw = fbp.warp_grid(h, w)
    r0 = jnp.asarray(rng.normal(0, 1, (b, 5, ht, wt)).astype(np.float32))
    flow = jnp.asarray(
        (rng.normal(0, 1.5, (b, 2, ht, wt)) + rng.normal(0, 3, (b, 2, 1, 1)))
        .astype(np.float32)
    )
    r1p = fbp.pad_for_band(r0, h, w, 4, 4, 24, tw=tw, dtype=dtype)
    m, clip, aux = fbp.update_matrices_banded_cf(
        r0, flow, r1p, h, w, d_max_y=4, d_max_x=4, base_max=24, s_cap=4,
        precision=precision, tw=tw, interpret=True
    )
    return [np.asarray(x) for x in (m, clip, *aux)]


def test_tps_merged_matches_single_interpret(rng, monkeypatch):
    """warp_tiles_per_step != (1,1) (the kept, measured-dead-end merged
    path, farneback_pallas.py:174) must equal the shipped (1,1) kernel:
    clip/anchor scalars bit-for-bit, M to FMA-contraction roundoff.
    Keeps the config space from rotting silently (VERDICT r4 weak #3)."""
    ref = _banded_cf_case(np.random.default_rng(0))

    monkeypatch.setattr(fbp, "warp_tiles_per_step", lambda *a, **k: (2, 2))
    got = _banded_cf_case(np.random.default_rng(0))

    np.testing.assert_allclose(got[0], ref[0], atol=1e-4)  # M
    for g, r in zip(got[1:], ref[1:]):  # clip, bases, smin, rmdy, rmdx
        np.testing.assert_array_equal(g, r)


def test_bf16_band_storage_matches_f32_interpret():
    """bf16 band storage (pad_for_band(dtype=bf16) + in-kernel upcast,
    the kept round-4 dead end) must sample identically to f32 bands
    when the MACs run at bf16 precision — the equality
    scripts/probe_tps_ab.py measured on TPU, now gated on the CPU
    suite (VERDICT r4 #8)."""
    ref = _banded_cf_case(np.random.default_rng(1), precision="bf16")
    got = _banded_cf_case(
        np.random.default_rng(1), dtype=jnp.bfloat16, precision="bf16"
    )
    np.testing.assert_allclose(got[0], ref[0], atol=1e-4)  # M
    for g, r in zip(got[1:], ref[1:]):
        np.testing.assert_array_equal(g, r)
