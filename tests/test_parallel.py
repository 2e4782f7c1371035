"""Multi-chip tests on the 8-virtual-device CPU mesh (SURVEY.md §4.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from btcs_pnes_optical_flow_tpu.config import FarnebackParams, PCAParams
from btcs_pnes_optical_flow_tpu.ops import cvx
from btcs_pnes_optical_flow_tpu.parallel import cohort, halo, mesh as mesh_lib


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 host devices"
    return mesh_lib.make_mesh(8, axes=("data",))


@pytest.fixture(scope="module")
def mesh_spatial():
    return mesh_lib.make_mesh(4, axes=("spatial",))


def test_halo_box_sum_matches_unsharded(mesh_spatial, rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 64, 40)), jnp.float32)
    ref = np.asarray(cvx.box_sum_replicate(x, 15))
    xs = jax.device_put(x, NamedSharding(mesh_spatial, P(None, None, "spatial", None)))
    out = np.asarray(halo.box_sum_replicate_sharded(xs, 15, mesh_spatial))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


def test_halo_sep_corr_matches_unsharded(mesh_spatial, rng):
    from btcs_pnes_optical_flow_tpu.ops.cvx import gaussian_kernel

    k = gaussian_kernel(11, 1.2)
    x = jnp.asarray(rng.normal(size=(3, 48, 56)), jnp.float32)
    ref = np.asarray(cvx.sep_corr_replicate(x, k, k))
    xs = jax.device_put(x, NamedSharding(mesh_spatial, P(None, "spatial", None)))
    out = np.asarray(halo.sep_corr_replicate_sharded(xs, k, k, mesh_spatial))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_cohort_step_sharded_matches_single(mesh8, rng):
    """8-video cohort sharded across 8 devices == unsharded result."""
    v, b, h, w = 8, 3, 40, 48
    prev = rng.integers(0, 255, (v, b, h, w)).astype(np.uint8)
    curr = np.clip(prev.astype(int) + rng.integers(-20, 20, prev.shape), 0, 255).astype(np.uint8)
    theta = rng.normal(size=(v, b))
    ex = np.stack([np.cos(theta), np.sin(theta)], axis=-1).astype(np.float32)
    ey = np.stack([-np.sin(theta), np.cos(theta)], axis=-1).astype(np.float32)
    masks = np.zeros((1, h, w), bool)
    masks[0, 8:32, 8:40] = True
    t_valid = np.ones((v, b), bool)

    params = FarnebackParams(levels=1, winsize=7, poly_n=5)
    pca = PCAParams(win_sec=0.1, step_sec=0.05, max_finite_runs=4)

    args = (jnp.asarray(prev), jnp.asarray(curr), jnp.asarray(ex), jnp.asarray(ey),
            jnp.asarray(masks), jnp.asarray(t_valid))
    ref = cohort.cohort_step(*args, params, pca)

    sharded_args = cohort.shard_cohort_inputs(mesh8, *args)
    out = cohort.cohort_step(*sharded_args, params, pca)

    np.testing.assert_allclose(np.asarray(out.vx), np.asarray(ref.vx), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.cohort_mean_mag), np.asarray(ref.cohort_mean_mag), rtol=1e-5)
    # The sharded run really is distributed over 8 devices.
    assert len(out.vx.sharding.device_set) == 8
