"""Cohort-scale execution: many recordings sharded across a mesh.

BASELINE.json config 4: "Cohort batch: 32 seizure videos vmapped /
sharded across a v5e-8 mesh, per-video metric tables".  The cohort axis
is pure data parallelism: each chip owns a slice of the videos, the
per-video pipeline (flow → PC1) is vmapped inside the shard, and
cohort-level reductions (summary statistics) become XLA all-reduces
over ICI.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from btcs_pnes_optical_flow_tpu.config import FarnebackParams, PCAParams
from btcs_pnes_optical_flow_tpu.models.flow import roi_body_flow
from btcs_pnes_optical_flow_tpu.models.pc1 import pc1_from_flow


class CohortStep(NamedTuple):
    vx: jnp.ndarray      # (V, B, R)
    vy: jnp.ndarray
    mag: jnp.ndarray
    pc1: jnp.ndarray     # (V, R, B+1)
    cohort_mean_mag: jnp.ndarray  # (R,) — cohort all-reduce


@functools.partial(jax.jit, static_argnames=("flow_params", "pca_params"))
def cohort_step(
    prev: jnp.ndarray,   # (V, B, H, W) frame-pair batches per video
    curr: jnp.ndarray,
    ex: jnp.ndarray,     # (V, B, 2)
    ey: jnp.ndarray,
    masks: jnp.ndarray,  # (R, H, W)
    t_valid: jnp.ndarray,  # (V, B) bool — which pairs are live
    flow_params: FarnebackParams = FarnebackParams(),
    pca_params: PCAParams = PCAParams(),
) -> CohortStep:
    """One fused cohort step: flow features + dynamic PC1 per video.

    All inputs may be sharded on the leading (video) axis; everything
    below is batched code, so XLA partitions it without any manual
    collectives — except the cohort reduction at the end, which lowers
    to an all-reduce across the mesh.
    """

    def one_video(p, c, e1, e2, tv):
        feats = roi_body_flow(p, c, e1, e2, masks, flow_params)
        vx = jnp.where(tv[:, None], feats.vx, jnp.nan)
        vy = jnp.where(tv[:, None], feats.vy, jnp.nan)
        mag = jnp.where(tv[:, None], feats.mag, jnp.nan)
        # Frame 0 has no pair (reference semantics): prepend NaN.
        nan1 = jnp.full((1, vx.shape[1]), jnp.nan, vx.dtype)
        vx_t = jnp.concatenate([nan1, vx]).T  # (R, B+1)
        vy_t = jnp.concatenate([nan1, vy]).T
        pc1 = jax.vmap(lambda a, b: pc1_from_flow(a, b, pca_params))(vx_t, vy_t)
        return vx, vy, mag, pc1

    vx, vy, mag, pc1 = jax.vmap(one_video)(prev, curr, ex, ey, t_valid)
    cohort_mean = jnp.nanmean(mag, axis=(0, 1))
    return CohortStep(vx=vx, vy=vy, mag=mag, pc1=pc1, cohort_mean_mag=cohort_mean)


def shard_cohort_inputs(mesh: Mesh, prev, curr, ex, ey, masks, t_valid):
    """Place cohort inputs: video axis sharded, masks replicated."""
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def put(x, s):
        return jax.device_put(x, s)

    return (
        put(prev, NamedSharding(mesh, P("data", None, None, None))),
        put(curr, NamedSharding(mesh, P("data", None, None, None))),
        put(ex, NamedSharding(mesh, P("data", None, None))),
        put(ey, NamedSharding(mesh, P("data", None, None))),
        put(masks, repl),
        put(t_valid, NamedSharding(mesh, P("data", None))),
    )
