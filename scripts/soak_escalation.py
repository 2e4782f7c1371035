"""Escalation-ladder soak (VERDICT r3 #6): throughput when pairs CLIP.

The bench clip never trips the banded-warp envelope (clipped_candidates
= 0), so the deep multi-window tier and the exact-engine fallback have
compiled but never been *stressed* end to end.  This renders clips
where a controlled fraction of pairs carry a violent rotation (within-
tile displacement spread >> the +-(8,16) anchored envelope at L0), runs
the bench's exact timed protocol (chunked fast path -> packed readback
-> the PRODUCTION `escalate_clipped_pairs` ladder from
models/pipeline.py), and reports fps + tier trigger counts at ~0%, ~5%
and ~20% clip rates.

A violent pair is frame[i+1] = rotate(frame[i], ~0.17 rad): at radius
r the displacement is ~0.17*r px with gradient 0.17 px/px, so a
256-lane tile sees a ~43 px horizontal span — far past warp_s_cap — at
a |mean| still under warp_base_max.  Each injected rotation makes TWO
violent pairs (into and out of the rotated frame).

Run ALONE on the real TPU:  python -m scripts.soak_escalation
"""

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

from btcs_pnes_optical_flow_tpu.config import PipelineConfig
from btcs_pnes_optical_flow_tpu.models.flow import (
    roi_body_flow,
    roi_body_flow_checked,
    roi_body_flow_seq,
)
from btcs_pnes_optical_flow_tpu.models.pipeline import escalate_clipped_pairs
from btcs_pnes_optical_flow_tpu.ops.cvx import fill_poly_mask

from bench import render_clip

H, W = 480, 640
N_PAIRS = 256
CHUNK = 128
# 0.17 rad (a ~43 px within-tile span) is FULLY COVERED by the
# bucketed multi-window passes (zero residual clips, measured
# 2026-08-21) — the ladder never fired.  0.45 rad pushes per-pixel
# displacement past warp_base_max at the frame edges (|d| up to
# ~170 px), which no window placement can reach: the fast path MUST
# clip and the ladder MUST escalate.
THETA = 0.45  # rad/frame for violent pairs


def rotate_about_center(img: np.ndarray, theta: float) -> np.ndarray:
    """Bilinear rotation about the image center (host-side, soak setup)."""
    h, w = img.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    c, s = np.cos(theta), np.sin(theta)
    sx = c * (xx - cx) - s * (yy - cy) + cx
    sy = s * (xx - cx) + c * (yy - cy) + cy
    x0 = np.clip(np.floor(sx).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(sy).astype(int), 0, h - 2)
    fx = np.clip(sx - x0, 0.0, 1.0)
    fy = np.clip(sy - y0, 0.0, 1.0)
    f = img.astype(np.float64)
    out = (f[y0, x0] * (1 - fy) * (1 - fx) + f[y0, x0 + 1] * (1 - fy) * fx
           + f[y0 + 1, x0] * fy * (1 - fx) + f[y0 + 1, x0 + 1] * fy * fx)
    return np.clip(out, 0, 255).astype(np.uint8)


def make_clip(frac_violent: float, seed: int):
    frames = render_clip(N_PAIRS + 1, seed=seed)
    n_inject = int(round(frac_violent * N_PAIRS / 2))
    # Spaced >=3 apart so each injection's two violent pairs don't merge.
    if n_inject:
        sel = np.linspace(2, N_PAIRS - 3, n_inject).astype(int)
        for i in sel:
            frames[i + 1] = rotate_about_center(frames[i], THETA)
    return frames


def main():
    print("backend:", jax.default_backend(), flush=True)
    roi = np.array([[140.0, 90.0], [520.0, 110.0], [500.0, 400.0], [120.0, 380.0]])
    theta = 0.3
    ex = np.tile(np.array([np.cos(theta), -np.sin(theta)], np.float32), (N_PAIRS, 1))
    ey = np.tile(np.array([np.sin(theta), np.cos(theta)], np.float32), (N_PAIRS, 1))
    exd, eyd = jnp.asarray(ex[:CHUNK]), jnp.asarray(ey[:CHUNK])
    masks = jnp.asarray(fill_poly_mask(H, W, roi)[None])

    cfg = PipelineConfig()
    flow_p = dataclasses.replace(
        cfg.flow, warp_precision="bf16", iter_schedule=(3, 3, 2, 1),
        warp_coarse_reach=(4, 8, 8),
    )
    config = dataclasses.replace(cfg, flow=flow_p)

    def force(tree):
        return [np.asarray(x) for x in jax.tree.leaves(tree)]

    @jax.jit
    def pack(feats_list, clips_list):
        rows = [
            jnp.stack([f.vx[:, 0], f.vy[:, 0], f.mag[:, 0], c.astype(jnp.float32)], 1)
            for f, c in zip(feats_list, clips_list)
        ]
        return jnp.concatenate(rows)

    # Warm every tier once (fast path, deep multi-window, exact engine)
    # at the shapes the ladder uses, plus the device frame gather.
    frames0 = make_clip(0.0, seed=0)
    f_dev = jnp.asarray(frames0)
    chunks = [f_dev[s : s + CHUNK + 1] for s in range(0, N_PAIRS, CHUNK)]
    out = roi_body_flow_seq(chunks[0], exd, eyd, masks, flow_p)
    force(pack([out[0]] * len(chunks), [out[1]] * len(chunks)))
    wide = dataclasses.replace(flow_p, warp_dual_frac=1.0, warp_dual_passes=4)
    idx = np.arange(8)
    force(roi_body_flow_checked(f_dev[idx], f_dev[idx + 1], jnp.asarray(ex[idx]),
                                jnp.asarray(ey[idx]), masks, wide))
    exact = dataclasses.replace(flow_p, warp_engine="exact")
    force(roi_body_flow(f_dev[idx], f_dev[idx + 1], jnp.asarray(ex[idx]),
                        jnp.asarray(ey[idx]), masks, exact))

    print(f"{'clip-rate target':>18s} {'fps':>8s} {'tier1':>6s} {'tier2':>6s} "
          f"{'t_fast':>8s} {'t_esc':>8s}", flush=True)
    rows = []
    for frac in (0.0, 0.05, 0.20):
        frames = make_clip(frac, seed=0)
        f_dev = jnp.asarray(frames)
        force(f_dev[0:1])  # stage before the clock
        chunks = [f_dev[s : s + CHUNK + 1] for s in range(0, N_PAIRS, CHUNK)]

        t0 = time.perf_counter()
        pending = [roi_body_flow_seq(c, exd, eyd, masks, flow_p) for c in chunks]
        packed = np.asarray(pack([f for f, _ in pending], [c for _, c in pending]))
        t_fast = time.perf_counter() - t0
        # Keep the ROI dimension: the production ladder assigns
        # (k, R)-shaped rows (pipeline.py resolve() passes (n_pairs, R)).
        vx = packed[:, 0:1].copy()
        vy = packed[:, 1:2].copy()
        mg = packed[:, 2:3].copy()
        clips = packed[:, 3].copy()
        n1, n2 = escalate_clipped_pairs(
            vx, vy, mg, clips, f_dev, ex, ey, masks, config, N_PAIRS)
        dt = time.perf_counter() - t0
        fps = N_PAIRS / dt
        rows.append((frac, fps, n1, n2, t_fast, dt - t_fast))
        print(f"{frac:>17.0%} {fps:8.1f} {n1:6d} {n2:6d} "
              f"{t_fast*1e3:7.0f}ms {(dt-t_fast)*1e3:7.0f}ms", flush=True)
    return rows


if __name__ == "__main__":
    main()
