"""TV-L1 variational optical flow (batched, jittable).

BASELINE.json config 5: the variational / implicit-scheme flow variant.
Implements the classic Zach–Pock–Bischof primal–dual formulation
(duality-based TV-L1, the algorithm behind OpenCV's DualTVL1): coarse
to fine over a pyramid, and at each level an outer warping loop around
an inner primal–dual relaxation:

  - data term: ρ(u) = I1(x+u0) + ∇I1·(u-u0) - I0  (linearized per warp)
  - thresholding step on ρ gives the auxiliary field v (pointwise,
    closed form — the L1 proximal operator);
  - the TV term is minimized by a fixed number of Chambolle dual
    iterations p ← (p + τ/θ ∇u) / (1 + τ/θ |∇u|), u = v - θ div p.

Everything is elementwise math + 2-point finite-difference stencils —
pure VPU work that XLA fuses; the batch axis carries frame pairs.
Iteration counts are static (lax-friendly fixed loops), making the
whole solver one compiled program.

This is an independent capability (the reference has no TV-L1); tests
validate convergence on known translations rather than differential
equality to any C++ implementation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from btcs_pnes_optical_flow_tpu.ops import cvx


@dataclasses.dataclass(frozen=True)
class TVL1Params:
    tau: float = 0.25          # dual step size
    lambda_: float = 0.3       # data-term weight
    theta: float = 0.3         # coupling parameter
    n_scales: int = 3          # pyramid levels (0.5 scale factor)
    n_warps: int = 5           # warps per level
    n_iterations: int = 30     # max primal-dual iterations per warp
    # Early-stop threshold on the mean squared flow update per
    # iteration (OpenCV DualTVL1 semantics: stop when
    # sum((u-u')^2 + (v-v')^2)/size < epsilon^2); 0 disables the check
    # and always runs the full static n_iterations.  Default is tighter
    # than OpenCV's 0.01 because our n_iterations default (30) is 10x
    # smaller than OpenCV's 300: measured on the convergence suite,
    # 0.001 is EPE-indistinguishable from epsilon=0 while 0.01 exits
    # with ~30x the converged EPE.
    epsilon: float = 0.001
    scale_step: float = 0.5
    # "auto": banded Pallas warp on TPU, exact gather elsewhere.
    # The banded warp replaces three full-image general gathers per
    # warp iteration (~20 ns/index on TPU — the hot-path killer the
    # repo's performance doctrine bans) with the Farnebäck band-DMA
    # machinery; candidates outside the anchored window are clamped
    # and counted (see tvl1_flow's return_clip).
    warp_engine: str = "auto"  # "auto" | "exact" | "banded"
    warp_d_max_y: int = 8      # banded warp within-tile vertical reach
    warp_d_max_x: int = 16     # banded warp within-tile horizontal reach
    warp_base_max: int = 56    # banded warp per-tile base displacement cap
    warp_s_cap: int = 14       # banded warp anchored-window span
    # Primal–dual inner-loop engine.  "resident" runs each warp's whole
    # Chambolle chain inside one Pallas kernel with all state in VMEM
    # (ops/tvl1_pallas.py) — one HBM round trip per warp instead of one
    # per iteration, bit-equal to "xla" at epsilon=0 (verified on
    # hardware).  "xla" is the fused-elementwise lax.while_loop with
    # the epsilon early exit.  Measured on v5e-1 at 480p/b=16 (full
    # pipeline): resident 12.6 fps vs xla 9.5 — and the win required
    # factoring the per-iteration divides into hoisted reciprocals
    # (VPU divides are ~10x muls; the divide-heavy form ran the Mosaic
    # kernel at 0.3 Gpix-iter/s, the factored form ~4x faster).
    # "auto" = resident on TPU and under interpret.
    pd_engine: str = "auto"    # "auto" | "xla" | "resident"


def _grad(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward differences with zero at the far edge."""
    gx = jnp.concatenate([img[..., :, 1:] - img[..., :, :-1], jnp.zeros_like(img[..., :, :1])], axis=-1)
    gy = jnp.concatenate([img[..., 1:, :] - img[..., :-1, :], jnp.zeros_like(img[..., :1, :])], axis=-2)
    return gx, gy


def _div(px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Backward-difference divergence (adjoint of _grad)."""
    dx = jnp.concatenate([px[..., :, :1], px[..., :, 1:-1] - px[..., :, :-2], -px[..., :, -2:-1]], axis=-1)
    dy = jnp.concatenate([py[..., :1, :], py[..., 1:-1, :] - py[..., :-2, :], -py[..., -2:-1, :]], axis=-2)
    return dx + dy


def _warp_bilinear(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Sample img at (x+u, y+v), clamped bilinear. img: (B, H, W)."""
    b, h, w = img.shape
    gx = jnp.arange(w, dtype=img.dtype)[None, None, :] + u
    gy = jnp.arange(h, dtype=img.dtype)[None, :, None] + v
    gx = jnp.clip(gx, 0.0, w - 1.0)
    gy = jnp.clip(gy, 0.0, h - 1.0)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = gx - x0
    fy = gy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    flat = img.reshape(b, h * w)

    def take(yi, xi):
        return jnp.take_along_axis(flat, (yi * w + xi).reshape(b, h * w), axis=1).reshape(b, h, w)

    i00 = take(y0i, x0i)
    i01 = take(y0i, x1i)
    i10 = take(y1i, x0i)
    i11 = take(y1i, x1i)
    top = i00 * (1 - fx) + i01 * fx
    bot = i10 * (1 - fx) + i11 * fx
    return top * (1 - fy) + bot * fy


def _warp3_banded(i1, i1x_full, i1y_full, u0, v0, p: TVL1Params, interpret: bool):
    """Banded-kernel resampling of (I1, I1x, I1y) at (x+u0, y+v0).

    One band DMA + one anchored candidate scan for all three channels
    (vs three ~20 ns/index general gathers), exact whenever per-pixel
    displacement stays within (warp_d_max_y/x, warp_s_cap) of the
    per-tile mean — TV-regularized flow is piecewise smooth, so the
    envelope holds except at motion discontinuities, where candidates
    clamp to the window edge and are counted.
    """
    from btcs_pnes_optical_flow_tpu.ops.farneback_pallas import (
        pad_for_band,
        warp_grid,
        warp_sample_banded_cf,
    )

    b, h, w = i1.shape
    ht, wt, tw = warp_grid(h, w)
    srcp = pad_for_band(
        jnp.stack([i1, i1x_full, i1y_full], axis=1),
        h, w, p.warp_d_max_y, p.warp_d_max_x, p.warp_base_max, tw=tw,
    )
    flow_cf = jnp.pad(
        jnp.stack([u0, v0], axis=1),
        ((0, 0), (0, 0), (0, ht - h), (0, wt - w)),
        mode="edge",
    )
    samples, clip = warp_sample_banded_cf(
        flow_cf, srcp, h, w,
        d_max_y=p.warp_d_max_y, d_max_x=p.warp_d_max_x,
        base_max=p.warp_base_max, s_cap=p.warp_s_cap, tw=tw,
        interpret=interpret,
    )
    s = samples[:, :, :h, :w]
    return s[:, 0], s[:, 1], s[:, 2], jnp.sum(clip, axis=(1, 2))


def _resident_ok(h: int, w: int, p: TVL1Params) -> bool:
    """Row-block geometry check for the VMEM-resident chain: accept
    when the redundant halo recompute stays under ~3x (bh >= halo)."""
    from btcs_pnes_optical_flow_tpu.ops.tvl1_pallas import _block_geometry

    bh, halo, _, _, _ = _block_geometry(h, w, p.n_iterations)
    return halo == 0 or bh >= halo


def _tvl1_level(i0, i1, u, v, p: TVL1Params, banded: bool, resident: bool,
                interpret: bool):
    """One pyramid level: n_warps × (linearize + primal-dual)."""
    l_t = p.lambda_ * p.theta
    tau_theta = p.tau / p.theta
    clip_total = jnp.zeros((u.shape[0],), jnp.int32)
    h, w = u.shape[-2], u.shape[-1]
    resident = resident and _resident_ok(h, w, p)

    for _ in range(p.n_warps):
        # Fresh dual variables per warp (OpenCV semantics).  Measured:
        # warm-starting p across re-linearizations is UNSTABLE for
        # spatially varying fields — on a rotation field the first two
        # warps converge (EPE 0.10) and warps 3-5 then diverge to
        # near-zero flow (EPE 0.29); resetting per warp reaches
        # EPE 0.028 on the same case.
        p11 = jnp.zeros_like(u)
        p12 = jnp.zeros_like(u)
        p21 = jnp.zeros_like(u)
        p22 = jnp.zeros_like(u)
        u0 = u
        v0 = v
        i1x_full, i1y_full = _grad(i1)
        if banded:
            i1w, i1wx, i1wy, clip_w = _warp3_banded(
                i1, i1x_full, i1y_full, u0, v0, p, interpret
            )
            clip_total = clip_total + clip_w
        else:
            i1w = _warp_bilinear(i1, u0, v0)
            i1wx = _warp_bilinear(i1x_full, u0, v0)
            i1wy = _warp_bilinear(i1y_full, u0, v0)
        grad_sq = i1wx * i1wx + i1wy * i1wy
        rho_c = i1w - i1wx * u0 - i1wy * v0 - i0

        if resident:
            from btcs_pnes_optical_flow_tpu.ops.tvl1_pallas import (
                pd_chain_resident,
            )

            u, v = pd_chain_resident(
                u, v, rho_c, i1wx, i1wy, grad_sq,
                n_iterations=p.n_iterations,
                tau=p.tau, lambda_=p.lambda_, theta=p.theta,
                interpret=interpret,
            )
            continue

        # Loop-invariant hoists: one reciprocal replaces the two
        # per-iteration divides in the proximal step (VPU divides cost
        # ~an order of magnitude over muls; both pd engines use the
        # identical factored form so their eps=0 equality holds).
        neg_inv_gs = -1.0 / jnp.maximum(grad_sq, 1e-9)
        wx_igs = i1wx * neg_inv_gs
        wy_igs = i1wy * neg_inv_gs

        def pd_iter(carry):
            u, v, p11, p12, p21, p22, _it, _err = carry
            rho = rho_c + i1wx * u + i1wy * v
            # L1 proximal (thresholding) step.
            lo = rho < -l_t * grad_sq
            hi = rho > l_t * grad_sq
            d1 = jnp.where(lo, l_t * i1wx, jnp.where(hi, -l_t * i1wx, rho * wx_igs))
            d2 = jnp.where(lo, l_t * i1wy, jnp.where(hi, -l_t * i1wy, rho * wy_igs))
            u_aux = u + d1
            v_aux = v + d2
            # TV proximal via one Chambolle dual step per field.
            u_new = u_aux + p.theta * _div(p11, p12)
            v_new = v_aux + p.theta * _div(p21, p22)
            ux, uy = _grad(u_new)
            vx, vy = _grad(v_new)
            ng_u = jnp.sqrt(ux * ux + uy * uy)
            ng_v = jnp.sqrt(vx * vx + vy * vy)
            r_u = 1.0 / (1.0 + tau_theta * ng_u)
            r_v = 1.0 / (1.0 + tau_theta * ng_v)
            p11 = (p11 + tau_theta * ux) * r_u
            p12 = (p12 + tau_theta * uy) * r_u
            p21 = (p21 + tau_theta * vx) * r_v
            p22 = (p22 + tau_theta * vy) * r_v
            # Mean squared update, max over the batch (a batched early
            # stop can only exit when every pair has converged).
            err = jnp.max(
                jnp.mean(
                    (u_new - u) ** 2 + (v_new - v) ** 2, axis=(-2, -1)
                )
            )
            return (u_new, v_new, p11, p12, p21, p22, _it + 1, err)

        def pd_cond(carry):
            _it, err = carry[6], carry[7]
            keep = _it < p.n_iterations
            if p.epsilon > 0:  # static config, traced scalars inside
                keep = keep & (err >= p.epsilon * p.epsilon)
            return keep

        (u, v, p11, p12, p21, p22, _, _) = jax.lax.while_loop(
            pd_cond,
            pd_iter,
            (u, v, p11, p12, p21, p22, jnp.int32(0), jnp.float32(jnp.inf)),
        )
    return u, v, clip_total


def _resolve_engine(engine: str) -> bool:
    if engine == "auto":
        return jax.default_backend() == "tpu"
    if engine not in ("exact", "banded"):
        raise ValueError(f"unknown TV-L1 warp_engine {engine!r}")
    return engine == "banded"


def _resolve_pd_engine(engine: str, interpret: bool) -> bool:
    if engine == "auto":
        return interpret or jax.default_backend() == "tpu"
    if engine not in ("xla", "resident"):
        raise ValueError(f"unknown TV-L1 pd_engine {engine!r}")
    return engine == "resident"


def _pyramid_sizes(h: int, w: int, params: TVL1Params):
    sizes = [(h, w)]
    for _ in range(params.n_scales - 1):
        hh, ww = sizes[-1]
        nh, nw = max(round(hh * params.scale_step), 16), max(round(ww * params.scale_step), 16)
        if (nh, nw) == sizes[-1]:
            break
        sizes.append((nh, nw))
    return sizes


@functools.partial(jax.jit, static_argnames=("params", "return_clip", "interpret"))
def tvl1_flow(
    prev: jnp.ndarray,
    curr: jnp.ndarray,
    params: TVL1Params = TVL1Params(),
    return_clip: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Dense TV-L1 flow. prev/curr: (B, H, W) or (H, W); → (..., 2).

    With ``return_clip=True`` also returns the per-pair count of warp
    candidates the banded engine clamped (0 ⇒ the banded result equals
    the exact-gather result up to fp rounding; always 0 for the exact
    engine) — the same never-silent contract as the Farnebäck driver.

    The pyramid resizes use cvx.resize_bilinear_mm (MXU matmuls), NOT
    the gather-based cvx.resize_bilinear: a gather-lowered resize in
    the same program as the banded-warp + resident-pd Mosaic kernel
    chain silently NaNs the warp kernel's output on the v5e stack —
    pinned with a full bisection matrix in
    scripts/repro_mosaic_mixed_levels.py.  With the matmul resize the
    whole multi-level pyramid compiles as one program, bit-equal to
    the xla pd engine at epsilon=0 (verified on hardware).
    """
    squeeze = prev.ndim == 2
    if squeeze:
        prev = prev[None]
        curr = curr[None]
    banded = _resolve_engine(params.warp_engine)
    resident = _resolve_pd_engine(params.pd_engine, interpret)
    b, h, w = prev.shape
    i0f = prev.astype(jnp.float32) / 255.0
    i1f = curr.astype(jnp.float32) / 255.0

    u = None
    for (hh, ww) in reversed(_pyramid_sizes(h, w, params)):
        i0s = cvx.resize_bilinear_mm(cvx.gaussian_blur_reflect101(i0f, 5, 0.8), hh, ww)
        i1s = cvx.resize_bilinear_mm(cvx.gaussian_blur_reflect101(i1f, 5, 0.8), hh, ww)
        if u is None:
            u = jnp.zeros((b, hh, ww), jnp.float32)
            v = jnp.zeros((b, hh, ww), jnp.float32)
            clips = jnp.zeros((b,), jnp.int32)
        else:
            inv = 1.0 / params.scale_step
            u = cvx.resize_bilinear_mm(u, hh, ww) * inv
            v = cvx.resize_bilinear_mm(v, hh, ww) * inv
        u, v, clip_lv = _tvl1_level(
            i0s, i1s, u, v, params, banded, resident, interpret
        )
        clips = clips + clip_lv

    flow = jnp.stack([u, v], axis=-1)
    if squeeze:
        flow, clips = flow[0], clips[0]
    return (flow, clips) if return_clip else flow
