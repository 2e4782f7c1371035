"""VMEM-resident TV-L1 primal–dual chain (the TPU inner-loop kernel).

The XLA TV-L1 inner loop (ops/tvl1.py pd_iter) is pure elementwise math
plus radius-1 stencils, but every one of its ~30 iterations per warp
round-trips six state planes and four constant planes through HBM —
~16 plane transfers x B x H x W x 4 bytes per iteration, which is the
entire cost of the solver once the warp is banded (the VPU work itself
is microseconds).  The key structural fact (exploited here): OpenCV
semantics reset the dual fields p to ZERO at every warp iteration
(ops/tvl1.py:162-165), so the whole primal–dual chain of one warp is a
closed computation over (u, v, rho_c, I1wx, I1wy, |grad|^2) — it can
run start-to-finish inside one Pallas kernel with *all* state resident
in VMEM, touching HBM exactly once in and once out.

Tiling: the chain is time-tiled over image rows ("trapezoid" scheme).
One pd iteration has dependence radius 2 rows (u_new reads div(p)
[radius 1 backward]; p_new reads grad(u_new) [radius 1 forward]), so a
block that must be exact on bh interior rows after K iterations needs a
halo of 2K rows on each side, recomputed redundantly from block-start
values.  Grad/div boundary conditions apply at *image* boundaries only
(masks on the global row/column index), never at block edges; the
input planes are edge-padded by `halo` rows top and bottom so every
block's slab has the same static geometry (no dynamic offsets — Mosaic
rejects dynamic sublane-start vector loads, see
scripts/repro_dynamic_sublane_load.py).

The kernel runs the full static n_iterations (no early stop): resident
iterations are ~HBM-free, so the epsilon early-exit that pays for
itself on the XLA path (ops/tvl1.py pd_cond) would save nothing here.
Differential contract: bit-close (fp reassociation only) to the XLA
pd loop at epsilon=0 — tests/test_tvl1.py pins it in interpret mode
and scripts/repro_tvl1_resident.py pins TPU-vs-interpret bit-exactness
at every block geometry.

KNOWN COMPILER HAZARD (pinned by scripts/repro_mosaic_mixed_levels.py):
on the v5e Mosaic/XLA stack in this image, a jitted program that feeds
the banded warp-sample kernel + this kernel from a GATHER-lowered
producer (the fancy-indexing cvx.resize_bilinear) silently corrupts
the warp kernel's output at certain geometry/batch combinations (reads
as NaN; its clip counter stays 0 because NaN comparisons are false —
e.g. a 120x160 resize->60x80 level at batch 2).  Each kernel
standalone is bit-exact everywhere, as are slice/matmul-producer
variants of the same program.  The fix is structural and faster
anyway: ops/tvl1.py builds its pyramid with cvx.resize_bilinear_mm
(dense 2-tap interpolation matmuls on the MXU, no gathers), after
which the full multi-level program is bit-equal to the xla pd engine
at epsilon=0 on hardware.

Reference for the algorithm: Zach–Pock–Bischof via OpenCV DualTVL1
semantics (see ops/tvl1.py module docstring; the published reference
repo has no TV-L1 — this is framework capability, SURVEY.md §7 step 5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_geometry(h: int, w: int, n_iterations: int):
    """Pick (bh, halo, n_blocks, hp, wp) for the resident chain.

    Keeps the per-block slab (6 input planes + 4 dual planes + loop
    carries) comfortably inside the ~16 MB VMEM budget; small images run
    as a single block with no halo at all.
    """
    wp = -(-w // 128) * 128
    hp = -(-h // 8) * 8
    halo = -(-2 * n_iterations // 8) * 8
    # Whole image in one block when the slab stays small (all pyramid
    # levels above 0, and any test-sized frame): no halo recompute.
    if 16 * hp * wp * 4 <= 6 << 20:
        return hp, 0, 1, hp, wp
    # Otherwise: 8-aligned interior rows sized so the slab (bh + 2*halo
    # rows x wp lanes x ~16 live planes) stays ~<= 10 MB.
    bh = max(8, (((10 << 20) // (16 * 4 * wp)) - 2 * halo) // 8 * 8)
    bh = min(bh, hp)
    n_blocks = -(-hp // bh)
    return bh, halo, n_blocks, n_blocks * bh, wp


def _pd_kernel_factory(
    h: int, w: int, bh: int, halo: int, s_rows: int, wp: int,
    n_iterations: int, tau: float, lambda_: float, theta: float,
):
    l_t = lambda_ * theta
    tau_theta = tau / theta

    def shift_l(f):  # f[:, j+1] (edge-replicated; masked at use sites)
        return jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)

    def shift_r(f):  # f[:, j-1]
        return jnp.concatenate([f[:, :1], f[:, :-1]], axis=1)

    def shift_u(f):  # f[i+1, :]
        return jnp.concatenate([f[1:, :], f[-1:, :]], axis=0)

    def shift_d(f):  # f[i-1, :]
        return jnp.concatenate([f[:1, :], f[:-1, :]], axis=0)

    def _body(plane_refs, out_ref, slab, sem):
        ib = pl.program_id(1)
        if slab is None:
            # Single-block geometry: the whole (padded) image is the
            # slab and arrives as six plain VMEM blocks — no manual
            # DMA.  The planes are passed as SEPARATE pallas inputs
            # (saves materializing a stacked copy of four fusion
            # outputs; the pad of each plane fuses into its producer).
            slab = [r[0] for r in plane_refs]
        else:
            bb = pl.program_id(0)
            # Slabs of consecutive blocks overlap by 2*halo rows, which
            # BlockSpec index maps cannot express (blocks tile
            # disjointly): DMA each plane's slab from ANY/HBM at the
            # 8-aligned dynamic offset ib*bh instead.  Slab row r ==
            # image row ib*bh - halo + r (the planes carry `halo`
            # edge-padded rows on top).
            r0 = pl.multiple_of(ib * bh, 8)
            cps = [
                pltpu.make_async_copy(
                    ref.at[bb, pl.ds(r0, s_rows), :], slab.at[i], sem
                )
                for i, ref in enumerate(plane_refs)
            ]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()
        col = jax.lax.broadcasted_iota(jnp.int32, (s_rows, wp), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (s_rows, wp), 0) + (
            ib * bh - halo
        )
        in_w = col < (w - 1)
        in_h = row < (h - 1)
        at_x0 = col == 0
        at_x1 = col == (w - 1)
        at_y0 = row == 0
        at_y1 = row == (h - 1)

        def grad(f):
            gx = jnp.where(in_w, shift_l(f) - f, 0.0)
            gy = jnp.where(in_h, shift_u(f) - f, 0.0)
            return gx, gy

        def div(px, py):
            dx = jnp.where(at_x0, px, jnp.where(at_x1, 0.0, px) - shift_r(px))
            dy = jnp.where(at_y0, py, jnp.where(at_y1, 0.0, py) - shift_d(py))
            return dx + dy

        u, v, rho_c, i1wx, i1wy, grad_sq = (slab[i] for i in range(6))
        # Same loop-invariant factoring as the xla engine (ops/tvl1.py
        # pd_iter) — the eps=0 engine-equality contract requires the
        # identical arithmetic forms.
        neg_inv_gs = -1.0 / jnp.maximum(grad_sq, 1e-9)
        wx_igs = i1wx * neg_inv_gs
        wy_igs = i1wy * neg_inv_gs
        zero = jnp.zeros((s_rows, wp), jnp.float32)

        def pd_iter(_, carry):
            u, v, p11, p12, p21, p22 = carry
            rho = rho_c + i1wx * u + i1wy * v
            lo = rho < -l_t * grad_sq
            hi = rho > l_t * grad_sq
            d1 = jnp.where(lo, l_t * i1wx, jnp.where(hi, -l_t * i1wx, rho * wx_igs))
            d2 = jnp.where(lo, l_t * i1wy, jnp.where(hi, -l_t * i1wy, rho * wy_igs))
            u_new = u + d1 + theta * div(p11, p12)
            v_new = v + d2 + theta * div(p21, p22)
            ux, uy = grad(u_new)
            vx, vy = grad(v_new)
            ng_u = jnp.sqrt(ux * ux + uy * uy)
            ng_v = jnp.sqrt(vx * vx + vy * vy)
            r_u = 1.0 / (1.0 + tau_theta * ng_u)
            r_v = 1.0 / (1.0 + tau_theta * ng_v)
            p11 = (p11 + tau_theta * ux) * r_u
            p12 = (p12 + tau_theta * uy) * r_u
            p21 = (p21 + tau_theta * vx) * r_v
            p22 = (p22 + tau_theta * vy) * r_v
            return (u_new, v_new, p11, p12, p21, p22)

        u, v, _, _, _, _ = jax.lax.fori_loop(
            0, n_iterations, pd_iter, (u, v, zero, zero, zero, zero)
        )
        out_ref[0, 0] = u[halo : halo + bh, :]
        out_ref[0, 1] = v[halo : halo + bh, :]

    def kernel_blocked(*refs):
        _body(refs[:6], refs[6], refs[7], refs[8])

    def kernel_single(*refs):
        _body(refs[:6], refs[6], None, None)

    return kernel_blocked, kernel_single


@functools.partial(
    jax.jit,
    static_argnames=("n_iterations", "tau", "lambda_", "theta", "interpret"),
)
def pd_chain_resident(
    u: jnp.ndarray,
    v: jnp.ndarray,
    rho_c: jnp.ndarray,
    i1wx: jnp.ndarray,
    i1wy: jnp.ndarray,
    grad_sq: jnp.ndarray,
    n_iterations: int = 30,
    tau: float = 0.25,
    lambda_: float = 0.3,
    theta: float = 0.3,
    interpret: bool = False,
):
    """Run one warp's full primal–dual chain in VMEM.

    All arrays (B, H, W) float32.  Returns (u, v) after ``n_iterations``
    Chambolle iterations with duals initialized to zero — identical
    math to ops/tvl1.py's pd_iter with epsilon=0, one HBM round trip
    total instead of one per iteration.
    """
    b, h, w = u.shape
    bh, halo, n_blocks, hb, wp = _block_geometry(h, w, n_iterations)
    s_rows = bh + 2 * halo

    # Pad: columns to the lane width (values are masked by `col < w`
    # logic only at boundary-condition sites; padded lanes compute
    # garbage that is cropped on return), rows by halo top / halo +
    # grid-padding bottom with edge replication (keeps all slab values
    # finite; block edges are NOT image boundaries, so the masks above
    # are what enforce the true boundary conditions).  Six SEPARATE
    # arrays, never stacked — see the note in _body.
    pad = ((0, 0), (halo, halo + hb - h), (0, wp - w))
    planes = [
        jnp.pad(x, pad, mode="edge")
        for x in (u, v, rho_c, i1wx, i1wy, grad_sq)
    ]

    kernel_blocked, kernel_single = _pd_kernel_factory(
        h, w, bh, halo, s_rows, wp, n_iterations, tau, lambda_, theta
    )
    if n_blocks == 1:
        # Whole image resident: plain VMEM blocks, no manual DMA.
        grid_spec = pl.GridSpec(
            grid=(b, 1),
            in_specs=[
                pl.BlockSpec(
                    (1, s_rows, wp), lambda bb, i: (bb, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ] * 6,
            out_specs=pl.BlockSpec(
                (1, 2, bh, wp), lambda bb, i: (bb, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        kernel = kernel_single
    else:
        grid_spec = pl.GridSpec(
            grid=(b, n_blocks),
            # Pinned HBM (not ANY): the slabs are DMA'd at dynamic
            # row offsets, which is only guaranteed for HBM residency.
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 6,
            out_specs=pl.BlockSpec(
                (1, 2, bh, wp), lambda bb, i: (bb, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((6, s_rows, wp), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        kernel = kernel_blocked
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 2, hb, wp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*planes)
    return out[:, 0, :h, :w], out[:, 1, :h, :w]
