"""Frozen, hashable configuration tree.

The reference keeps every parameter as a module-level constant
(`optical_flow.py:48-56`, `optical_PCA.py:47-58`, `optical_PC1.py:33-44`).
Here they become frozen dataclasses whose defaults are *exactly* those
constants, so a default-constructed config reproduces the reference
pipeline bit-for-bit.  Configs are hashable and therefore usable as
static arguments to ``jax.jit`` — each distinct config specializes its
own compiled program (static shapes, static filter taps, static window
lengths), which is what XLA needs to tile the hot loops onto the MXU/VPU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


def _round_half_even(x: float) -> int:
    """Banker's rounding, matching Python round(), np.round and cvRound."""
    import math

    f = math.floor(x)
    diff = x - f
    if diff > 0.5:
        return f + 1
    if diff < 0.5:
        return f
    return f + 1 if f % 2 else f


@dataclasses.dataclass(frozen=True)
class FarnebackParams:
    """Dense Farnebäck optical-flow parameters.

    Defaults match the reference `FB_PARAMS` (optical_flow.py:48-56).
    ``gaussian_win`` corresponds to OpenCV's OPTFLOW_FARNEBACK_GAUSSIAN
    flag bit (flags=0 in the reference → box averaging).
    """

    pyr_scale: float = 0.5
    levels: int = 3
    winsize: int = 15
    iterations: int = 3
    poly_n: int = 5
    poly_sigma: float = 1.2
    gaussian_win: bool = False  # flags & OPTFLOW_FARNEBACK_GAUSSIAN
    use_initial_flow: bool = False  # flags & OPTFLOW_USE_INITIAL_FLOW
    # Warp engine for the normal-equation update: "banded" runs the
    # fused Pallas kernel (TPU; bit-exact vs "exact" whenever each
    # pixel's displacement is within (warp_d_max_y, warp_d_max_x) of
    # its tile's mean, the horizontal span fits warp_s_cap, and
    # |mean| <= warp_base_max — violations are counted per pair so the
    # pipeline can escalate: re-run with warp_s_cap=0 (full window),
    # then the exact path); "exact" is the gather-based XLA path
    # (always used on non-TPU backends).
    # The reachable window is asymmetric because warp tiles are 32 rows
    # x 256 cols: within-tile vertical flow variation is structurally
    # smaller than horizontal.  Vertical candidates are statically
    # unrolled sublane slices (measured nearly free up to ~29 rows);
    # horizontal candidates cost linearly in executed slots with a
    # Mosaic perf cliff past ~18 (scripts/profile_um_micro.py), hence
    # the anchored span cap below.
    # The kernel's total static slot count ((2*d_max_y + 10) x
    # (warp_s_cap + 1)) must stay under the ~400-instance Mosaic cliff
    # (scripts/profile_um_micro.py): d_max_y=8 x s_cap=14 -> 390.
    # The split favors vertical reach (nearly free sublane rows) over
    # horizontal span (expensive lane slots): vertical within-tile
    # deviation is structurally small, and the bucketed second window
    # (warp_dual_frac) recovers wide horizontal spans.  Violations are
    # always counted and escalate per pair.
    warp_engine: str = "banded"
    warp_d_max_y: int = 8
    warp_d_max_x: int = 16
    warp_base_max: int = 56
    # Array layout of the fused TPU driver.  "transposed" runs the
    # whole pyramid on (W, H) arrays (Farnebäck is exactly x<->y
    # symmetric; flow channels are swapped back on output).  Measured
    # on the 480p bench workload it LOSES to "native": the warp tiles
    # rotate with the layout, so their image patches become tall
    # (32x x 256y) and the within-patch displacement spans grow on
    # both axes (scripts: /tmp/prof_transposed, 131 vs 463 pairs/s).
    # Kept as an option for portrait-orientation video.
    warp_layout: str = "native"
    # Horizontal candidate-span cap for the banded warp kernel: > 0
    # shortens the inner MAC loop to this many slots (re-anchored at the
    # tile's min candidate, so the window sits anywhere within the
    # +-warp_d_max_x reach — asymmetric deviation distributions on
    # motion-boundary tiles are covered).  Pixels outside the span are
    # clamped AND counted in the kernel's clip output — never silent.
    # 0 = full 2*warp_d_max_x+2 range (slow: past the slot cliff; used
    # as the middle escalation tier for clipped pairs).
    warp_s_cap: int = 14
    # "bf16" runs the warp candidate MACs in bfloat16 (float32
    # accumulation): ~2x VPU throughput at ~1e-2 px EPE vs the fp32
    # banded path (still far under the 0.1 px reference contract).
    # Decision (round 3): "bf16" is the production-throughput setting —
    # bench.py uses it and tests/test_pallas_kernels.py::
    # test_fused_480p_bf16_epe_gate pins its EPE at the bench geometry.
    # The library default stays "fp32" so the differential story
    # (~2e-5 px vs the exact engine) holds for every API user who did
    # not explicitly opt into reduced precision.  Clip counting and the
    # escalation ladder are displacement-geometric — identical in both.
    warp_precision: str = "fp32"
    # Multi-window escalation budget: after the fast anchored pass,
    # each follow-up pass re-visits the top ceil(frac * n_tiles) most-
    # clipped tiles with a fresh window anchored at the pixels every
    # previous window missed (ops/farneback_pallas.
    # update_matrices_banded_tiles_cf), merged per pixel — a chain of
    # independently-anchored windows covers multi-modal motion-boundary
    # tiles exactly, at a cost proportional to the violation volume
    # instead of the window width.  frac = 0 disables (clips then
    # escalate per pair via the pipeline tiers).
    warp_dual_frac: float = 0.125
    warp_dual_passes: int = 2
    # Per-level iteration schedule, indexed by pyramid level k (0 =
    # finest/full resolution); levels past the tuple's end reuse its
    # last entry.  None = ``iterations`` at every level (the reference
    # semantics, optical_flow.py:48-56 via cv2's `iterations`).
    # Rationale: the round-3 stage ledger (scripts/profile_stages.py)
    # shows coarse levels hold 1/3 of level-0's pixel mass but ~40% of
    # device time; coarse-level iterations only refine the *initial*
    # flow handed to finer levels, so trimming them trades a measured
    # (EPE-gated) accuracy epsilon for throughput.  Production opt-in
    # like warp_precision; library default keeps the exact schedule.
    iter_schedule: Optional[Tuple[int, ...]] = None
    # Banded-warp reach at coarse levels (k >= 1), as
    # (d_max_y, d_max_x, s_cap); None = same reach as level 0.
    # A displacement of D pixels at full resolution is D/2^k at level
    # k, so the coarse candidate window can be much tighter than level
    # 0's.  Measured (2026-08-18): numerically free ((4, 8, 8) leaves
    # EPE vs cv2 bit-unchanged on the bench clip) but only ~+1%
    # throughput — the per-tile fixed cost is NOT the static slot
    # structure.  Out-of-window pixels are still counted by the clip
    # detector and recovered by the multi-window passes / escalation
    # ladder — never silent.
    warp_coarse_reach: Optional[Tuple[int, int, int]] = None
    # Forced warp tile width (lanes) at coarse levels (k >= 1); None =
    # the warp_grid law.  Coarse grids quantize badly: level 1 of 480p
    # (320 true lanes) pads to 512 under the 256-lane law — tw=384
    # covers it in ONE tile row (fewer per-tile fixed costs, 25% fewer
    # padded pixels through poly/warp/solve).  Wider tiles widen the
    # within-tile displacement span, which is exactly why this is safe
    # only at coarse levels (spans shrink 2^k) — and the clip counter
    # still guards it.  Must be a multiple of 128.
    warp_coarse_tw: Optional[int] = None
    # Band-DMA pipeline depth (VMEM slots) of the warp and poly
    # kernels.  2 = classic double buffering (issue one tile ahead);
    # n_slots-1 tiles are issued ahead in general.  Measured
    # (2026-08-18): depth 4 changes NOTHING (509 vs 508 pairs/s) — the
    # ~5 us/tile-step fixed cost is not DMA issue-to-complete latency
    # either (see scripts/probe_step_floor.py for the decomposition).
    # Kept as a correct, tested knob for other memory systems.  The
    # solve kernel stays at 2 slots: its 5-channel (th+16, tw+256)
    # band at depth 4 is ~5 MB of scratch, up against the 16 MB Mosaic
    # scoped-vmem stack that a 3.3 MB double-buffered variant already
    # overflowed once (the unrolled tap slices multiply live
    # temporaries ~5x the nominal scratch).
    warp_dma_slots: int = 2
    # ROI-aware dispatch (round 5; VERDICT r4 #2).  The reference
    # consumes flow ONLY inside the ROI polygon (optical_flow.py:
    # 185-187), and flow at an ROI pixel depends on a bounded halo
    # (winsize x iterations + resize support per level).  When set,
    # entry k is the inclusive-exclusive PIXEL box
    # (y_lo, y_hi, x_lo, x_hi) that level k's warp/solve/dual passes
    # must compute (ROI ⊕ halo, precomputed by models.flow.
    # roi_dispatch_params); tiles outside it are never dispatched —
    # their flow keeps the level's init (finite, never consumed by the
    # ROI reduction).  Polynomial expansion stays full-frame (the warp
    # band may read r1 up to warp_base_max away).  EPE inside the ROI
    # is unchanged (gated by tests); clip counting covers the
    # dispatched region.  None = full-frame (library default — every
    # pixel of the returned flow is meaningful).
    roi_active_px: Optional[Tuple[Tuple[int, int, int, int], ...]] = None
    # Geometry dead ends, measured 2026-08-18 (so nobody re-tries them):
    # 64-row warp tiles ran 2.8x SLOWER end to end (183 vs 508 pairs/s
    # — taller tiles do not amortize the per-tile fixed cost on this
    # Mosaic stack), and bf16 polynomial-expansion MACs lost the
    # accuracy contract outright (EPE max 6.3 px vs cv2: the flow
    # solves live on small coefficient *differences*).  See
    # scripts/measure_iter_schedule.py for the measurement harness.

    def iters_at(self, k: int) -> int:
        """Iteration count at pyramid level k (0 = finest)."""
        if not self.iter_schedule:
            return self.iterations
        return self.iter_schedule[min(k, len(self.iter_schedule) - 1)]

    def num_levels(self, height: int, width: int, min_size: int = 32) -> int:
        """Number of *extra* pyramid levels actually used.

        OpenCV clamps `levels` so that every level is at least
        ``min_size`` pixels on each side; processing then runs from
        level ``k`` (coarsest) down to 0 (full resolution), i.e.
        ``num_levels + 1`` passes in total.
        """
        k = 0
        scale = 1.0
        while k < self.levels:
            scale *= self.pyr_scale
            if width * scale < min_size or height * scale < min_size:
                break
            k += 1
        return k

    def level_size(self, height: int, width: int, k: int) -> Tuple[int, int]:
        scale = self.pyr_scale**k
        return (_round_half_even(height * scale), _round_half_even(width * scale))


@dataclasses.dataclass(frozen=True)
class PCAParams:
    """Band-pass + sliding-window PCA parameters (optical_PCA.py:47-58).

    Note the reference hardcodes ``fs = 30`` and uses it for window
    sizing regardless of the true frame timestamps — we reproduce that.
    """

    fs: float = 30.0
    bpf_low_hz: float = 0.5
    bpf_high_hz: float = 5.0
    bpf_order: int = 4
    win_sec: float = 2.0
    step_sec: float = 0.1
    min_samples_pca: int = 3
    # Static bound on the number of contiguous finite runs the NaN-robust
    # band-pass will process (masked fixed-shape formulation; extra run
    # slots are no-ops).  Purely a compile-time capacity knob.
    max_finite_runs: int = 64

    @property
    def win_n(self) -> int:
        return max(self.min_samples_pca, _round_half_even(self.win_sec * self.fs))

    @property
    def step_n(self) -> int:
        return max(1, _round_half_even(self.step_sec * self.fs))


@dataclasses.dataclass(frozen=True)
class MetricParams:
    """PC1 metric-extraction parameters (optical_PC1.py:33-44)."""

    window_sec: float = 10.0
    smooth_sec: float = 0.20
    p95_win_sec: float = 2.0
    peak_min_frac: float = 0.20
    peak_min_abs: float = 0.0
    min_dist_sec: float = 0.2
    min_valid_samples: int = 10
    min_intervals_for_tau: int = 5


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end pipeline configuration."""

    flow: FarnebackParams = FarnebackParams()
    pca: PCAParams = PCAParams()
    metrics: MetricParams = MetricParams()
    # Compute dtype for the flow stage.  fp32 everywhere: the stencil
    # solves are bandwidth-bound elementwise math (VPU), and matching
    # OpenCV to <0.1 px EPE needs fp32 accumulation.
    dtype: str = "float32"
