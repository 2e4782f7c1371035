"""Probe: do the banded warp's two Mosaic primitives survive bf16?

The round-3 bf16-band plan stores the warped-from coefficients in HBM
as bfloat16, halving the warp kernel's per-tile band DMA bytes and its
full-band lane roll (docs/PERFORMANCE.md round-3 ledger: the L0 sweeps
are band-traffic/fixed-cost-bound, not MAC-bound).  That is only legal
if, in bf16:

1. `pltpu.roll` dynamic 2D lane rolls are exact at power-of-two lane
   widths (they already miscompile at non-power-of-two widths in fp32 —
   scripts/repro_roll_w384.py);
2. per-tile async copies from a bf16 HBM array with *dynamic* row
   starts work under bf16's (16, 128) VMEM tiling — i.e. what the
   alignment granule for dynamic sublane starts is (8 like fp32, or 16).

Run ALONE on the real TPU:  python -m scripts.repro_roll_bf16
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 400, 512


def _roll_kernel(x_ref, s_ref, o_ref):
    o_ref[...] = pltpu.roll(x_ref[...], shift=-s_ref[0], axis=1)


def check_roll(dtype, w):
    x = np.arange(H * w, dtype=np.float32).reshape(H, w) % 251
    xd = jnp.asarray(x, dtype)
    bad = []
    for shift in (0, 1, 7, 63, 128, 300, w - 1):
        out = pl.pallas_call(
            _roll_kernel,
            out_shape=jax.ShapeDtypeStruct((H, w), dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
        )(xd, jnp.asarray([shift], jnp.int32))
        got = np.asarray(out.astype(jnp.float32))
        ref = np.roll(np.asarray(xd.astype(jnp.float32)), -shift, axis=1)
        if not np.array_equal(got, ref):
            nbad = int((got != ref).sum())
            bad.append((shift, nbad))
    tag = f"roll {jnp.dtype(dtype).name} w={w}"
    print(f"{tag:32s} {'OK' if not bad else f'BAD {bad}'}", flush=True)
    return not bad


def _dma_kernel(r0_ref, x_ref, o_ref, band, sem, *, align, n_lead):
    row0 = pl.multiple_of((r0_ref[0] // align) * align, align)
    src = x_ref.at[r0_ref[1], pl.ds(row0, 64), pl.ds(0, W)] if n_lead else (
        x_ref.at[pl.ds(row0, 64), pl.ds(0, W)]
    )
    cp = pltpu.make_async_copy(src, band, sem)
    cp.start()
    cp.wait()
    o_ref[...] = band[...]


def check_dma(dtype, align, row_start, n_lead=0):
    """DMA-with-dynamic-row-start correctness at a given alignment.

    n_lead > 0 adds a leading batch dim so the pl.ANY source exceeds
    VMEM and Mosaic MUST place it in HBM (the production bf16 band
    source, r1p, is hundreds of MB and always lives there; a small
    source may be placed in VMEM where dynamic-start slicing rules
    differ — an 'align OK' verdict from a VMEM placement would not
    transfer).  n_lead = 0 keeps the small (~0.5 MB) variant so both
    placements stay probed.
    """
    shape = (n_lead, H + 64, W) if n_lead else (H + 64, W)
    x = (np.arange(np.prod(shape), dtype=np.float32).reshape(shape) % 509)
    xd = jnp.asarray(x, dtype)
    nbytes = xd.size * xd.dtype.itemsize
    batch = max(n_lead - 1, 0)  # slice the last slab: farthest from base
    out = pl.pallas_call(
        functools.partial(_dma_kernel, align=align, n_lead=n_lead),
        out_shape=jax.ShapeDtypeStruct((64, W), dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((64, W), dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(jnp.asarray([row_start, batch], jnp.int32), xd)
    a = (row_start // align) * align
    src2d = xd[batch] if n_lead else xd
    ref = np.asarray(jnp.asarray(src2d[a : a + 64, :W], np.float32))
    got = np.asarray(out, np.float32)
    ok = np.array_equal(got, ref)
    place = "HBM-forced" if nbytes > (16 << 20) else "VMEM-or-HBM"
    print(f"dma {jnp.dtype(dtype).name} align={align} start={row_start} "
          f"src={nbytes >> 20}MB[{place}]: {'OK' if ok else 'BAD'}", flush=True)
    return ok


def main():
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    # VERDICT (2026-08-19, v5e): bf16 dynamic rolls DO NOT COMPILE —
    # Mosaic rejects tpu.dynamic_rotate on non-32-bit data.  The bf16
    # band therefore upcasts to f32 before the roll (the DMA-byte
    # saving is the win; the roll was always O(band) VPU work).
    for dtype, w in ((jnp.float32, 512), (jnp.bfloat16, 512), (jnp.bfloat16, 1024)):
        try:
            check_roll(dtype, w)
        except Exception as e:
            print(f"roll {jnp.dtype(dtype).name} w={w:<18} COMPILE-FAIL: "
                  f"{str(e).splitlines()[0][:80]}", flush=True)
    # Both placements (ADVICE r3): small source (Mosaic may keep the
    # pl.ANY input in VMEM) and a >16 MB source (must be HBM, matching
    # the production r1p band source).
    for n_lead in (0, 64):
        for start in (0, 8, 16, 24, 40, 100):
            try:
                check_dma(jnp.bfloat16, 16, start, n_lead=n_lead)
            except Exception as e:
                print(f"dma bf16 align=16 start={start} n_lead={n_lead} "
                      f"COMPILE-FAIL: {str(e).splitlines()[0][:80]}", flush=True)
        # Is 8-row alignment enough for bf16 DMA (i.e. is the granule
        # the fp32 sublane tile or the bf16 packed tile)?
        for start in (8, 24):
            try:
                check_dma(jnp.bfloat16, 8, start, n_lead=n_lead)
            except Exception as e:
                print(f"dma bf16 align=8 start={start} n_lead={n_lead} "
                      f"COMPILE-FAIL: {str(e).splitlines()[0][:80]}", flush=True)


if __name__ == "__main__":
    main()
