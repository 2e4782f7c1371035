"""Minimal reproducer: dynamic 2D lane roll at non-power-of-two widths.

Round 2 verified pltpu.roll(2D, axis=1, dynamic shift) exact at width
512.  The round-3 per-level geometry produces band width 384 (3*128)
for 128-wide warp tiles, and the warp kernel output at that geometry is
wrong by ~9 px on hardware while interpret mode passes — suspect the
dynamic lane roll.  This isolates it: roll a (320, W) iota array by a
scalar-prefetched dynamic shift for W in {256, 384, 512, 640} and
compare to numpy.

Run ALONE on the TPU.
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")


def make(w, shift_ref_based=True):
    def kernel(sh_ref, x_ref, o_ref):
        shift = -sh_ref[0]
        o_ref[...] = pltpu.roll(x_ref[...], shift=shift, axis=1)

    def run(x, s):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(x.shape, lambda i, *r: (0, 0))],
                out_specs=pl.BlockSpec(x.shape, lambda i, *r: (0, 0)),
            ),
        )(jnp.array([s], jnp.int32), x)

    return run


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    h = 320
    for w in (256, 384, 512, 640):
        x = rng.normal(size=(h, w)).astype(np.float32)
        xj = jnp.asarray(x)
        run = make(w)
        bad = []
        for s in (0, 1, 7, 63, 127, 128, 129, 161, 200, 255):
            got = np.asarray(run(xj, s))
            want = np.roll(x, -s, axis=1)
            err = np.abs(got - want).max()
            if err != 0:
                bad.append((s, float(err)))
        print(f"W={w}: {'OK' if not bad else f'BROKEN {bad}'}")


if __name__ == "__main__":
    main()
