"""Reproducer: are dynamic sublane-start VMEM loads exact on TPU?

The banded warp kernel walks a static candidate range; a fori_loop over
the *live* range with `ref[pl.ds(t, TH), :]` loads would execute
exactly the live work with ~no branches — but Mosaic has a history of
silent miscompiles on dynamic sublane ops (docs/PERFORMANCE.md:
dynamic sublane rolls).  This checks dynamic-start loads (a) standalone
for every offset, (b) inside a lax.fori_loop with traced bounds.

VERDICT (run on v5e, jax 0.8 era, 2026-08-17): dynamic sublane-start
vector loads FAIL TO LOWER — Mosaic raises on the
`vector.load(memref<64x256xf32, vmem>, dynamic index)` op (a loud
error, not a silent miscompile).  Candidate walks must stay statically
unrolled; wide coverage comes from the chained multi-window passes
(ops/farneback_pallas.py), not dynamic loops.
"""
import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, TH = 64, 256, 32

def k_static_offset(x_ref, t_ref, o_ref):
    t = t_ref[0]
    o_ref[...] = x_ref[pl.ds(t, TH), :]

def run_single(x, t):
    return pl.pallas_call(
        k_static_offset,
        out_shape=jax.ShapeDtypeStruct((TH, W), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, jnp.array([t], jnp.int32))

def k_fori(x_ref, lo_ref, hi_ref, o_ref):
    lo = lo_ref[0]
    hi = hi_ref[0]
    def body(t, acc):
        return acc + x_ref[pl.ds(t, TH), :] * (t + 1).astype(jnp.float32)
    o_ref[...] = jax.lax.fori_loop(lo, hi, body, jnp.zeros((TH, W), jnp.float32))

def run_fori(x, lo, hi):
    return pl.pallas_call(
        k_fori,
        out_shape=jax.ShapeDtypeStruct((TH, W), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, jnp.array([lo], jnp.int32), jnp.array([hi], jnp.int32))

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32))
xn = np.asarray(x)

print("backend:", jax.default_backend(), flush=True)
bad = 0
for t in range(H - TH + 1):
    got = np.asarray(run_single(x, t))
    want = xn[t : t + TH]
    d = np.abs(got - want).max()
    if d != 0:
        bad += 1
        print(f"  single t={t}: MISMATCH maxdiff={d}")
print(f"single-offset loads: {'OK all offsets' if bad == 0 else f'{bad} BAD'}", flush=True)

bad = 0
for lo, hi in [(0, 3), (1, 4), (3, 11), (7, 8), (5, 26), (0, 33)]:
    got = np.asarray(run_fori(x, lo, hi))
    want = np.zeros((TH, W), np.float32)
    for t in range(lo, hi):
        want += xn[t : t + TH] * (t + 1)
    d = np.abs(got - want).max()
    rel = d / (np.abs(want).max() + 1e-9)
    if rel > 1e-6:
        bad += 1
        print(f"  fori [{lo},{hi}): MISMATCH maxdiff={d}")
print(f"fori dynamic loads: {'OK' if bad == 0 else f'{bad} BAD'}", flush=True)

# timing: static-25-guard emulation vs fori over live range
import time
def k_guards(x_ref, lo_ref, hi_ref, o_ref):
    lo = lo_ref[0]
    hi = hi_ref[0]
    acc = jnp.zeros((TH, W), jnp.float32)
    o_ref[...] = acc
    for t in range(25):
        @pl.when((t >= lo) & (t < hi))
        def _(t=t):
            o_ref[...] += x_ref[t : t + TH, :] * float(t + 1)

def run_guards(x, lo, hi):
    return pl.pallas_call(
        k_guards,
        out_shape=jax.ShapeDtypeStruct((TH, W), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, jnp.array([lo], jnp.int32), jnp.array([hi], jnp.int32))

def force(v): return np.asarray(v.ravel()[0:1])

for name, fn in [("fori", run_fori), ("guards", run_guards)]:
    f = jax.jit(lambda x, fn=fn: sum(fn(x, 3, 6).sum() for _ in range(100)))
    force(f(x))
    t0 = time.perf_counter()
    force(f(x))
    print(f"{name}: {(time.perf_counter()-t0)*1e3:.2f} ms / 100 calls", flush=True)
