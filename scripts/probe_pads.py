"""Pad formulation shootout (round 5): the per-op ledger showed the
edge-mode glue pads dominate the device program (pad_for_solve x3
iterations ~149 ms + pad_for_band ~102 ms of a ~490 ms chunk).  This
times the candidate formulations at the L0 production geometry.

Run ALONE on the real TPU:  python -m scripts.probe_pads
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

B, C = 256, 5
H, W = 480, 640
HT, WT = 480, 768


def force(x):
    return np.asarray(x.ravel()[0:1])


def timed(name, fn, *args, reps=5):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.normal(size=(B, C, HT, WT)).astype(np.float32))
    force(m)

    def trivial(x):
        return x[:, :1, :1, :1] + 1.0

    t_triv = timed("trivial (round-trip floor)", jax.jit(trivial), m)

    # --- pad_for_solve candidates: (8, 8), (128, 128+WT-W) around [:H, :W]
    def edge_pad(x):
        return jnp.pad(x[:, :, :H, :W], ((0, 0), (0, 0), (8, 8 + HT - H), (128, 128 + WT - W)), mode="edge")

    def const_pad(x):
        return jnp.pad(x[:, :, :H, :W], ((0, 0), (0, 0), (8, 8 + HT - H), (128, 128 + WT - W)))

    def const_dus(x):
        xt = x[:, :, :H, :W]
        out = jnp.pad(xt, ((0, 0), (0, 0), (8, 8 + HT - H), (128, 128 + WT - W)))
        hp, wp = out.shape[-2], out.shape[-1]
        out = out.at[:, :, 8 : 8 + H, :128].set(
            jnp.broadcast_to(out[:, :, 8 : 8 + H, 128:129], (B, C, H, 128)))
        out = out.at[:, :, 8 : 8 + H, 128 + W :].set(
            jnp.broadcast_to(out[:, :, 8 : 8 + H, 128 + W - 1 : 128 + W], (B, C, H, wp - 128 - W)))
        out = out.at[:, :, :8, :].set(
            jnp.broadcast_to(out[:, :, 8:9, :], (B, C, 8, wp)))
        out = out.at[:, :, 8 + H :, :].set(
            jnp.broadcast_to(out[:, :, 8 + H - 1 : 8 + H, :], (B, C, hp - 8 - H, wp)))
        return out

    def concat2(x):
        xt = x[:, :, :H, :W]
        xc = jnp.concatenate([
            jnp.broadcast_to(xt[:, :, :, :1], (B, C, H, 128)), xt,
            jnp.broadcast_to(xt[:, :, :, -1:], (B, C, H, 128 + WT - W)),
        ], axis=3)
        return jnp.concatenate([
            jnp.broadcast_to(xc[:, :, :1], (B, C, 8, xc.shape[-1])), xc,
            jnp.broadcast_to(xc[:, :, -1:], (B, C, 8 + HT - H, xc.shape[-1])),
        ], axis=2)

    a = timed("pad_for_solve: edge (shipped)", jax.jit(edge_pad), m)
    b = timed("pad_for_solve: constant", jax.jit(const_pad), m)
    c = timed("pad_for_solve: constant + 4 DUS strips", jax.jit(const_dus), m)
    d = timed("pad_for_solve: manual concat2", jax.jit(concat2), m)

    # equality check of the edge-semantics candidates
    ref = np.asarray(jax.jit(edge_pad)(m))
    for name, fn in (("const_dus", const_dus), ("concat2", concat2)):
        got = np.asarray(jax.jit(fn)(m))
        ok = np.array_equal(got, ref)
        print(f"{name} equals edge pad: {ok}", flush=True)

    # --- pad_for_band candidates (66, 74 leading; ~110 trailing) ----
    def band_edge(x):
        return jnp.pad(x, ((0, 0), (0, 0), (66, 110), (74, 120)), mode="edge")

    def band_const(x):
        return jnp.pad(x, ((0, 0), (0, 0), (66, 110), (74, 120)))

    timed("pad_for_band: edge (old)", jax.jit(band_edge), m)
    timed("pad_for_band: constant (new)", jax.jit(band_const), m)
    print(f"(floor per rep ~{t_triv*1e3:.1f} ms; subtract from every row)", flush=True)


if __name__ == "__main__":
    main()
