"""Why is the edge-pad glue 4x off HBM bandwidth, and what fixes it?

The round-3 ledger measured pad_for_solve (jnp.pad mode="edge" of M,
2.6 GB of traffic per 256-pair chunk) at 26.8 ms standalone — ~4x off
the ~820 GB/s HBM roofline — and pad_for_band moves even more bytes
once per level.  This times the same logical op under different
lowerings at the L0 bench geometry:

  a) jnp.pad(mode="edge")              (current)
  b) concat of broadcasted edge slices
  c) jnp.pad(mode="constant")          (lax.pad native — lower bound)
  d) dynamic_update_slice into a zeros buffer + edge strips
  e) pure copy (no pad)                (roofline reference)

Run ALONE on the real TPU:  python -m scripts.probe_pad
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

B = 256
HT, WT = 480, 768   # L0 warp grid
H, W = 480, 640


def force(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def timed(name, fn, *args, reps=4, gb=None):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    dt = (time.perf_counter() - t0) / reps
    extra = f"  {gb / dt:7.1f} GB/s" if gb else ""
    print(f"{name:52s} {dt*1e3:9.2f} ms{extra}", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    m = jax.jit(lambda: jax.random.normal(
        jax.random.key(0), (B, 5, HT, WT), jnp.float32))()
    force(m)
    gb_out = B * 5 * (HT + 16) * (WT + 256) * 4 / 1e9
    gb_in = B * 5 * H * W * 4 / 1e9
    gb = gb_in + gb_out

    # a) current pad_for_solve
    @jax.jit
    def pad_a(x):
        return jnp.pad(
            x[:, :, :H, :W],
            ((0, 0), (0, 0), (8, 8 + HT - H), (128, 128 + WT - W)),
            mode="edge",
        )

    # b) concat of broadcasted edge slices (rows then cols)
    @jax.jit
    def pad_b(x):
        x = x[:, :, :H, :W]
        top = jnp.broadcast_to(x[:, :, :1], x.shape[:2] + (8, W))
        bot = jnp.broadcast_to(x[:, :, H - 1 :], x.shape[:2] + (8 + HT - H, W))
        x = jnp.concatenate([top, x, bot], axis=2)
        hp = x.shape[2]
        left = jnp.broadcast_to(x[:, :, :, :1], x.shape[:2] + (hp, 128))
        right = jnp.broadcast_to(
            x[:, :, :, W - 1 :][..., :1], x.shape[:2] + (hp, 128 + WT - W)
        )
        return jnp.concatenate([left, x, right], axis=3)

    # c) constant pad (native lax.pad)
    @jax.jit
    def pad_c(x):
        return jnp.pad(
            x[:, :, :H, :W],
            ((0, 0), (0, 0), (8, 8 + HT - H), (128, 128 + WT - W)),
        )

    # d) dynamic_update_slice into zeros + edge strips
    @jax.jit
    def pad_d(x):
        x = x[:, :, :H, :W]
        out = jnp.zeros((B, 5, HT + 16, WT + 256), jnp.float32)
        out = jax.lax.dynamic_update_slice(out, x, (0, 0, 8, 128))
        return out

    # e) pure copy at the output size (roofline)
    big = jax.jit(lambda: jax.random.normal(
        jax.random.key(1), (B, 5, HT + 16, WT + 256), jnp.float32))()
    force(big)

    @jax.jit
    def copy_e(x):
        return x + 1.0

    timed("a) jnp.pad edge (current pad_for_solve)", pad_a, m, gb=gb)
    timed("b) concat broadcast edges", pad_b, m, gb=gb)
    timed("c) jnp.pad constant", pad_c, m, gb=gb)
    timed("d) dus into zeros", pad_d, m, gb=gb)
    timed("e) copy at output size (roofline)", copy_e, big, gb=2 * gb_out)


if __name__ == "__main__":
    main()
