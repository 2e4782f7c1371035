"""Per-level stage attribution for the coarse pyramid levels.

The round-3 ledger (scripts/profile_stages.py) shows levels 1-3 hold
1/3 of level-0's pixel mass but 40% of device time (171/99/44 Mpix/s
vs L0's 292).  This script splits each coarse level's cost into
poly+glue vs per-iteration warp+solve sweeps, via iterations=1 and
do_poly=False ablations of the same seq program.

Run ALONE on the real TPU:  python -m scripts.profile_levels_r3
"""

import dataclasses

from btcs_pnes_optical_flow_tpu.config import FarnebackParams
from scripts.profile_stages import render, seq_program, timed

import jax.numpy as jnp


def main():
    p = dataclasses.replace(FarnebackParams(), warp_precision="bf16")
    h, w, b = 480, 640, 256
    frames = jnp.asarray(render(b + 1, h, w))
    for k in (0, 1, 2, 3):
        hk, wk = p.level_size(h, w, k)
        npx = b * hk * wk
        full = timed(f"L{k} full ({wk}x{hk})",
                     seq_program(p, h, w, only_level=k), frames, npx=npx)
        it1 = timed(f"L{k} iterations=1",
                    seq_program(p, h, w, only_level=k, iterations=1),
                    frames, npx=npx)
        nopoly = timed(f"L{k} no poly",
                       seq_program(p, h, w, only_level=k, do_poly=False),
                       frames, npx=npx)
        nopass = timed(f"L{k} no dual passes",
                       seq_program(p, h, w, only_level=k, do_passes=False),
                       frames, npx=npx)
        sweep = (full - it1) / 2.0
        print(f"  L{k}: warp+solve sweep {sweep*1e3:7.2f} ms  "
              f"poly+glue {(it1 - sweep)*1e3:7.2f} ms  "
              f"poly {(full - nopoly)*1e3:7.2f} ms  "
              f"passes {(full - nopass)*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
