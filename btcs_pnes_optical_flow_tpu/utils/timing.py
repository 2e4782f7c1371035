"""Timing and profiling utilities."""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Dict, Optional

import jax

logger = logging.getLogger("btcs_pnes_optical_flow_tpu")
# Production observability default: per-chunk progress / stage rates go
# to stderr unless the embedding application configures logging itself
# or opts out (BTCS_LOG_LEVEL=WARNING silences progress).
if not logger.handlers and not logging.getLogger().handlers:
    _handler = logging.StreamHandler()
    _handler.setFormatter(logging.Formatter("[%(name)s] %(message)s"))
    logger.addHandler(_handler)
    logger.setLevel(os.environ.get("BTCS_LOG_LEVEL", "INFO"))


@contextlib.contextmanager
def device_timer(name: str, sink: Optional[Dict[str, float]] = None):
    """Wall-time a block with device fencing on both edges.

    Without ``block_until_ready`` JAX's async dispatch makes wall times
    meaningless; this fences pending work before starting and forces
    the block's outputs via the returned `finish` handle.
    """
    holder = {}

    def finish(tree):
        holder["out"] = tree
        return tree

    t0 = time.perf_counter()
    yield finish
    if "out" in holder:
        jax.block_until_ready(holder["out"])
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[name] = sink.get(name, 0.0) + dt
    logger.debug("stage %s: %.4fs", name, dt)


class StageTimer:
    """Accumulates per-stage wall time and item counts; reports rates."""

    def __init__(self):
        self.times: Dict[str, float] = {}
        self.items: Dict[str, int] = {}

    def timed(self, name: str, n_items: int = 0):
        self.items[name] = self.items.get(name, 0) + n_items
        return device_timer(name, self.times)

    def add_items(self, name: str, n: int):
        self.items[name] = self.items.get(name, 0) + n

    def rates(self) -> Dict[str, float]:
        return {
            k: (self.items.get(k, 0) / t if t > 0 else 0.0)
            for k, t in self.times.items()
        }

    def report(self) -> str:
        rows = {
            k: {
                "seconds": round(t, 4),
                "items": self.items.get(k, 0),
                "items_per_sec": round(self.items.get(k, 0) / t, 2) if t > 0 else None,
            }
            for k, t in self.times.items()
        }
        return json.dumps(rows)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace capture around a block (view with XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
