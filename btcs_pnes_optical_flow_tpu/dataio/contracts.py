"""The reference pipeline's on-disk data contracts (SURVEY.md §2.5).

The stage boundaries of the reference are CSV/NPZ files; this module
keeps those formats alive as a compatibility layer so artifacts are
interchangeable between the reference scripts and this framework:

- ``skeleton_pc1.npz``: time_all (T,), fps, ex (T,2), ey (T,2)
  (optical_flow.py:20-30, 204-210).
- ``flow.csv``: frame, t_sec, skel_idx, axes_ok, vx_body, vy_body,
  mag_body (optical_flow.py:255-259).
- ``flow_pc1.csv``: t_sec, pc1_dyn (optical_PCA.py:270).
- ``flow_summary_dyn_core.csv``: single-row, 8 columns
  (optical_PC1.py:285-299).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pandas as pd


FLOW_COLUMNS = ["frame", "t_sec", "skel_idx", "axes_ok", "vx_body", "vy_body", "mag_body"]
PC1_COLUMNS = ["t_sec", "pc1_dyn"]
SUMMARY_COLUMNS = [
    "PC1_source",
    "window_sec",
    "PC1_area_0_10",
    "ADS_slope_0_10",
    "ADS_R2_0_10",
    "Kendall_tau_0_10",
    "Kendall_p_0_10",
    "Peak_n",
]


class Skeleton(NamedTuple):
    time_all: np.ndarray  # (T,)
    fps: float
    ex: np.ndarray        # (T, 2)
    ey: np.ndarray        # (T, 2)


def load_skeleton_npz(path: str) -> Skeleton:
    dat = np.load(path, allow_pickle=True)
    return Skeleton(
        time_all=np.asarray(dat["time_all"], dtype=float),
        fps=float(dat["fps"]),
        ex=np.asarray(dat["ex"], dtype=float),
        ey=np.asarray(dat["ey"], dtype=float),
    )


def save_skeleton_npz(path: str, skel: Skeleton) -> None:
    np.savez(path, time_all=skel.time_all, fps=skel.fps, ex=skel.ex, ey=skel.ey)


def flow_frame(
    frame_idx: np.ndarray,
    t_sec: np.ndarray,
    skel_idx: np.ndarray,
    axes_ok: np.ndarray,
    vx: np.ndarray,
    vy: np.ndarray,
    mag: np.ndarray,
) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "frame": np.asarray(frame_idx, dtype=int),
            "t_sec": np.asarray(t_sec, dtype=float),
            "skel_idx": np.asarray(skel_idx, dtype=int),
            "axes_ok": np.asarray(axes_ok, dtype=int),
            "vx_body": np.asarray(vx, dtype=float),
            "vy_body": np.asarray(vy, dtype=float),
            "mag_body": np.asarray(mag, dtype=float),
        }
    )


def read_flow_csv(path: str) -> pd.DataFrame:
    df = pd.read_csv(path)
    required = {"t_sec", "vx_body", "vy_body"}
    missing = [c for c in sorted(required) if c not in df.columns]
    if missing:
        raise KeyError(
            f"Missing columns in {path}. Required={sorted(required)}, missing={missing}."
        )
    return df


def pc1_frame(t_sec: np.ndarray, pc1_dyn: np.ndarray) -> pd.DataFrame:
    return pd.DataFrame({"t_sec": np.asarray(t_sec, float), "pc1_dyn": np.asarray(pc1_dyn, float)})


def read_pc1_csv(path: str, pc1_col: str = "pc1_dyn") -> pd.DataFrame:
    df = pd.read_csv(path)
    required = {"t_sec", pc1_col}
    missing = [c for c in sorted(required) if c not in df.columns]
    if missing:
        raise KeyError(
            f"Missing columns in {path}. Required={sorted(required)}, missing={missing}."
        )
    return df


def summary_frame(metrics, window_sec: float = 10.0, source: str = "pc1_dyn") -> pd.DataFrame:
    """One-row summary matching optical_PC1.py:285-299."""
    return pd.DataFrame(
        [
            {
                "PC1_source": source,
                "window_sec": float(window_sec),
                "PC1_area_0_10": float(metrics.pc1_area),
                "ADS_slope_0_10": float(metrics.ads_slope),
                "ADS_R2_0_10": float(metrics.ads_r2),
                "Kendall_tau_0_10": float(metrics.kendall_tau),
                "Kendall_p_0_10": float(metrics.kendall_p),
                "Peak_n": int(metrics.peak_n),
            }
        ]
    )
