"""NumPy/SciPy oracle of the reference pipeline's behavioral contract.

Used only by the test suite for differential testing (SURVEY.md §4.1).
Each function re-expresses the behavior specified in SURVEY.md §2.2/§2.4
with citations into /root/reference; this is an independent
implementation of the *contract*, including the three functions the
reference calls but never defines (estimate_fs_from_time, safe_auc,
exp_decay_regression — optical_PC1.py:263,267,270).
"""

from __future__ import annotations

import numpy as np
import scipy.ndimage
import scipy.signal
import scipy.stats


# --- optical_PCA.py behavior -------------------------------------------------

def ref_dynamic_pc1(time_sec, vx, vy, win_sec=2.0, step_sec=0.1, fs=30, ref=np.array([0.0, 1.0])):
    """Sliding-window PCA → PC1 waveform (optical_PCA.py:136-235)."""
    vx = np.asarray(vx, float)
    vy = np.asarray(vy, float)
    n = vx.size
    out = np.full(n, np.nan)
    if n < 3:
        return out
    win_n = max(3, int(round(win_sec * fs)))
    step_n = max(1, int(round(step_sec * fs)))
    centers, ws = [], []
    prev_w = None
    for start in range(0, n - win_n + 1, step_n):
        end = start + win_n
        sx, sy = vx[start:end], vy[start:end]
        m = np.isfinite(sx) & np.isfinite(sy)
        if m.sum() < 3:
            continue
        x = np.column_stack([sx[m], sy[m]])
        xc = x - x.mean(axis=0)
        c = np.cov(xc, rowvar=False)
        vals, vecs = np.linalg.eigh(c)
        w = vecs[:, int(np.argmax(vals))]
        if np.all(np.isfinite(w)) and float(np.dot(w, ref)) < 0:
            w = -w
        if prev_w is not None and float(np.dot(w, prev_w)) < 0:
            w = -w
        prev_w = w.copy()
        centers.append((start + end - 1) // 2)
        ws.append(w)
    if not centers:
        return out
    centers = np.asarray(centers)
    ws = np.vstack(ws)
    j = np.clip(np.searchsorted(centers, np.arange(n), side="left"), 0, len(centers) - 1)
    pick = np.empty(n, dtype=int)
    for i in range(n):
        j2 = max(0, j[i] - 1)
        pick[i] = j2 if abs(i - centers[j2]) < abs(i - centers[j[i]]) else j[i]
    e1x, e1y = ws[pick, 0], ws[pick, 1]
    ok = np.isfinite(vx) & np.isfinite(vy) & np.isfinite(e1x) & np.isfinite(e1y)
    out[ok] = vx[ok] * e1x[ok] + vy[ok] * e1y[ok]
    return out


def ref_bandpass_nanrobust(x, sos):
    """Per-finite-run zero-phase band-pass (optical_PCA.py:96-121)."""
    x = np.asarray(x, float)
    y = np.full_like(x, np.nan)
    nsec = sos.shape[0]
    padreq = 3 * ((2 * nsec + 1) - 1)
    idx = np.flatnonzero(np.isfinite(x))
    if idx.size == 0:
        return y
    gap = np.where(np.diff(idx) > 1)[0]
    for s, e in zip(np.r_[idx[0], idx[gap + 1]], np.r_[idx[gap], idx[-1]]):
        seg = x[s : e + 1]
        if seg.size < padreq + 1:
            continue
        pad = min(padreq, int(seg.size // 2 - 1))
        y[s : e + 1] = seg if pad <= 0 else scipy.signal.sosfiltfilt(sos, seg, padlen=pad)
    return y


# --- optical_PC1.py behavior -------------------------------------------------

def ref_smooth_ma_nan(x, fs, sec):
    """NaN-tolerant moving average (optical_PC1.py:55-76)."""
    x = np.asarray(x, float)
    if sec <= 0:
        return x.copy()
    k = int(max(1, round(fs * sec))) | 1
    valid = np.isfinite(x).astype(float)
    x2 = np.where(np.isfinite(x), x, 0.0)
    num = scipy.ndimage.uniform_filter1d(x2, size=k, mode="nearest")
    den = scipy.ndimage.uniform_filter1d(valid, size=k, mode="nearest")
    y = num / np.maximum(den, 1e-12)
    y[den < 1e-12] = np.nan
    return y


def ref_rolling_p95_positive(pc1_s, fs, win_sec=2.0):
    """Rolling 95th percentile of positive values (optical_PC1.py:79-118)."""
    pc1_s = np.asarray(pc1_s, float)
    win_n = max(3, int(round(win_sec * fs)) | 1)
    half = win_n // 2
    pos = pc1_s.copy()
    pos[~np.isfinite(pos)] = np.nan
    pos[pos <= 0] = np.nan
    p95 = np.full(pos.shape, np.nan)
    for i in range(pos.size):
        seg = pos[max(0, i - half) : min(pos.size, i + half + 1)]
        seg = seg[np.isfinite(seg)]
        if seg.size >= 5:
            p95[i] = float(np.percentile(seg, 95))
    return p95


def ref_detect_cycles(pc1, time_sec, fs, smooth_sec=0.2, p95_win_sec=2.0,
                      peak_min_frac=0.2, peak_min_abs=0.0, min_dist_sec=0.2):
    """Cycle-based positive-peak detection (optical_PC1.py:121-228)."""
    pc1 = np.asarray(pc1, float)
    time_sec = np.asarray(time_sec, float)
    pc1_s = ref_smooth_ma_nan(pc1, fs, smooth_sec)
    local_p95 = ref_rolling_p95_positive(pc1_s, fs, p95_win_sec)
    up = np.where((pc1_s[:-1] <= 0) & (pc1_s[1:] > 0))[0]
    dn = np.where((pc1_s[:-1] > 0) & (pc1_s[1:] <= 0))[0]
    t_raw, a_raw = [], []
    for iu in up:
        dn_after = dn[dn > iu]
        if dn_after.size == 0:
            continue
        seg = pc1_s[iu : int(dn_after[0]) + 1]
        if seg.size == 0 or np.all(~np.isfinite(seg)):
            continue
        im = int(np.nanargmax(seg))
        ipk = int(iu + im)
        a_peak = float(seg[im])
        if not np.isfinite(a_peak):
            continue
        thr = float(peak_min_abs)
        ref_v = float(local_p95[ipk]) if np.isfinite(local_p95[ipk]) else np.nan
        if np.isfinite(ref_v) and ref_v > 0:
            thr = max(thr, peak_min_frac * ref_v)
        if a_peak < thr:
            continue
        t_raw.append(float(time_sec[ipk]))
        a_raw.append(a_peak)
    if len(t_raw) < 2:
        return pc1_s, np.asarray(t_raw), np.array([]), np.array([])
    t_keep, a_keep = [t_raw[0]], [a_raw[0]]
    for t, a in zip(t_raw[1:], a_raw[1:]):
        if t - t_keep[-1] < min_dist_sec:
            if a > a_keep[-1]:
                t_keep[-1], a_keep[-1] = t, a
        else:
            t_keep.append(t)
            a_keep.append(a)
    t_peaks = np.asarray(t_keep)
    if t_peaks.size < 2:
        return pc1_s, t_peaks, np.array([]), np.array([])
    T = np.diff(t_peaks)
    tm = 0.5 * (t_peaks[:-1] + t_peaks[1:])
    ok = np.isfinite(T) & (T > 0)
    return pc1_s, t_peaks, tm[ok], T[ok]


# --- The three functions the reference never defines (SURVEY.md §2.4) --------

def ref_estimate_fs_from_time(time):
    """Sampling rate from the time vector: 1/median(diff)."""
    d = np.diff(np.asarray(time, float))
    return float(1.0 / np.median(d))


def ref_safe_auc(amp, time):
    """NaN-robust trapezoidal time-integral over finite samples."""
    amp = np.asarray(amp, float)
    time = np.asarray(time, float)
    m = np.isfinite(amp) & np.isfinite(time)
    if m.sum() < 2:
        return float("nan")
    total = 0.0
    # Integrate piecewise over contiguous finite runs (no bridging gaps).
    idx = np.flatnonzero(m)
    gap = np.where(np.diff(idx) > 1)[0]
    for s, e in zip(np.r_[idx[0], idx[gap + 1]], np.r_[idx[gap], idx[-1]]):
        if e > s:
            total += float(np.trapezoid(amp[s : e + 1], time[s : e + 1]))
    return total


def ref_exp_decay_regression(time, amp):
    """Slope of ln(amp) vs time via linregress; NaN-guarded."""
    time = np.asarray(time, float)
    amp = np.asarray(amp, float)
    m = np.isfinite(time) & np.isfinite(amp) & (amp > 0)
    if m.sum() < 2:
        return {"slope": float("nan"), "r": float("nan")}
    res = scipy.stats.linregress(time[m], np.log(amp[m]))
    return {"slope": float(res.slope), "r": float(res.rvalue)}


def ref_metrics(t_all, pc1_all, window_sec=10.0, smooth_sec=0.2):
    """End-of-pipeline metric assembly (optical_PC1.py:234-299)."""
    t_all = np.asarray(t_all, float)
    pc1_all = np.asarray(pc1_all, float)
    m = np.isfinite(t_all) & np.isfinite(pc1_all)
    t_all, pc1_all = t_all[m], pc1_all[m]
    if t_all.size < 10:
        raise RuntimeError("Too few valid samples")
    time = t_all - float(t_all[0])
    mw = (time >= 0.0) & (time <= window_sec)
    time, pc1 = time[mw], pc1_all[mw]
    if time.size < 10:
        raise RuntimeError("Too few samples in window")
    fs = ref_estimate_fs_from_time(time)
    amp = ref_smooth_ma_nan(np.abs(pc1), fs, smooth_sec)
    auc = ref_safe_auc(amp, time)
    ads = ref_exp_decay_regression(time, amp)
    _, t_peaks, tm, T = ref_detect_cycles(pc1, time, fs)
    if tm.size >= 5:
        tau, p = scipy.stats.kendalltau(tm, T)
    else:
        tau, p = float("nan"), float("nan")
    return {
        "PC1_area_0_10": float(auc),
        "ADS_slope_0_10": float(ads["slope"]),
        "ADS_R2_0_10": float(ads["r"] ** 2) if np.isfinite(ads["r"]) else float("nan"),
        "Kendall_tau_0_10": float(tau),
        "Kendall_p_0_10": float(p),
        "Peak_n": int(t_peaks.size),
        "fs": fs,
    }


# --- optical_flow.py behavior (stage A oracle; uses OpenCV directly) ---------

def ref_flow_stage(frames_gray_u8, time_all, fps, ex_all, ey_all, roi_mask,
                   pos_msec=None):
    """Per-frame flow feature loop (optical_flow.py:195-259) with cv2."""
    import cv2

    fb = dict(pyr_scale=0.5, levels=3, winsize=15, iterations=3,
              poly_n=5, poly_sigma=1.2, flags=0)
    rows = []
    prev = None
    for i, gray in enumerate(frames_gray_u8):
        if pos_msec is not None and pos_msec[i] is not None and pos_msec[i] > 0:
            t = float(pos_msec[i]) / 1000.0
        else:
            t = i / float(fps)
        si = int(np.clip(np.searchsorted(time_all, t, side="right") - 1, 0, len(time_all) - 1))
        ex, ey = ex_all[si], ey_all[si]
        ok = bool(np.isfinite(ex).all() and np.isfinite(ey).all())
        vx = vy = mag = np.nan
        if ok and prev is not None:
            fl = cv2.calcOpticalFlowFarneback(prev, gray, None, **fb)
            fxb = fl[..., 0] * float(ex[0]) + fl[..., 1] * float(ex[1])
            fyb = fl[..., 0] * float(ey[0]) + fl[..., 1] * float(ey[1])
            mg = cv2.magnitude(fxb, fyb)
            vx = float(np.nanmean(fxb[roi_mask]))
            vy = float(np.nanmean(fyb[roi_mask]))
            mag = float(np.nanmean(mg[roi_mask]))
        rows.append([i, t, si, int(ok), vx, vy, mag])
        prev = gray
    import pandas as pd
    return pd.DataFrame(rows, columns=["frame", "t_sec", "skel_idx", "axes_ok",
                                       "vx_body", "vy_body", "mag_body"])
