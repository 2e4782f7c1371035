"""Cohort runner: many recordings → per-video metric tables.

BASELINE.json config 4 end to end: a cohort of videos runs through the
chunked flow pipeline with per-video error isolation (a video whose
decode or analysis fails NaN-fills its row instead of killing the
cohort — the reference would simply crash, SURVEY.md §5), then the PC1
and metric stages run batched, and the result is one summary row per
video with the reference's column contract.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from btcs_pnes_optical_flow_tpu.config import PipelineConfig
from btcs_pnes_optical_flow_tpu.dataio import contracts
from btcs_pnes_optical_flow_tpu.models import metrics as metrics_model
from btcs_pnes_optical_flow_tpu.models import pipeline
from btcs_pnes_optical_flow_tpu.utils.timing import StageTimer

logger = logging.getLogger("btcs_pnes_optical_flow_tpu")


@dataclasses.dataclass
class CohortItem:
    name: str
    video: object                   # path or VideoSource or ndarray
    skeleton: contracts.Skeleton
    roi_polygons: Sequence[np.ndarray]


def run_cohort(
    items: Sequence[CohortItem],
    config: PipelineConfig = PipelineConfig(),
    chunk_pairs: int = 32,
    out_csv: Optional[str] = None,
    checkpoint_root: Optional[str] = None,
) -> pd.DataFrame:
    """Run the full pipeline for every recording; one summary row per
    (video, ROI).  Failures are isolated per video."""
    timer = StageTimer()
    rows: List[dict] = []
    for item in items:
        try:
            ck = f"{checkpoint_root}/{item.name}" if checkpoint_root else None
            with timer.timed("flow"):
                flow = pipeline.run_flow_stage(
                    item.video, item.skeleton, item.roi_polygons, config,
                    chunk_pairs, checkpoint_dir=ck,
                )
            timer.add_items("flow", len(flow.frame))
            with timer.timed("pc1"):
                pc1 = pipeline.run_pc1_stage(flow, config)
            for r in range(pc1.shape[1]):
                mets = metrics_model.pc1_metrics(flow.t_sec, pc1[:, r], config.metrics)
                rows.append(
                    {
                        "video": item.name,
                        "roi": r,
                        "PC1_source": "pc1_dyn",
                        "window_sec": float(config.metrics.window_sec),
                        "PC1_area_0_10": float(mets.pc1_area),
                        "ADS_slope_0_10": float(mets.ads_slope),
                        "ADS_R2_0_10": float(mets.ads_r2),
                        "Kendall_tau_0_10": float(mets.kendall_tau),
                        "Kendall_p_0_10": float(mets.kendall_p),
                        "Peak_n": int(mets.peak_n),
                        "status": int(mets.status),
                        "error": "",
                    }
                )
        except Exception as e:  # per-video isolation
            logger.warning("cohort item %s failed: %s", item.name, e)
            for r in range(len(item.roi_polygons)):
                rows.append(
                    {
                        "video": item.name,
                        "roi": r,
                        "PC1_source": "pc1_dyn",
                        "window_sec": float(config.metrics.window_sec),
                        "PC1_area_0_10": float("nan"),
                        "ADS_slope_0_10": float("nan"),
                        "ADS_R2_0_10": float("nan"),
                        "Kendall_tau_0_10": float("nan"),
                        "Kendall_p_0_10": float("nan"),
                        "Peak_n": 0,
                        "status": -1,
                        "error": f"{type(e).__name__}: {e}",
                    }
                )
    logger.info("cohort rates: %s", timer.report())
    df = pd.DataFrame(rows)
    if out_csv is not None:
        df.to_csv(out_csv, index=False)
    return df
