"""Stage 2 — per-page OCR merge layer (M6-M9, O2, O7, J2, P3).

The reference runs OCR per cropped layout region with formula masks
(pdf2markdown.py:195-256 + paddle_ocr.py:388-450). The det-box geometry
pipeline — (y0,x0) sort + 10px bubble pass (O2), line merge (O7), formula
mask x-interval subtraction (J2) — is a sequential fold, so it lives in a
numpy kernel (``ocr_page_arrays``) called from an ``applyInPandas`` per
(conv_id, turn_idx, page_seq) group in the staged pipeline, and directly
from the fused turn kernel. One implementation, two call sites.

Output: the final ``text`` span rows, with ``det_order`` continuing after
the page's model detections — the reference's layout_dets append order
(pdf2markdown.py:251-256).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import kernels, schema

_PAD = float(schema.OCR_PAD)
_SHIFT4 = np.array([1.0, 1.0, 1.0, 1.0])


def ocr_page_arrays(
    region_boxes: np.ndarray,  # (n,4) OCR-able regions in det_order
    masks: np.ndarray,  # (m,4) formula masks (int coords as float)
    raw_boxes: np.ndarray,  # (r,4) raw text dets in det_idx order
    raw_scores: np.ndarray,  # (r,)
    raw_contents: list[str],
) -> tuple[list, list, list]:
    """→ (boxes [x0,y0,x1,y1], scores, contents) in emission order."""
    out_boxes: list = []
    out_scores: list = []
    out_contents: list = []
    if len(raw_boxes) == 0 or len(region_boxes) == 0:
        return out_boxes, out_scores, out_contents
    rcx = (raw_boxes[:, 0] + raw_boxes[:, 2]) / 2.0
    rcy = (raw_boxes[:, 1] + raw_boxes[:, 3]) / 2.0
    for reg in region_boxes:
        rx0, ry0, rx1, ry1 = reg
        nw, nh = rx1 - rx0 + 2 * _PAD, ry1 - ry0 + 2 * _PAD
        mine = np.flatnonzero(
            (rcx >= rx0) & (rcx <= rx1) & (rcy >= ry0) & (rcy <= ry1)
        )
        if len(mine) == 0:
            continue
        shift = np.array([rx0, ry0, rx0, ry0]) - _PAD
        crop = raw_boxes[mine] - shift
        boxes = kernels.merge_det_boxes(crop[kernels.bubble_pass(crop)])
        if len(masks):
            adj = masks - shift
            ok = ~(
                (adj[:, 2] < 0) | (adj[:, 3] < 0) | (adj[:, 0] > nw) | (adj[:, 1] > nh)
            )
            adj = adj[ok]
            if len(adj):  # reference: `if mfd_res:` (paddle_ocr.py:414)
                boxes = kernels.split_by_masks(boxes, adj)
        ccx = (crop[:, 0] + crop[:, 2]) / 2.0
        ccy = (crop[:, 1] + crop[:, 3]) / 2.0
        for b in boxes:
            cons = np.flatnonzero(
                (ccx >= b[0]) & (ccx <= b[2]) & (ccy >= b[1]) & (ccy <= b[3])
            )
            cons = cons[np.lexsort((cons, ccx[cons]))]  # (center_x, det_idx)
            gi = mine[cons]
            score = float(raw_scores[gi].mean()) if len(gi) else 0.0
            if score < schema.DROP_SCORE:
                continue
            out_boxes.append(b + shift)
            out_scores.append(round(score, 2))
            out_contents.append(" ".join(raw_contents[i] for i in gi))
    return out_boxes, out_scores, out_contents


def _ocr_page(pdf: pd.DataFrame) -> pd.DataFrame:
    """pandas wrapper for the staged pipeline's applyInPandas."""
    first = pdf.iloc[0]
    regions = pdf[pdf["branch"] == 0].sort_values("det_order")
    masks = pdf[pdf["branch"] == 1][["x0", "y0", "x1", "y1"]].to_numpy(np.float64)
    raws = pdf[pdf["branch"] == 2].sort_values("det_idx")
    model = pdf[pdf["branch"].isin([0, 1])]
    offset = int(model["det_order"].max()) + 1 if len(model) else 0

    boxes, scores, contents = ocr_page_arrays(
        regions[["x0", "y0", "x1", "y1"]].to_numpy(np.float64),
        masks,
        raws[["x0", "y0", "x1", "y1"]].to_numpy(np.float64),
        raws["score"].to_numpy(np.float64),
        list(raws["content"]),
    )
    cols = [f.name for f in schema.DETECTIONS.fields]
    out = [
        (
            first["conv_id"], int(first["turn_idx"]), int(first["page_seq"]),
            int(first["page_no"]), float(first["page_w"]), float(first["page_h"]),
            -1, offset + i, 2, "text", scores[i],
            b[0], b[1], b[2], b[3], contents[i],
        )
        for i, b in enumerate(boxes)
    ]
    return pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)


def ocr_text_spans(detections: DataFrame) -> DataFrame:
    """detections → final OCR text span rows (branch 2, DETECTIONS schema).

    Catalyst pre-filter shrinks the shuffle to exactly the rows the kernel
    needs: OCR-able regions (pdf2markdown.py:209), formula masks, raw dets.
    """
    need = detections.filter(
        (F.col("branch") == 2)
        | (F.col("branch") == 1)
        | ((F.col("branch") == 0) & F.col("category").isin(schema.OCR_REGION_CLASSES))
    )
    return need.groupBy("conv_id", "turn_idx", "page_seq").applyInPandas(
        lambda pdf: _ocr_page(pdf), schema=schema.DETECTIONS
    )
