"""Stage 2 — per-page OCR merge layer (M6-M9, O2, O7, J2, P3).

The reference runs OCR per cropped layout region with formula masks
(pdf2markdown.py:195-256 + paddle_ocr.py:388-450). The det-box geometry
pipeline — (y0,x0) sort + 10px bubble pass (O2), line merge (O7), formula
mask x-interval subtraction (J2) — is a sequential fold, so it lives in an
``applyInPandas`` over (conv_id, turn_idx, page_seq) where per-group
cardinality is tens of boxes (SURVEY.md §7.5). Everything entering/leaving
is Arrow-batched; the group key shuffle is the stage's only exchange.

Output: the final ``text`` span rows (DETECTIONS schema, branch 2), with
``det_order`` continuing after the page's model detections — the
reference's layout_dets append order (pdf2markdown.py:251-256).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import kernels, schema

_PAD = float(schema.OCR_PAD)


def _ocr_page(pdf: pd.DataFrame) -> pd.DataFrame:
    first = pdf.iloc[0]
    regions = pdf[(pdf["branch"] == 0)].sort_values("det_order")
    masks = pdf[pdf["branch"] == 1][["x0", "y0", "x1", "y1"]].to_numpy(np.float64)
    raws = pdf[pdf["branch"] == 2].sort_values("det_idx")
    model = pdf[pdf["branch"].isin([0, 1])]
    offset = int(model["det_order"].max()) + 1 if len(model) else 0

    if raws.empty or regions.empty:
        return pd.DataFrame(columns=pdf.columns)

    rb = raws[["x0", "y0", "x1", "y1"]].to_numpy(np.float64)
    rcx = (rb[:, 0] + rb[:, 2]) / 2.0
    rcy = (rb[:, 1] + rb[:, 3]) / 2.0
    rcontent = raws["content"].to_numpy(object)
    rscore = raws["score"].to_numpy(np.float64)

    out = []
    seq = 0
    for reg in regions.itertuples(index=False):
        rx0, ry0, rx1, ry1 = reg.x0, reg.y0, reg.x1, reg.y1
        nw, nh = rx1 - rx0 + 2 * _PAD, ry1 - ry0 + 2 * _PAD
        mine = np.flatnonzero(
            (rcx >= rx0) & (rcx <= rx1) & (rcy >= ry0) & (rcy <= ry1)
        )
        if len(mine) == 0:
            continue
        crop = rb[mine] - np.array([rx0, ry0, rx0, ry0]) + _PAD
        boxes = kernels.merge_det_boxes(crop[kernels.bubble_pass(crop)])
        if len(masks):
            adj = masks - np.array([rx0, ry0, rx0, ry0]) + _PAD
            ok = ~((adj[:, 2] < 0) | (adj[:, 3] < 0) | (adj[:, 0] > nw) | (adj[:, 1] > nh))
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
            score = float(rscore[gi].mean()) if len(gi) else 0.0
            if score < schema.DROP_SCORE:
                continue
            out.append(
                (
                    first["conv_id"], int(first["turn_idx"]), int(first["page_seq"]),
                    int(first["page_no"]), float(first["page_w"]), float(first["page_h"]),
                    -1, offset + seq, 2, "text", round(score, 2),
                    b[0] - _PAD + rx0, b[1] - _PAD + ry0,
                    b[2] - _PAD + rx0, b[3] - _PAD + ry0,
                    " ".join(rcontent[gi]),
                )
            )
            seq += 1
    cols = [f.name for f in schema.DETECTIONS.fields]
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
