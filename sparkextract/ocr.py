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

ROT_MARK = "@rot180 "


def angle_cls(contents: list[str]) -> list[str]:
    """M7 angle classification (paddle_ocr.py:428-433: use_angle_cls flips
    180°-rotated crops before recognition). Deterministic stand-in: the
    payload marks rotated content with ``@rot180 `` + the reversed string;
    the classifier detects the marker and un-rotates (strip + reverse)."""
    return [
        c[len(ROT_MARK):][::-1] if c.startswith(ROT_MARK) else c
        for c in contents
    ]


def ocr_page_arrays(
    region_boxes: np.ndarray,  # (n,4) OCR-able regions in det_order
    masks: np.ndarray,  # (m,4) formula masks (int coords as float)
    raw_boxes: np.ndarray,  # (r,4) raw text dets in det_idx order
    raw_scores: np.ndarray,  # (r,)
    raw_contents: list[str],
    use_angle_cls: bool = True,
) -> tuple[list, list, list]:
    """→ (boxes [x0,y0,x1,y1], scores, contents) in emission order."""
    out_boxes: list = []
    out_scores: list = []
    out_contents: list = []
    if len(raw_boxes) == 0 or len(region_boxes) == 0:
        return out_boxes, out_scores, out_contents
    if use_angle_cls:
        raw_contents = angle_cls(raw_contents)
    rcx = (raw_boxes[:, 0] + raw_boxes[:, 2]) / 2.0
    rcy = (raw_boxes[:, 1] + raw_boxes[:, 3]) / 2.0
    # sequential-sum score mean: matches the reference's sum()/len() to the
    # last bit (np.mean switches to pairwise summation above 8 elements)
    # and skips numpy dispatch overhead on these 1-5 element groups
    scores_list = raw_scores.tolist()
    # center containment on Python floats for the usual handful of raw
    # dets (same IEEE compares, ~6 numpy dispatches per region avoided)
    rcx_l, rcy_l = rcx.tolist(), rcy.tolist()
    n_raw = len(rcx_l)
    for reg in region_boxes.tolist():
        rx0, ry0, rx1, ry1 = reg
        nw, nh = rx1 - rx0 + 2 * _PAD, ry1 - ry0 + 2 * _PAD
        mine = [
            j for j in range(n_raw)
            if rx0 <= rcx_l[j] <= rx1 and ry0 <= rcy_l[j] <= ry1
        ]
        if not mine:
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
        # tiny-group inner loop on Python floats (identical IEEE doubles,
        # ~5µs numpy dispatch per flatnonzero/lexsort avoided per box)
        ccx = ((crop[:, 0] + crop[:, 2]) / 2.0).tolist()
        ccy = ((crop[:, 1] + crop[:, 3]) / 2.0).tolist()
        mine_l = mine
        m = len(mine_l)
        sx, sy = float(shift[0]), float(shift[1])
        for b in np.asarray(boxes).tolist():
            b0, b1, b2, b3 = b
            cons = [
                j for j in range(m)
                if b0 <= ccx[j] <= b2 and b1 <= ccy[j] <= b3
            ]
            cons.sort(key=lambda j: (ccx[j], j))  # (center_x, det_idx)
            if cons:
                s = 0.0
                for j in cons:
                    s += scores_list[mine_l[j]]
                score = s / len(cons)
            else:
                score = 0.0
            if score < schema.DROP_SCORE:
                continue
            out_boxes.append([b0 + sx, b1 + sy, b2 + sx, b3 + sy])
            out_scores.append(round(score, 2))
            out_contents.append(
                " ".join(raw_contents[mine_l[j]] for j in cons)
            )
    return out_boxes, out_scores, out_contents


def _ocr_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel over a salted-conversation group: iterates the
    group's (turn, page) slices via numpy boundaries (one pandas frame per
    GROUP is applyInPandas' own overhead — keep groups coarse, work in
    arrays)."""
    srt = pdf.sort_values(
        ["turn_idx", "page_seq", "branch", "det_idx"], kind="stable"
    )
    turn = srt["turn_idx"].to_numpy(np.int64)
    pseq = srt["page_seq"].to_numpy(np.int64)
    branch = srt["branch"].to_numpy(np.int64)
    dord = srt["det_order"].to_numpy(np.int64)
    boxes = srt[["x0", "y0", "x1", "y1"]].to_numpy(np.float64)
    score = srt["score"].to_numpy(np.float64)
    content = srt["content"].to_numpy(object)
    cat = srt["category"].to_numpy(object)
    pno = srt["page_no"].to_numpy(np.int64)
    pw = srt["page_w"].to_numpy(np.float64)
    ph = srt["page_h"].to_numpy(np.float64)
    conv = pdf["conv_id"].iat[0]

    key = turn * (pseq.max() + 1 if len(pseq) else 1) + pseq
    bounds = np.r_[0, np.flatnonzero(key[1:] != key[:-1]) + 1, len(key)]
    out = []
    region_set = frozenset(schema.OCR_REGION_CLASSES)
    for s, e in zip(bounds[:-1], bounds[1:]):
        pb = branch[s:e]
        pcat = cat[s:e]
        regions = np.array(
            [i for i in range(len(pb)) if pb[i] == 0 and pcat[i] in region_set],
            dtype=np.int64,
        )
        # within-page rows are sorted by (branch, det_idx): branch-0 rows
        # are in det_idx order == det_order order for regions; raws sorted
        # by det_idx as the fake detector requires (DESIGN.md §2)
        if len(regions):
            regions = regions[np.argsort(dord[s:e][regions], kind="stable")]
        masks = np.flatnonzero(pb == 1)
        raws = np.flatnonzero(pb == 2)
        model = pb < 2
        tboxes, tscores, tcontents = ocr_page_arrays(
            boxes[s:e][regions],
            boxes[s:e][masks],
            boxes[s:e][raws],
            score[s:e][raws],
            [content[s + i] for i in raws],
        )
        if not tboxes:
            continue
        offset = int(dord[s:e][model].max()) + 1 if model.any() else 0
        for i, b in enumerate(tboxes):
            out.append(
                (
                    conv, int(turn[s]), int(pseq[s]), int(pno[s]),
                    float(pw[s]), float(ph[s]), -1, offset + i, 2, "text",
                    tscores[i], b[0], b[1], b[2], b[3], tcontents[i],
                )
            )
    cols = [f.name for f in schema.DETECTIONS.fields]
    return pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)


def ocr_crop_assign(detections: DataFrame) -> DataFrame:
    """P1 region crop + the region×raw center-containment join
    (pdf2markdown.py:195-226 + paddle_ocr shape): for every OCR-able
    region, the raw text dets whose center falls inside it, with their
    crop-space coordinates (shifted by the region origin, padded 25px).
    This is the SQL-expressible prefix of the OCR merge stage — pure
    Catalyst theta join, DuckDB-twinned (tasks.ocr_crop_assign_sql);
    the sequential bubble/merge folds stay in ``ocr_page_arrays``."""
    pad = F.lit(_PAD)
    regions = detections.filter(
        (F.col("branch") == 0) & F.col("category").isin(schema.OCR_REGION_CLASSES)
    ).select(
        "conv_id", "turn_idx", "page_seq",
        F.col("det_order").alias("region_order"),
        F.col("x0").alias("rx0"), F.col("y0").alias("ry0"),
        F.col("x1").alias("rx1"), F.col("y1").alias("ry1"),
    )
    raws = detections.filter(F.col("branch") == 2).select(
        F.col("conv_id").alias("r_conv"), F.col("turn_idx").alias("r_turn"),
        F.col("page_seq").alias("r_page"),
        F.col("det_idx").alias("raw_idx"), "x0", "y0", "x1", "y1", "score",
    )
    cx = (F.col("x0") + F.col("x1")) / 2
    cy = (F.col("y0") + F.col("y1")) / 2
    joined = regions.join(
        raws,
        (F.col("r_conv") == F.col("conv_id"))
        & (F.col("r_turn") == F.col("turn_idx"))
        & (F.col("r_page") == F.col("page_seq"))
        & cx.between(F.col("rx0"), F.col("rx1"))
        & cy.between(F.col("ry0"), F.col("ry1")),
    )
    return joined.select(
        "conv_id", "turn_idx", "page_seq", "region_order", "raw_idx",
        (F.col("x0") - F.col("rx0") + pad).alias("crop_x0"),
        (F.col("y0") - F.col("ry0") + pad).alias("crop_y0"),
        (F.col("x1") - F.col("rx0") + pad).alias("crop_x1"),
        (F.col("y1") - F.col("ry0") + pad).alias("crop_y1"),
        "score",
    )


def ocr_text_spans(detections: DataFrame, salt: int = 16) -> DataFrame:
    """detections → final OCR text span rows (branch 2, DETECTIONS schema).

    Catalyst pre-filter shrinks the shuffle to exactly the rows the kernel
    needs: OCR-able regions (pdf2markdown.py:209), formula masks, raw dets.
    Grouping key = (conv_id, salted turn bucket): coarse enough to
    amortize per-group overhead, salted so one huge conversation spreads
    over ``salt`` groups (pages never split — page ⊂ turn ⊂ bucket)."""
    need = detections.filter(
        (F.col("branch") == 2)
        | (F.col("branch") == 1)
        | ((F.col("branch") == 0) & F.col("category").isin(schema.OCR_REGION_CLASSES))
    ).withColumn("salt", F.pmod(F.hash("turn_idx"), F.lit(salt)))
    return (
        need.groupBy("conv_id", "salt")
        .applyInPandas(lambda pdf: _ocr_group(pdf), schema=schema.DETECTIONS)
    )
