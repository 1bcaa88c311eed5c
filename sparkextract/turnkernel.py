"""Per-turn extraction kernel for the fused pipeline (fused.py).

Runs the post-detection stages — MFR (F1), OCR merge (O2/O7/J2), span→block
fill (J1), line/paragraph assembly (O3/A2), reading order (O1), markdown
emit (A3/A4) — for ONE turn, on the DETECTIONS-schema pandas frame the
parse stage emits. Numpy-vectorized where the reference loops; reuses the
same kernels the staged pipeline uses (ocr._ocr_page, kernels.merge_para,
kernels.latex_rm_whitespace), so both paths share one tested
implementation of each fold.

Why this exists: every turn is independent (SURVEY.md §3.1), so the
scale-optimal plan is parse+extract fused in one narrow mapInPandas —
zero shuffles before the final (conv_id, turn_idx) ordering window. The
staged pipeline (pipeline.extract) keeps each operator as a first-class
relational op; this kernel is the production fast path. Both must match
tests/oracle.py exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import kernels, schema
from .ocr import _ocr_page

_SPAN_CATS = frozenset(["inline", "text", "isolated"])
_FIX = frozenset(schema.FIX_BLOCK_TYPES)


def _fill_first_wins(sboxes: np.ndarray, bboxes: np.ndarray) -> np.ndarray:
    """J1 (merge_blocks_and_spans.py:111-155): for each span, index of the
    earliest block with overlap_area/span_area > 0.6, else -1. Vectorized
    (n_spans × n_blocks) — both are tens per page."""
    if len(sboxes) == 0 or len(bboxes) == 0:
        return np.full(len(sboxes), -1, dtype=np.int64)
    sx0, sy0, sx1, sy1 = (sboxes[:, i][:, None] for i in range(4))
    bx0, by0, bx1, by1 = (bboxes[:, i][None, :] for i in range(4))
    ox = np.minimum(sx1, bx1) - np.maximum(sx0, bx0)
    oy = np.minimum(sy1, by1) - np.maximum(sy0, by0)
    inter = np.where((ox >= 0) & (oy >= 0), ox * oy, 0.0)
    area = ((sx1 - sx0) * (sy1 - sy0)).repeat(len(bboxes), axis=1)
    ratio = np.divide(inter, area, out=np.zeros_like(inter), where=area > 0)
    hit = ratio > schema.FILL_RATIO
    first = np.where(hit.any(axis=1), hit.argmax(axis=1), -1)
    return first


def run_turn(pdf: pd.DataFrame) -> tuple[str, list[tuple]]:
    """One turn's detection rows → (main_text, spans). ``pdf`` must be the
    full DETECTIONS frame of the turn (branch -1 markers included)."""
    mds: list[str] = []
    out_spans: list[tuple] = []
    # page order: page_no, then payload occurrence (A4, DESIGN.md §3)
    page_seqs = (
        pdf[pdf["branch"] == -1][["page_no", "page_seq"]]
        .sort_values(["page_no", "page_seq"])["page_seq"]
        .tolist()
    )
    by_page = dict(tuple(pdf.groupby("page_seq", sort=False)))
    for ps in page_seqs:
        page = by_page.get(ps)
        dets = page[page["branch"] >= 0]
        if dets.empty:
            mds.append("")
            continue
        # MFR (F1) on the formula branch
        mfd_mask = dets["branch"] == 1
        if mfd_mask.any():
            dets = dets.copy()
            dets.loc[mfd_mask, "content"] = dets.loc[mfd_mask, "content"].map(
                kernels.latex_rm_whitespace
            )
        # OCR merge (shared kernel with the staged path)
        texts = _ocr_page(dets)
        final = pd.concat([dets[dets["branch"].isin([0, 1])], texts], ignore_index=True)
        final = final.sort_values("det_order", kind="stable").reset_index(drop=True)

        cats = final["category"].to_numpy(object)
        boxes = final[["x0", "y0", "x1", "y1"]].to_numpy(np.float64)
        contents = final["content"].to_numpy(object)
        scores = final["score"].to_numpy(np.float64)
        orders = final["det_order"].to_numpy(np.int64)

        is_span = np.array([c in _SPAN_CATS for c in cats])
        span_idx = np.flatnonzero(is_span)
        # blocks: non-span dets + isolated duplicated as isolate_formula
        block_rows = []  # (cat, det_row_index)
        for i in range(len(cats)):
            if cats[i] in _SPAN_CATS:
                if cats[i] == "isolated":
                    block_rows.append(("isolate_formula", i))
            else:
                block_rows.append((cats[i], i))
        bcats = [c for c, _ in block_rows]
        bidx = np.array([i for _, i in block_rows], dtype=np.int64)
        is_fixed = np.array([c in _FIX for c in bcats])
        fix_pos = np.flatnonzero(is_fixed)

        assign = _fill_first_wins(
            boxes[span_idx], boxes[bidx[fix_pos]] if len(fix_pos) else np.empty((0, 4))
        )
        # A2 per fixed block
        texts_by_block: dict[int, str] = {}
        for k, fp in enumerate(fix_pos):
            mine = span_idx[assign == k]
            texts_by_block[int(fp)] = kernels.merge_para(
                [cats[i] for i in mine],
                [contents[i] for i in mine],
                boxes[mine],
                orders[mine],
                is_interline=bcats[fp] == "isolate_formula",
            )
        # O1: untouched blocks first, then fixed, stable by det order
        order_key = []
        for k, (c, i) in enumerate(block_rows):
            okey = boxes[i][1] * schema.READ_ORDER_W + boxes[i][0]
            order_key.append((okey, 1 if is_fixed[k] else 0, orders[i], k))
        order_key.sort()
        md = ""
        for _okey, _fx, _o, k in order_key:
            c, i = block_rows[k]
            text = texts_by_block.get(k, "")
            if c == "title":
                md += "\n# " + text + "\n"
            elif c == "isolate_formula":
                md += "\n" + text + "\n"
            elif c in ("plain text", "figure_caption", "table_caption"):
                md += " " + text + " "
            out_spans.append(
                (c, float(boxes[i][0]), float(boxes[i][1]), float(boxes[i][2]),
                 float(boxes[i][3]), text, float(scores[i]))
            )
        mds.append(md)
    return "\n\n".join(mds), out_spans
