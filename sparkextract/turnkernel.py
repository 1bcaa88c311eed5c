"""Per-turn extraction kernel for the fused pipeline (fused.py).

Runs the post-detection stages — MFR (F1), OCR merge (O2/O7/J2), span→block
fill (J1), line/paragraph assembly (O3/A2), reading order (O1), markdown
emit (A3/A4) — for ONE turn, on plain numpy arrays (no per-group pandas
frames: at ~tens of detections per page, frame construction costs more
than the work). Shares the fold kernels with the staged pipeline
(ocr.ocr_page_arrays, kernels.merge_para, kernels.latex_rm_whitespace) —
one tested implementation of each reference fold.

Why this exists: every turn is independent (SURVEY.md §3.1), so the
scale-optimal plan is parse+extract fused in one narrow mapInPandas —
zero shuffles before the final (conv_id, turn_idx) ordering window. The
staged pipeline (pipeline.extract) keeps each operator as a first-class
relational op; this kernel is the production fast path. Both must match
tests/oracle.py exactly.
"""

from __future__ import annotations

import numpy as np

from . import kernels, schema
from .ocr import ocr_page_arrays

_SPAN_CATS = frozenset(["inline", "text", "isolated"])
_FIX = frozenset(schema.FIX_BLOCK_TYPES)
_OCR_REGION = frozenset(schema.OCR_REGION_CLASSES)


def _fill_first_wins(sboxes: np.ndarray, bboxes: np.ndarray) -> np.ndarray:
    """J1 (merge_blocks_and_spans.py:111-155): for each span, index of the
    earliest block with overlap_area/span_area > 0.6, else -1. Vectorized
    (n_spans × n_blocks) — both are tens per page."""
    if len(sboxes) == 0 or len(bboxes) == 0:
        return np.full(len(sboxes), -1, dtype=np.int64)
    if len(sboxes) * len(bboxes) <= 64:
        # tiny-page fast path: same IEEE arithmetic on Python floats,
        # first-qualifying-block scan ≡ argmax of the hit matrix
        srows = sboxes.tolist()
        brows = bboxes.tolist()
        out = []
        for s in srows:
            area = (s[2] - s[0]) * (s[3] - s[1])
            hit = -1
            if area > 0:
                for bi, b in enumerate(brows):
                    ox = min(s[2], b[2]) - max(s[0], b[0])
                    oy = min(s[3], b[3]) - max(s[1], b[1])
                    if ox >= 0 and oy >= 0 and (ox * oy) / area > schema.FILL_RATIO:
                        hit = bi
                        break
            out.append(hit)
        return np.asarray(out, dtype=np.int64)
    sx0, sy0, sx1, sy1 = (sboxes[:, i][:, None] for i in range(4))
    bx0, by0, bx1, by1 = (bboxes[:, i][None, :] for i in range(4))
    ox = np.minimum(sx1, bx1) - np.maximum(sx0, bx0)
    oy = np.minimum(sy1, by1) - np.maximum(sy0, by0)
    inter = np.where((ox >= 0) & (oy >= 0), ox * oy, 0.0)
    area = np.broadcast_to((sx1 - sx0) * (sy1 - sy0), inter.shape)
    ratio = np.divide(inter, area, out=np.zeros_like(inter), where=area > 0)
    hit = ratio > schema.FILL_RATIO
    return np.where(hit.any(axis=1), hit.argmax(axis=1), -1)


def run_turn_arrays(
    page_list: list[tuple[int, int]],  # (page_no, page_seq) marker rows
    page_seq: np.ndarray,  # per-det arrays, any order within a page=det_order
    branch: np.ndarray,
    det_order: np.ndarray,
    category: np.ndarray,  # object
    score: np.ndarray,
    boxes: np.ndarray,  # (n,4)
    content: np.ndarray,  # object
    det_idx: np.ndarray,  # payload order — raw-det tiebreak (paddle_ocr.py)
    f1_cache: dict | None = None,  # per-batch memo for the F1 fixpoint
) -> tuple[str, list[tuple]]:
    """One turn's detection arrays → (main_text, spans list of tuples).

    ``f1_cache`` (optional, supplied per Arrow batch by the fused
    engine) memoizes ``latex_rm_whitespace`` — a pure string→string
    fixpoint of ~10 regex passes — for formula strings repeated within
    the batch; bounded by the batch's distinct formulas, dropped with
    the batch."""
    mds: list[str] = []
    out_spans: list[tuple] = []
    order_pages = sorted(page_list)  # (page_no, page_seq): A4 page order
    for _pn, ps in order_pages:
        sel = np.flatnonzero(page_seq == ps)
        if len(sel) == 0:
            mds.append("")
            continue
        sel = sel[np.argsort(det_order[sel], kind="stable")]
        pb = branch[sel]
        pcat = category[sel]
        pscore = score[sel]
        pbox = boxes[sel]
        pcontent = content[sel].copy()
        pord = det_order[sel]
        pidx = det_idx[sel]

        # MFR (F1) on the formula branch
        for k in np.flatnonzero(pb == 1):
            c = pcontent[k]
            if f1_cache is None:
                pcontent[k] = kernels.latex_rm_whitespace(c)
            else:
                v = f1_cache.get(c)
                if v is None:
                    v = kernels.latex_rm_whitespace(c)
                    f1_cache[c] = v
                pcontent[k] = v

        # OCR merge: regions = OCR-able layout dets (pdf2markdown.py:209)
        model = pb < 2
        # raws MUST be in det_idx (payload) order: ocr_page_arrays' contract —
        # bubble_pass tiebreak + cons content-join lexsort follow input order
        # (paddle_ocr.py sorted_boxes / oracle run_page raws). det_order for
        # branch 2 is score-desc, so re-sort here (staged path: ocr.py:86).
        raws = np.flatnonzero(pb == 2)
        raws = raws[np.argsort(pidx[raws], kind="stable")]
        reg_sel = np.array(
            [i for i in range(len(pb))
             if pb[i] == 0 and pcat[i] in _OCR_REGION],
            dtype=np.int64,
        )
        mask_sel = np.flatnonzero(pb == 1)
        tboxes, tscores, tcontents = ocr_page_arrays(
            pbox[reg_sel], pbox[mask_sel],
            pbox[raws], pscore[raws], [pcontent[i] for i in raws],
        )
        offset = int(pord[model].max()) + 1 if model.any() else 0

        # final page dets = model dets + OCR text spans, in det_order
        n_model = int(model.sum())
        n = n_model + len(tboxes)
        cats = np.empty(n, dtype=object)
        fbox = np.empty((n, 4), dtype=np.float64)
        fcontent = np.empty(n, dtype=object)
        fscore = np.empty(n, dtype=np.float64)
        ford = np.empty(n, dtype=np.int64)
        mi = np.flatnonzero(model)
        cats[:n_model] = pcat[mi]
        fbox[:n_model] = pbox[mi]
        fcontent[:n_model] = pcontent[mi]
        fscore[:n_model] = pscore[mi]
        ford[:n_model] = pord[mi]
        for j in range(len(tboxes)):
            cats[n_model + j] = "text"
            fbox[n_model + j] = tboxes[j]
            fcontent[n_model + j] = tcontents[j]
            fscore[n_model + j] = tscores[j]
            ford[n_model + j] = offset + j

        # spans pool + block list (pdf2markdown.py:272-298)
        span_idx: list[int] = []
        block_rows: list[tuple[str, int]] = []
        for i in range(n):
            c = cats[i]
            if c in _SPAN_CATS:
                span_idx.append(i)
                if c == "isolated":
                    block_rows.append(("isolate_formula", i))
            else:
                block_rows.append((c, i))
        span_idx = np.asarray(span_idx, dtype=np.int64)
        is_fixed = np.array([c in _FIX for c, _ in block_rows], dtype=bool)
        fix_pos = np.flatnonzero(is_fixed)
        bidx = np.array([i for _, i in block_rows], dtype=np.int64)

        assign = _fill_first_wins(
            fbox[span_idx],
            fbox[bidx[fix_pos]] if len(fix_pos) else np.empty((0, 4)),
        )
        texts_by_block: dict[int, str] = {}
        for k, fp in enumerate(fix_pos):
            mine = span_idx[assign == k]
            texts_by_block[int(fp)] = kernels.merge_para(
                [cats[i] for i in mine],
                [fcontent[i] for i in mine],
                fbox[mine],
                ford[mine],
                is_interline=block_rows[fp][0] == "isolate_formula",
            )

        # O1 reading order: untouched first, then fixed, stable (DESIGN §3)
        okeys = sorted(
            (fbox[i][1] * schema.READ_ORDER_W + fbox[i][0],
             1 if is_fixed[k] else 0, ford[i], k)
            for k, (_c, i) in enumerate(block_rows)
        )
        md = ""
        for _ok, _fx, _o, k in okeys:
            c, i = block_rows[k]
            text = texts_by_block.get(k, "")
            if c == "title":
                md += "\n# " + text + "\n"
            elif c == "isolate_formula":
                md += "\n" + text + "\n"
            elif c in ("plain text", "figure_caption", "table_caption"):
                md += " " + text + " "
            out_spans.append(
                (c, float(fbox[i][0]), float(fbox[i][1]), float(fbox[i][2]),
                 float(fbox[i][3]), text, float(fscore[i]))
            )
        mds.append(md)
    return "\n\n".join(mds), out_spans
