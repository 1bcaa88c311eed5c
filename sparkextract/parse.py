"""Stage 1 — payload tokenization + deterministic detection (M1/M3/M4).

One ``mapInPandas`` pass over transcripts: vectorized pandas string ops
tokenize the payload grammar (DESIGN.md §1); numpy kernels apply the
confidence filter (P2, score > 0.25), per-(page, branch, category) greedy
NMS (M3, IoU > 0.45), the reference's layout_dets ordering
(pdf2markdown.py:143-168: layout then mfd, each confidence-sorted), and
convert_format's int-truncation/round-2 (F7/F6, pdf2markdown.py:88-96).

No shuffle: each input row (turn) expands to its detection rows in place.
Raw OCR text detections (branch 2) pass through unconverted — the OCR
stage (ocr.py) consumes them. ``@page`` markers are emitted as branch -1
rows so empty pages still contribute to the markdown join (A4).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import kernels, schema


def _parse_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Vectorized payload → detection rows for one Arrow batch."""
    src = batch["text"].fillna("") + "\n" + batch["tool"].fillna("")
    lines = src.str.split("\n")
    ldf = pd.DataFrame(
        {
            "conv_id": batch["conv_id"].repeat(lines.str.len()).values,
            "turn_idx": batch["turn_idx"].repeat(lines.str.len()).values,
            "line": np.concatenate([np.asarray(x, dtype=object) for x in lines])
            if len(lines)
            else np.array([], dtype=object),
        }
    )
    is_page = ldf["line"].str.startswith("@page ")
    is_det = ldf["line"].str.startswith("@det ")
    ldf = ldf[is_page | is_det].copy()
    if ldf.empty:
        return pd.DataFrame(columns=[f.name for f in schema.DETECTIONS.fields])
    ldf["is_page"] = is_page[ldf.index].values
    # multi-column groupby, not a concatenated string key: building
    # "\x00"-joined keys costs two astype(str) passes over every line row
    tkey = [ldf["conv_id"], ldf["turn_idx"]]
    ldf["page_seq"] = ldf.groupby(tkey, sort=False)["is_page"].cumsum().astype("int32")
    ldf = ldf[ldf["page_seq"] > 0]  # @det before any @page is ignored
    ldf["page_seq"] -= 1

    pages = ldf[ldf["is_page"]]
    pp = pages["line"].str.split(" ", expand=True)
    for c in range(4):  # short headers ("@page 3") must not KeyError below
        if c not in pp.columns:
            pp[c] = None
    page_rows = pd.DataFrame(
        {
            "conv_id": pages["conv_id"].values,
            "turn_idx": pages["turn_idx"].values,
            "page_seq": pages["page_seq"].values,
            "page_no": pd.to_numeric(pp[1], errors="coerce").fillna(0).astype("int32").values,
            "page_w": pd.to_numeric(pp[2], errors="coerce").fillna(0.0).values,
            "page_h": pd.to_numeric(pp[3], errors="coerce").fillna(0.0).values,
        }
    )

    dets = ldf[~ldf["is_page"]]
    out_cols = dict(
        conv_id=dets["conv_id"].values,
        turn_idx=dets["turn_idx"].values,
        page_seq=dets["page_seq"].values,
    )
    fields = dets["line"].str.slice(5).str.split("|", n=6, expand=True)
    for c in range(7):
        if c not in fields.columns:
            fields[c] = None
    det_df = pd.DataFrame(out_cols)
    det_df["category"] = fields[0].values
    det_df["score"] = pd.to_numeric(fields[1], errors="coerce").values
    for i, c in enumerate(["x0", "y0", "x1", "y1"]):
        det_df[c] = pd.to_numeric(fields[2 + i], errors="coerce").values
    det_df["content"] = fields[6].fillna("").values
    det_df = det_df.dropna(subset=["score", "x0", "y0", "x1", "y1"])
    pkey = [det_df["conv_id"], det_df["turn_idx"], det_df["page_seq"]]
    det_df["det_idx"] = det_df.groupby(pkey, sort=False).cumcount()

    # --- classification into branches ---
    cat = det_df["category"]
    branch = np.select(
        [cat.isin(schema.LAYOUT_CLASSES), cat.isin(schema.FORMULA_CLASSES), cat == "text"],
        [0, 1, 2],
        default=-9,
    )
    det_df["branch"] = branch
    det_df = det_df[det_df["branch"] >= 0]
    # P2 conf filter for model branches (raw text dets are filtered later by drop_score)
    det_df = det_df[(det_df["branch"] == 2) | (det_df["score"] > schema.CONF_THRES)]

    if det_df.empty:
        det_df = det_df.assign(det_order=np.array([], dtype="int32"))
        det_df = det_df.merge(page_rows, on=["conv_id", "turn_idx", "page_seq"], how="left")
        return _with_markers(det_df, page_rows)

    # --- per (page, branch, category) greedy NMS on model branches ---
    det_df = det_df.sort_values(
        ["conv_id", "turn_idx", "page_seq", "branch", "category", "score", "det_idx"],
        ascending=[True, True, True, True, True, False, True],
        kind="stable",
    ).reset_index(drop=True)
    boxes = det_df[["x0", "y0", "x1", "y1"]].to_numpy(dtype=np.float64)
    # group boundaries from consecutive-row key changes (the frame is
    # already sorted by these keys) — no concatenated string key build
    _gc = det_df["conv_id"].to_numpy(object)
    _gt = det_df["turn_idx"].to_numpy()
    _gp = det_df["page_seq"].to_numpy()
    _gb = det_df["branch"].to_numpy()
    _gcat = det_df["category"].to_numpy(object)
    grp_change = (
        (_gc[1:] != _gc[:-1])
        | (_gt[1:] != _gt[:-1])
        | (_gp[1:] != _gp[:-1])
        | (_gb[1:] != _gb[:-1])
        | (_gcat[1:] != _gcat[:-1])
    )
    keep = np.ones(len(det_df), dtype=bool)
    model_rows = det_df["branch"].to_numpy() < 2
    start = 0
    for end in np.flatnonzero(np.r_[grp_change, True]) + 1:
        if model_rows[start] and end - start > 1:
            kept = kernels.nms_keep(
                boxes[start:end], np.arange(end - start), schema.IOU_THRES
            )
            mask = np.zeros(end - start, dtype=bool)
            mask[kept] = True
            keep[start:end] = mask
        start = end
    det_df = det_df[keep]

    # --- reference det ordering + convert_format ---
    det_df = det_df.sort_values(
        ["conv_id", "turn_idx", "page_seq", "branch", "score", "det_idx"],
        ascending=[True, True, True, True, False, True],
        kind="stable",
    ).reset_index(drop=True)
    pkey = [det_df["conv_id"], det_df["turn_idx"], det_df["page_seq"]]
    det_df["det_order"] = det_df.groupby(pkey, sort=False).cumcount().astype("int32")
    model = det_df["branch"] < 2
    for c in ("x0", "y0", "x1", "y1"):
        det_df.loc[model, c] = np.trunc(det_df.loc[model, c])  # F7: int()
    det_df.loc[model, "score"] = np.round(det_df.loc[model, "score"], 2)  # F6

    det_df = det_df.merge(page_rows, on=["conv_id", "turn_idx", "page_seq"], how="left")
    return _with_markers(det_df, page_rows)


def _with_markers(det_df: pd.DataFrame, page_rows: pd.DataFrame) -> pd.DataFrame:
    marker = page_rows.assign(
        det_idx=np.int32(-1),
        det_order=np.int32(-1),
        branch=np.int32(-1),
        category="@page",
        score=0.0,
        x0=0.0,
        y0=0.0,
        x1=0.0,
        y1=0.0,
        content="",
    )
    out = pd.concat([det_df, marker], ignore_index=True)
    out["turn_idx"] = out["turn_idx"].astype("int32")
    for c in ("page_seq", "page_no", "det_idx", "det_order", "branch"):
        out[c] = out[c].astype("int32")
    return out[[f.name for f in schema.DETECTIONS.fields]]


def parse_detections(transcripts: DataFrame) -> DataFrame:
    """transcripts → detections (schema.DETECTIONS). Filters non-document
    turns Catalyst-side so the UDF only sees payload rows (pushdown-friendly:
    the contains() predicate reaches the parquet scan)."""
    doc_turns = transcripts.filter(
        F.col("text").contains("@page ") | F.col("tool").contains("@page ")
    ).select("conv_id", "turn_idx", "text", "tool")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            yield _parse_batch(batch)

    return doc_turns.mapInPandas(gen, schema=schema.DETECTIONS)
