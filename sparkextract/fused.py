"""Fused extraction pipeline — the production fast path.

Every turn is independent, so parse+detect+extract fuse into ONE narrow
``mapInPandas`` (all detections of a turn are produced inside the same
batch row — no grouping shuffle is ever needed). The only exchange in
the whole job is the mandated O8 ordering window over
(conv_id, turn_idx).

Plan shape at any scale:
  Scan → Filter(contains @page, pushed down) → MapInPandas → Window

vs the staged pipeline's ~6 exchanges. Same golden-equality guarantee:
tests/test_e2e_golden.py pins BOTH paths to tests/oracle.py. Use the
staged path to study operators relationally; use this to run 10^12 turns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import Row  # noqa: F401  (doc only)
from pyspark.sql.window import Window

from . import schema
from .parse import _parse_batch
from .turnkernel import run_turn


def _extract_batch(batch: pd.DataFrame) -> pd.DataFrame:
    dets = _parse_batch(batch)
    rows = []
    if not dets.empty:
        for (conv, turn), grp in dets.groupby(["conv_id", "turn_idx"], sort=False):
            main_text, spans = run_turn(grp)
            rows.append(
                (
                    conv,
                    int(turn),
                    main_text,
                    [
                        {"type": s[0], "x0": s[1], "y0": s[2], "x1": s[3],
                         "y1": s[4], "content": s[5], "score": s[6]}
                        for s in spans
                    ],
                )
            )
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "main_text", "spans"])


def extract_fused(transcripts: DataFrame, repartition: int = 0) -> DataFrame:
    """transcripts → extracted (schema.EXTRACTED + turn_seq), one Python
    stage, one shuffle (the O8 window)."""
    doc_turns = transcripts.filter(
        F.col("text").contains("@page ") | F.col("tool").contains("@page ")
    ).select("conv_id", "turn_idx", "text", "tool")
    if repartition > 0:
        doc_turns = doc_turns.repartition(
            repartition, F.col("conv_id"), F.pmod(F.hash("turn_idx"), F.lit(16))
        )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            yield _extract_batch(batch)

    out = doc_turns.mapInPandas(gen, schema=schema.EXTRACTED)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return out.withColumn("turn_seq", F.row_number().over(w))
