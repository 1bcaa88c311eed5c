"""Deterministic documents→transcripts adapter.

The driver's testdata has no transcripts table, so the flagship entry
wraps each ``documents`` row into the payload grammar (DESIGN.md §1)
with fixed geometry. The SAME template generates both the Spark Column
expression and the DuckDB SQL string, so the min-slice oracle parses a
byte-identical payload.

Template placeholders: ("sub", start, len) → substr of the sanitized doc
text; ("id",) → the doc_id; plain str → literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one synthetic page per document; mixes every det branch:
# title+text lines, plain-text block with inline/isolated formulas,
# an abandon region (boilerplate strip), a sub-threshold junk det, an
# NMS-suppressed duplicate (IoU 0.95 with the plain-text block), and an
# overlapping-but-below-IoU caption pair (IoU 0.10 — both survive), so
# M3 greedy NMS is actually exercised by the driver corpus.
PAYLOAD_TEMPLATE: list[list] = [
    ["@page 0 1654 2339"],
    ["@det title|0.95|100|80|1400|140|"],
    ["@det text|0.9|110|90|800|128|Report ", ("id",)],
    ["@det plain text|0.92|100|200|1400|460|"],
    ["@det plain text|0.85|105|205|1395|455|"],
    ["@det text|0.88|120|215|900|243|", ("sub", 1, 120)],
    ["@det inline|0.8|950|246|1100|270|x ^ { 2 } + y _ { 1 }"],
    ["@det text|0.86|120|250|900|278|", ("sub", 181, 120)],
    ["@det isolated|0.9|400|300|1200|370|\\sum _ { i = 0 } x _ { i }"],
    ["@det text|0.84|120|380|1380|408|", ("sub", 301, 150)],
    ["@det figure_caption|0.9|100|500|700|560|"],
    ["@det figure_caption|0.88|600|500|1100|560|"],
    ["@det table|0.91|100|600|1000|900|r1c1 & r1c2"],
    ["@det abandon|0.7|100|2200|800|2260|"],
    ["@det text|0.9|110|2210|700|2250|footer ", ("id",)],
    ["@det figure|0.2|0|0|10|10|junk"],
]


def payload_col() -> F.Column:
    """Spark Column building the payload from columns text, doc_id."""
    t = F.translate(F.col("text"), "|\n", "  ")
    parts = []
    for line in PAYLOAD_TEMPLATE:
        pieces = []
        for p in line:
            if isinstance(p, str):
                pieces.append(F.lit(p))
            elif p[0] == "sub":
                pieces.append(F.substring(t, p[1], p[2]))
            else:
                pieces.append(F.col("doc_id").cast("string"))
        parts.append(F.concat(*pieces) if len(pieces) > 1 else pieces[0])
    return F.concat_ws("\n", *parts)


def payload_sql(doc_text: str = "text", doc_id: str = "doc_id") -> str:
    """DuckDB SQL expression building the identical payload string."""
    t = f"translate({doc_text}, '|' || chr(10), '  ')"
    parts = []
    for line in PAYLOAD_TEMPLATE:
        pieces = []
        for p in line:
            if isinstance(p, str):
                pieces.append("'" + p.replace("\\", "\\") .replace("'", "''") + "'")
            elif p[0] == "sub":
                pieces.append(f"substr({t}, {p[1]}, {p[2]})")
            else:
                pieces.append(f"CAST({doc_id} AS VARCHAR)")
        parts.append(" || ".join(pieces))
    joined = ", ".join(parts)
    return f"concat_ws(chr(10), {joined})"


def replicate_documents(documents: DataFrame, factor: int) -> DataFrame:
    """Deterministic corpus scaling for benchmarks: factor copies with
    distinct doc_ids (doc_id*factor + r). Narrow op — no shuffle."""
    if factor <= 1:
        return documents
    r = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("r")
    return documents.select(r, "*").select(
        (F.col("doc_id") * factor + F.col("r")).alias("doc_id"), "text"
    )


def documents_as_transcripts(documents: DataFrame, convs: int = 97) -> DataFrame:
    """documents → transcripts-shaped DataFrame (input_hint schema)."""
    return documents.select(
        F.format_string("conv-%06d", (F.col("doc_id") % convs).cast("int")).alias(
            "conv_id"
        ),
        (F.col("doc_id") / convs).cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        payload_col().alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") * 60).alias("ts"),
    )
