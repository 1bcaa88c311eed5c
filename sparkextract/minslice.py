"""Minimum end-to-end slice, 100% Catalyst (SURVEY.md §7.4).

Payload build → line explode → field split (tokenize) → conf filter (P2)
→ abandon-region containment anti-join (P5 boilerplate strip) → reading
order (O1) → ordered concat per doc (A3). No Python anywhere — the whole
slice is whole-stage-codegen'd, and it has a DuckDB oracle twin
(__spark_entry__.oracle_sql()['extract_min_slice']).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .docsource import payload_col, payload_sql

EMIT_CATS = ["title", "text", "plain text"]


def min_slice(documents: DataFrame) -> DataFrame:
    payload = documents.select("doc_id", payload_col().alias("p"))
    lines = payload.select(
        "doc_id", F.posexplode(F.split("p", "\n")).alias("idx", "line")
    ).where(F.col("line").startswith("@det "))
    # materialize the field array once per row (each F.get on a raw
    # expression would re-run substr+split)
    lines = lines.select(
        "doc_id", "idx", F.split(F.expr("substr(line, 6)"), "\\|").alias("f")
    )
    f = F.col("f")
    parsed = lines.select(
        "doc_id",
        "idx",
        F.get(f, 0).alias("category"),
        F.get(f, 1).cast("double").alias("score"),
        F.get(f, 2).cast("double").alias("x0"),
        F.get(f, 3).cast("double").alias("y0"),
        F.get(f, 4).cast("double").alias("x1"),
        F.get(f, 5).cast("double").alias("y1"),
        F.coalesce(F.get(f, 6), F.lit("")).alias("content"),
    ).where(F.col("score") > 0.25)
    abandon = parsed.where(F.col("category") == "abandon").select(
        F.col("doc_id").alias("a_doc"),
        F.col("x0").alias("ax0"),
        F.col("y0").alias("ay0"),
        F.col("x1").alias("ax1"),
        F.col("y1").alias("ay1"),
    )
    texty = parsed.where(
        F.col("category").isin(EMIT_CATS) & (F.col("content") != "")
    )
    cx, cy = (F.col("x0") + F.col("x1")) / 2, (F.col("y0") + F.col("y1")) / 2
    kept = texty.join(
        abandon,
        (F.col("doc_id") == F.col("a_doc"))
        & cx.between(F.col("ax0"), F.col("ax1"))
        & cy.between(F.col("ay0"), F.col("ay1")),
        "left_anti",
    )
    piece = F.when(
        F.col("category") == "title",
        F.concat(F.lit("\n# "), F.col("content"), F.lit("\n")),
    ).otherwise(F.concat(F.lit(" "), F.col("content"), F.lit(" ")))
    okey = F.col("y0") * 3000 + F.col("x0")
    rendered = kept.select(
        "doc_id", okey.alias("okey"), "idx", piece.alias("piece")
    )
    ordered = F.array_sort(F.collect_list(F.struct("okey", "idx", "piece")))
    return rendered.groupBy("doc_id").agg(
        F.array_join(F.transform(ordered, lambda x: x.piece), "").alias("mini_md")
    )


def min_slice_sql() -> str:
    """The DuckDB twin — byte-identical payload + identical plan in SQL."""
    return f"""
WITH payload AS (
  SELECT doc_id, {payload_sql()} AS p FROM documents
),
lines AS (
  SELECT doc_id,
         generate_subscripts(string_split(p, chr(10)), 1) - 1 AS idx,
         unnest(string_split(p, chr(10))) AS line
  FROM payload
),
parsed0 AS (
  SELECT doc_id, idx, string_split(substr(line, 6), '|') AS f
  FROM lines WHERE line LIKE '@det %'
),
parsed AS (
  SELECT doc_id, idx, f[1] AS category,
         CAST(f[2] AS DOUBLE) AS score,
         CAST(f[3] AS DOUBLE) AS x0, CAST(f[4] AS DOUBLE) AS y0,
         CAST(f[5] AS DOUBLE) AS x1, CAST(f[6] AS DOUBLE) AS y1,
         COALESCE(f[7], '') AS content
  FROM parsed0
),
conf AS (SELECT * FROM parsed WHERE score > 0.25),
abandon AS (SELECT doc_id, x0, y0, x1, y1 FROM conf WHERE category = 'abandon'),
texty AS (
  SELECT * FROM conf
  WHERE category IN ('title', 'text', 'plain text') AND content <> ''
),
kept AS (
  SELECT t.* FROM texty t
  WHERE NOT EXISTS (
    SELECT 1 FROM abandon a
    WHERE a.doc_id = t.doc_id
      AND (t.x0 + t.x1) / 2 BETWEEN a.x0 AND a.x1
      AND (t.y0 + t.y1) / 2 BETWEEN a.y0 AND a.y1
  )
),
pieces AS (
  SELECT doc_id, y0 * 3000 + x0 AS okey, idx,
         CASE WHEN category = 'title'
              THEN chr(10) || '# ' || content || chr(10)
              ELSE ' ' || content || ' ' END AS piece
  FROM kept
)
SELECT doc_id, string_agg(piece, '' ORDER BY okey, idx) AS mini_md
FROM pieces GROUP BY doc_id
"""
