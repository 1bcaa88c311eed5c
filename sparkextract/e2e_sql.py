"""FULL-PIPELINE DuckDB twin: ``pipeline.extract`` end-to-end in SQL.

Round 3 closes the last rows-only gap: the flagship extraction queries
(extract_pipeline / extract_fused) get a complete DuckDB oracle. The
chain composes every previously-built twin and expresses the remaining
stages relationally:

  detections_sql_cte      — payload tokenize, P2, recursive-CTE NMS (M3)
  ocr_spans_cte_chain     — M6-M9 merge layer (bubble pass recursive CTE)
  f1_fixpoint_cte         — M5/F1 latex whitespace fixpoint
  spans/blocks/fill (J1)  — theta join + first-wins window (this module)
  merge_para (O3/O4/A2)   — lag sessionization + per-line x windows +
                            type templates + zh concat rule (this module)
  render/emit (P5/O1/A3/A4/O8) — ordered string_agg per page and turn

merge_para's fold is lag-expressible because (a) an 'isolated' span is
always a singleton line — it opens a new line, and the next span sees
`any(isolated in current line)` — so the break rule only ever inspects
the PREVIOUS span, and (b) the per-line x-sort key is (x0, y-order
position), both window-computable. Python ``str.strip()`` maps to
``trim(x, ' \\t\\n\\r\\x0b\\x0c')`` (ASCII whitespace — the corpus
carries no unicode spaces), ``str.strip('$')`` to ``trim(x, '$')``.

The spans column is hashed through a CANONICAL rendering (field-joined
with '|', integer centi-unit coords/scores, chr(31) between spans) built
identically on the Spark side (__spark_entry__), because Spark's to_json
float formatting is not reproducible in another engine.

Reference semantics: pdf2markdown.py:262-324 (render + reading order),
merge_blocks_and_spans.py:19-88,111-155,228-268 (fill + merge_para).
"""

from __future__ import annotations

from . import schema

_WS = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"


def _pystrip(x: str) -> str:
    """Python str.strip() over ASCII whitespace."""
    return f"trim({x}, {_WS})"


def _mdesc(x: str) -> str:
    r"""F3 md_escape: \* \` \~ \$ (kernels.md_escape order)."""
    return (
        f"replace(replace(replace(replace({x}, "
        "'*', '\\*'), '`', '\\`'), '~', '\\~'), '$', '\\$')"
    )


def _yov(cur_y0: str, cur_y1: str, prev_y0: str, prev_y1: str) -> str:
    """y_overlap_gt(cur, prev) > 0.8 with the den<=0 guard (DESIGN §3)."""
    den = f"LEAST({cur_y1} - {cur_y0}, {prev_y1} - {prev_y0})"
    ov = f"GREATEST(LEAST({cur_y1}, {prev_y1}) - GREATEST({cur_y0}, {prev_y0}), 0)"
    return f"(CASE WHEN {den} <= 0 THEN FALSE ELSE {ov} / {den} > {schema.Y_OVERLAP} END)"


def _span_render(t: str, x0: str, y0: str, x1: str, y1: str, c: str, s: str) -> str:
    """Canonical engine-portable span rendering (matches the Spark side).
    Numbers render as integer centi-units — NOT printf('%.2f'): Java's
    format_string rounds HALF_UP where C printf rounds half-even, so a
    double landing exactly on a .xx5 midpoint (possible for OCR score
    means, e.g. 0.625) would format differently. trunc-to-bigint of
    value*100 is exact on both engines (coords are integral, scores are
    already round(x,2))."""
    centi = lambda v: f"CAST(trunc({v} * 100) AS BIGINT)"  # noqa: E731
    return (
        f"{t} || '|' || {centi(x0)} || '|' || {centi(y0)}"
        f" || '|' || {centi(x1)} || '|' || {centi(y1)}"
        f" || '|' || {c} || '|' || CAST(round({s} * 100) AS BIGINT)"
    )


def extract_sql(payload_cte: str | None = None) -> str:
    """``payload_cte`` (default: documents-template synthesis) swaps the
    payload source — pass ``tasks.transcripts_payload_cte()`` to oracle a
    raw transcripts table (the adversarial-fuzz path)."""
    from .mfr import f1_fixpoint_cte
    from .tasks import detections_sql_cte, ocr_spans_cte_chain

    fix_in = ", ".join(f"'{c}'" for c in schema.FIX_BLOCK_TYPES)
    w = float(schema.READ_ORDER_W)
    fill = float(schema.FILL_RATIO)
    body = "trim(span_content, '$')"
    c_expr = f"""CASE etype
      WHEN 'text' THEN {_mdesc("span_content")}
      WHEN 'inline' THEN ' $' || {body} || '$ '
      WHEN 'ignore-formula' THEN ' $' || {body} || '$ '
      WHEN 'isolated' THEN chr(10) || '$$' || chr(10) || {body} || chr(10) || '$$' || chr(10)
      WHEN 'footnote' THEN CASE WHEN contains({body}, '^')
           THEN ' $' || {body} || '$ ' ELSE ' $^' || {body} || '$ ' END
      ELSE '' END"""
    f1_base = """
fr_base AS (
  SELECT doc_id, page_seq, det_idx, content FROM ordered WHERE branch = 1
),"""
    return f"""{detections_sql_cte(payload_cte)},
{ocr_spans_cte_chain()},{f1_base}
{f1_fixpoint_cte("fr_base").lstrip()},
final_dets AS MATERIALIZED (
  -- parse output shape: model branches F6/F7-converted; branch 1 carries
  -- the F1'd latex; branch 2 is the OCR merge output
  SELECT doc_id, page_seq, det_order, CAST(0 AS INT) AS branch, category,
         round(score, 2) AS score,
         trunc(x0) AS x0, trunc(y0) AS y0, trunc(x1) AS x1, trunc(y1) AS y1,
         content
  FROM ordered WHERE branch = 0
  UNION ALL
  SELECT b.doc_id, b.page_seq, b.det_order, CAST(1 AS INT), b.category,
         round(b.score, 2),
         trunc(b.x0), trunc(b.y0), trunc(b.x1), trunc(b.y1), f.content
  FROM ordered b
  JOIN f1_done f ON f.doc_id = b.doc_id AND f.page_seq = b.page_seq
                AND f.det_idx = b.det_idx
  WHERE b.branch = 1
  UNION ALL
  SELECT doc_id, page_seq, det_order, CAST(2 AS INT), category, score,
         x0, y0, x1, y1, content
  FROM ocr_out
),
span_pool AS (
  SELECT doc_id, page_seq, det_order AS span_order, category AS span_type,
         x0 AS sx0, y0 AS sy0, x1 AS sx1, y1 AS sy1, content AS span_content
  FROM final_dets WHERE category IN ('inline', 'text', 'isolated')
),
blk AS (
  SELECT doc_id, page_seq, det_order AS block_order, category AS block_type,
         score, x0 AS bx0, y0 AS by0, x1 AS bx1, y1 AS by1,
         category IN ({fix_in}) AS is_fixed
  FROM final_dets WHERE branch = 0
  UNION ALL
  SELECT doc_id, page_seq, det_order, 'isolate_formula', score,
         x0, y0, x1, y1, TRUE
  FROM final_dets WHERE category = 'isolated'
),
filled AS (  -- J1: consuming first-wins fill (theta join + window)
  SELECT * FROM (
    SELECT s.doc_id, s.page_seq, b.block_order, b.block_type, s.span_order,
           s.span_type, s.sx0, s.sy0, s.sx1, s.sy1, s.span_content,
           ROW_NUMBER() OVER (PARTITION BY s.doc_id, s.page_seq, s.span_order
                              ORDER BY b.block_order) AS rn
    FROM span_pool s
    JOIN blk b ON b.doc_id = s.doc_id AND b.page_seq = s.page_seq AND b.is_fixed
    WHERE CASE WHEN LEAST(s.sx1, b.bx1) - GREATEST(s.sx0, b.bx0) >= 0
                AND LEAST(s.sy1, b.by1) - GREATEST(s.sy0, b.by0) >= 0
                AND (s.sx1 - s.sx0) * (s.sy1 - s.sy0) > 0
           THEN (LEAST(s.sx1, b.bx1) - GREATEST(s.sx0, b.bx0))
                * (LEAST(s.sy1, b.by1) - GREATEST(s.sy0, b.by0))
                / ((s.sx1 - s.sx0) * (s.sy1 - s.sy0))
           ELSE 0.0 END > {fill}
  ) WHERE rn = 1
),
mp0 AS (  -- fix_text_block + stable y-order (pool_order tiebreak)
  SELECT *, CASE WHEN block_type <> 'isolate_formula' AND span_type = 'isolated'
                 THEN 'inline' ELSE span_type END AS etype,
         ROW_NUMBER() OVER (PARTITION BY doc_id, page_seq, block_order
                            ORDER BY sy0, span_order) AS ypos
  FROM filled
),
mp1 AS (  -- line breaks: isolated singletons + y-overlap vs predecessor
  SELECT *, CASE WHEN pety IS NULL THEN 1
                 WHEN etype = 'isolated' OR pety = 'isolated' THEN 1
                 WHEN NOT {_yov("sy0", "sy1", "py0", "py1")} THEN 1
                 ELSE 0 END AS nl
  FROM (SELECT *, lag(etype) OVER wb AS pety,
               lag(sy0) OVER wb AS py0, lag(sy1) OVER wb AS py1
        FROM mp0
        WINDOW wb AS (PARTITION BY doc_id, page_seq, block_order ORDER BY ypos))
),
mp2 AS (
  SELECT *, SUM(nl) OVER (PARTITION BY doc_id, page_seq, block_order
                          ORDER BY ypos) AS line_id
  FROM mp1
),
mp3 AS (  -- O4: stable x-sort within the line's y-order sequence
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, page_seq, block_order, line_id
                               ORDER BY sx0, ypos) AS xpos
  FROM mp2
),
lz AS (  -- per-line zh decision over the joined text contents
  SELECT doc_id, page_seq, block_order, line_id,
         COALESCE(string_agg(CASE WHEN etype = 'text'
                                  THEN {_pystrip("span_content")} END,
                             '' ORDER BY xpos), '') AS joined
  FROM mp3 GROUP BY 1, 2, 3, 4
),
cpiece AS (
  SELECT m.*, (l.joined <> '' AND regexp_matches(l.joined, '[一-鿿]')) AS zh,
         {c_expr} AS c
  FROM mp3 m JOIN lz l USING (doc_id, page_seq, block_order, line_id)
),
paras AS (  -- A2: ordered concat, zh drops the trailing space
  SELECT doc_id, page_seq, block_order,
         COALESCE(string_agg(
           CASE WHEN c <> '' THEN
             CASE WHEN zh THEN {_pystrip("c")} ELSE {_pystrip("c")} || ' ' END
           END, '' ORDER BY line_id, xpos), '') AS para_text
  FROM cpiece GROUP BY 1, 2, 3
),
btext AS (
  SELECT b.*, CASE WHEN b.is_fixed THEN COALESCE(p.para_text, '') ELSE '' END AS btxt
  FROM blk b LEFT JOIN paras p USING (doc_id, page_seq, block_order)
),
rendered AS (  -- A3 templates + O1 reading-order key (P5 strips to '')
  SELECT doc_id, page_seq,
         by0 * {w} + bx0 AS okey,
         CAST(is_fixed AS INT) AS fixed_rank, block_order,
         CASE block_type
              WHEN 'title' THEN chr(10) || '# ' || btxt || chr(10)
              WHEN 'isolate_formula' THEN chr(10) || btxt || chr(10)
              WHEN 'plain text' THEN ' ' || btxt || ' '
              WHEN 'figure_caption' THEN ' ' || btxt || ' '
              WHEN 'table_caption' THEN ' ' || btxt || ' '
              ELSE '' END AS piece,
         {_span_render("block_type", "bx0", "by0", "bx1", "by1", "btxt", "score")}
           AS span_r
  FROM btext
),
pagemd AS (
  SELECT doc_id, page_seq,
         COALESCE(string_agg(piece, '' ORDER BY okey, fixed_rank, block_order), '')
           AS page_md,
         string_agg(span_r, chr(31) ORDER BY okey, fixed_rank, block_order)
           AS page_spans
  FROM rendered GROUP BY 1, 2
),
perpage AS (  -- empty pages survive through the page markers (A4 join)
  SELECT pg.doc_id, pg.page_seq, pg.page_no,
         COALESCE(pm.page_md, '') AS page_md, pm.page_spans
  FROM pages pg LEFT JOIN pagemd pm USING (doc_id, page_seq)
),
turns AS (
  SELECT doc_id,
         COALESCE(string_agg(page_md, chr(10) || chr(10)
                             ORDER BY page_no, page_seq), '') AS main_text,
         md5(COALESCE(string_agg(page_spans, chr(31)
                                 ORDER BY page_no, page_seq), '')) AS spans_fp
  FROM perpage GROUP BY doc_id
)
SELECT p.conv_id, p.turn_idx,
       CAST(ROW_NUMBER() OVER (PARTITION BY p.conv_id ORDER BY p.turn_idx) AS INT)
         AS turn_seq,
       t.main_text, t.spans_fp
FROM turns t JOIN payload p USING (doc_id)
"""
