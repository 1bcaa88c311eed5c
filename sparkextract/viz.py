"""S6 visualization sink (utils/visualization.py:45-89 analog).

The reference rasterizes class-colored bbox rectangles + ``class:score``
labels onto the page image with cv2. This environment has no raster
libs — and a Spark-first debug sink shouldn't ship pixels through the
driver anyway — so the analog renders the SAME geometry as one SVG
document per page: filled rect (alpha 0.3) + stroked outline + label,
colors from the standard PASCAL-VOC colormap the reference's
``colormap()`` generates, drawn in det_order like the reference's
per-detection loop. Pure Catalyst string assembly — whole-stage codegen,
no UDF, and a DuckDB SQL twin (``visualize_svg_sql``) for the driver gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import schema


def _voc_color(i: int) -> str:
    """PASCAL-VOC colormap entry i as #rrggbb (the bit-reversal colormap
    the reference's utils/visualization.py:5-43 computes)."""
    r = g = b = 0
    c = i
    for j in range(8):
        r |= ((c >> 0) & 1) << (7 - j)
        g |= ((c >> 1) & 1) << (7 - j)
        b |= ((c >> 2) & 1) << (7 - j)
        c >>= 3
    return f"#{r:02x}{g:02x}{b:02x}"


CLASS_COLORS: dict[str, str] = {
    name: _voc_color(cid) for cid, name in enumerate(schema.LAYOUT_CLASSES)
}

_RECT_FMT = (
    '<rect x="%d" y="%d" width="%d" height="%d" fill="%s" fill-opacity="0.3"'
    ' stroke="%s" stroke-width="2"/><text x="%d" y="%d" fill="#ffffff">%s:%.3f</text>'
)


def visualize_svg(detections: DataFrame) -> DataFrame:
    """Layout detections → one SVG document per page (conv_id, turn_idx,
    page_seq, svg). Input is the DETECTIONS schema; branch-0 rows render
    in det_order (the reference draws per detection in result order)."""
    dets = detections.filter(F.col("branch") == 0)
    color_args: list = []
    for name, hexcol in CLASS_COLORS.items():
        color_args += [F.lit(name), F.lit(hexcol)]
    color = F.create_map(*color_args)[F.col("category")]
    xi = F.col("x0").cast("int")
    yi = F.col("y0").cast("int")
    wi = (F.col("x1") - F.col("x0")).cast("int")
    hi = (F.col("y1") - F.col("y0")).cast("int")
    piece = F.format_string(
        _RECT_FMT, xi, yi, wi, hi, color, color, xi, yi - F.lit(5),
        F.col("category"), F.col("score"),
    )
    rows = dets.select(
        "conv_id", "turn_idx", "page_seq", "page_w", "page_h",
        F.struct(F.col("det_order"), piece.alias("piece")).alias("p"),
    )
    body = F.array_join(
        F.transform(F.array_sort(F.collect_list("p")), lambda x: x.piece), ""
    )
    header = F.format_string(
        '<svg xmlns="http://www.w3.org/2000/svg" width="%d" height="%d">',
        F.col("page_w").cast("int"), F.col("page_h").cast("int"),
    )
    return rows.groupBy("conv_id", "turn_idx", "page_seq", "page_w", "page_h").agg(
        F.concat(header, body, F.lit("</svg>")).alias("svg")
    ).select("conv_id", "turn_idx", "page_seq", "svg")


def visualize_svg_sql() -> str:
    """DuckDB twin over the documents corpus: wraps the layout-detection
    twin (tasks.layout_detection_sql) with the identical SVG assembly."""
    from .tasks import layout_detection_sql

    case_color = " ".join(
        f"WHEN '{name}' THEN '{hexcol}'" for name, hexcol in CLASS_COLORS.items()
    )
    return f"""
WITH det AS ({layout_detection_sql()}),
pieces AS (
  SELECT conv_id, turn_idx, page_seq, page_w, page_h, det_order,
         printf('{_RECT_FMT}',
                CAST(trunc(x0) AS INT), CAST(trunc(y0) AS INT),
                CAST(trunc(x1 - x0) AS INT), CAST(trunc(y1 - y0) AS INT),
                col, col, CAST(trunc(x0) AS INT), CAST(trunc(y0) AS INT) - 5,
                category, score) AS piece
  FROM (SELECT *, CASE category {case_color} END AS col FROM det)
)
SELECT conv_id, turn_idx, page_seq,
       printf('<svg xmlns="http://www.w3.org/2000/svg" width="%d" height="%d">',
              CAST(trunc(page_w) AS INT), CAST(trunc(page_h) AS INT))
         || string_agg(piece, '' ORDER BY det_order) || '</svg>' AS svg
FROM pieces
GROUP BY conv_id, turn_idx, page_seq, page_w, page_h
"""
