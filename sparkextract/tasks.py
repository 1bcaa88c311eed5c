"""Per-task API surface mirroring the reference's standalone scripts and
registry (scripts/{layout_detection,formula_detection,formula_recognition,
ocr,table_parsing}.py + utils/config_loader.py:31-47 +
registry/registry.py:1-23).

Each task is a ``DataFrame → DataFrame`` stage over the transcripts
table — the Spark analog of the reference's TASK_REGISTRY: a plain dict
of named stage functions, driven by the same YAML config shape
(``tasks: {name: {model: ..., model_config: {...}}}``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import schema
from .mfr import recognize_formulas
from .ocr import ocr_text_spans
from .parse import parse_detections


def layout_detection(transcripts: DataFrame) -> DataFrame:
    """scripts/layout_detection.py analog: per-page layout detections
    (10 classes, conf-filtered, NMS'd, confidence-ordered)."""
    return parse_detections(transcripts).filter(F.col("branch") == 0)


def formula_detection(transcripts: DataFrame) -> DataFrame:
    """scripts/formula_detection.py analog: inline/isolated detections."""
    return parse_detections(transcripts).filter(F.col("branch") == 1)


def formula_recognition(transcripts: DataFrame, length_buckets: int = 0) -> DataFrame:
    """scripts/formula_recognition.py analog: detections + latex content
    (deterministic MFR = F1, length-bucket-packed batches)."""
    return recognize_formulas(
        parse_detections(transcripts), length_buckets=length_buckets
    )


def ocr(transcripts: DataFrame) -> DataFrame:
    """scripts/ocr.py analog: final OCR text spans (det → sort → merge →
    formula-mask split → rec → drop_score), page coordinates."""
    return ocr_text_spans(parse_detections(transcripts))


TABLE_FORMATS = ("latex", "markdown", "html")


def table_parsing(
    transcripts: DataFrame, output_format: str = "latex"
) -> DataFrame:
    """scripts/table_parsing.py analog. The reference's StructEqTable is a
    CUDA-only checkpoint (struct_eqtable.py:17) — the deterministic
    stand-in emits the table det's payload content wrapped per format.
    Format validation mirrors struct_eqtable.py:45-46."""
    if output_format not in TABLE_FORMATS:
        raise ValueError(
            f"Output format {output_format!r} is not supported; "
            f"expected one of {TABLE_FORMATS}"
        )
    dets = parse_detections(transcripts).filter(F.col("category") == "table")
    body = F.col("content")
    rendered = (
        F.when(F.lit(output_format) == "latex",
               F.concat(F.lit("\\begin{tabular}"), body, F.lit("\\end{tabular}")))
        .when(F.lit(output_format) == "html",
              F.concat(F.lit("<table>"), body, F.lit("</table>")))
        .otherwise(F.concat(F.lit("| "), body, F.lit(" |")))
    )
    return dets.withColumn("table_source", rendered)


TASK_REGISTRY = {
    "layout_detection": layout_detection,
    "formula_detection": formula_detection,
    "formula_recognition": formula_recognition,
    "ocr": ocr,
    "table_parsing": table_parsing,
}


def load_config(path: str) -> dict:
    """utils/config_loader.py:6-15 analog."""
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def initialize_tasks(config: dict) -> dict:
    """utils/config_loader.py:31-47 analog: resolve task names against the
    registry; unknown names fail loudly like the reference's KeyError."""
    out = {}
    for name in config.get("tasks", {}):
        if name == "pdf2markdown":
            from .fused import extract_fused

            out[name] = extract_fused
        else:
            out[name] = TASK_REGISTRY[name]
    return out
