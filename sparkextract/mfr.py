"""Stage 2b — formula "recognition" (M5) + latex_rm_whitespace (F1).

The reference collects every formula crop of a document and batch-infers
them (pdf2markdown.py:176-190, batch_size 128). The Spark generalization
is *length-bucketed batch packing*: repartition the formula rows by a
content-length bucket (plus a salt to spread buckets) before the
vectorized UDF, so each Arrow batch carries uniform work and no straggler
batch stalls a partition (north_star requirement; SURVEY.md §4.2).

The deterministic recognizer is F1 itself (pdf2markdown.py:23-39) — a
fixpoint regex, not expressible as a regexp_replace chain, hence a scalar
pandas UDF (Arrow-batched, never per-row Python at the Spark level).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from . import kernels


@F.pandas_udf(StringType())
def latex_udf(s: pd.Series) -> pd.Series:
    return s.map(kernels.latex_rm_whitespace)


def recognize_formulas(
    dets: DataFrame, length_buckets: int = 0, salt: int = 16
) -> DataFrame:
    """branch-1 detections → same rows with content = F1(content).

    length_buckets > 0 enables the packing repartition (use at scale; at
    tiny SF the extra exchange costs more than it saves).
    """
    formulas = dets.filter(F.col("branch") == 1)
    if length_buckets > 0:
        formulas = formulas.repartition(
            F.width_bucket(
                F.length("content"), F.lit(0), F.lit(2048), F.lit(length_buckets)
            ),
            F.pmod(F.hash("conv_id", "turn_idx"), F.lit(salt)),
        )
    return formulas.withColumn("content", latex_udf(F.col("content")))
