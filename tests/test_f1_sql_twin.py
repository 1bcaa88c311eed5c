"""Pin the DuckDB F1 fixpoint emulation (mfr.f1_fixpoint_cte) to the
ACTUAL Python kernel on adversarial strings — the sentinel trick for
RE2's missing `(?!\\ )` lookahead must hold beyond the corpus content.
No Spark needed: pure DuckDB vs kernels.latex_rm_whitespace."""

import duckdb
import pytest

from sparkextract.kernels import latex_rm_whitespace
from sparkextract.mfr import f1_fixpoint_cte

CASES = [
    # corpus content
    "x ^ { 2 } + y _ { 1 }",
    "\\sum _ { i = 0 } x _ { i }",
    # protected commands (with/without the mandatory pre-brace space)
    "\\mathrm {d} x \\, / \\mathrm {d} t",
    "\\mathrm { d } x",
    "\\text {a b c}",
    "\\operatorname {s i n} x",
    "\\mathbf {A B}",
    "\\mathrm* {x y}",
    "\\text * {a b}",
    "\\mathrm  * {u v}",
    "\\mathrm {x y} + \\text {p q}",
    "\\mathrm  {a b}",
    "\\mathrm{a b}",     # no space before brace -> NOT protected
    "\\textbf {a b}",    # not in the command list
    "\\mathrm {a b",     # unterminated brace
    "a \\text { x 1 } b",
    # backslash-space pairs (the lookahead cases)
    "a \\ b",
    "\\  x",
    "\\  .",
    "a\\ \\ b",
    "x \\,  y",
    # plain whitespace collapse
    "a b c",
    "a   b",
    "a1 b2",
    "x + y",
    " leading and trailing ",
    "a , b , c",
    "E = m c ^ { 2 }",
    "\\alpha \\beta",
    "\\frac { a } { b }",
    "1 2 3",
    "_ ^ $ %",
    "word word",
    "",
]


@pytest.fixture(scope="module")
def duck_fix():
    con = duckdb.connect()

    def run(texts):
        con.execute(
            "CREATE OR REPLACE TABLE t AS SELECT * FROM (VALUES "
            + ",".join(f"({i}, ?)" for i in range(len(texts)))
            + ") v(doc_id, content)",
            list(texts),
        )
        q = f"""
WITH RECURSIVE src AS (SELECT doc_id, 0 AS page_seq, 0 AS det_idx, content FROM t),
{f1_fixpoint_cte("src").lstrip()}
SELECT doc_id, content FROM f1_done ORDER BY doc_id
"""
        return [r[1] for r in con.execute(q).fetchall()]

    return run


def test_f1_sql_matches_python_kernel(duck_fix):
    got = duck_fix(CASES)
    for t, g in zip(CASES, got):
        assert g == latex_rm_whitespace(t), repr(t)
