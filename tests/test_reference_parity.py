"""Ground-truth parity: run the ACTUAL reference functions (loaded
read-only from /root/reference at test time — never imported by the
engine) against tests/oracle.py on randomized inputs. This validates that
the oracle — and therefore the golden fixtures the Spark engine is pinned
to — faithfully reproduces the reference's deterministic layer.

The heavy modules (paddle_ocr.py, pdf2markdown.py) import cv2/torch, so
only their pure-Python function ranges are exec'd into a namespace.
"""

import importlib.util
import random
import re

import numpy as np
import pytest

import oracle

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_merge():
    spec = importlib.util.spec_from_file_location(
        "ref_merge", f"{REF}/pdf_extract_kit/utils/merge_blocks_and_spans.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _exec_lines(path, start, end, ns):
    with open(path) as f:
        src = "".join(f.readlines()[start - 1 : end])
    exec(compile(src, path, "exec"), ns)  # noqa: S102 (test-only, read-only ref)
    return ns


@pytest.fixture(scope="module")
def ref_ocr():
    ns = {"np": np, "numpy": np}
    return _exec_lines(
        f"{REF}/pdf_extract_kit/tasks/ocr/models/paddle_ocr.py", 57, 289, ns
    )


@pytest.fixture(scope="module")
def ref_latex():
    ns = {"re": re}
    return _exec_lines(
        f"{REF}/project/pdf2markdown/scripts/pdf2markdown.py", 23, 39, ns
    )


def _rand_bbox(rng, scale=1000):
    x0, y0 = rng.uniform(0, scale), rng.uniform(0, scale)
    return [x0, y0, x0 + rng.uniform(5, 200), y0 + rng.uniform(5, 60)]


def test_latex_rm_whitespace_vs_reference(ref_latex):
    samples = [
        "E = m c ^ { 2 }",
        "\\sum _ { i = 0 } ^ { n } x _ i",
        "\\mathrm { d } x \\, / \\mathrm { d } t",
        "\\operatorname {argmax} _ x f ( x )",
        "\\text {hello world} + 1",
        "\\mathbf {A B} \\mathrm {cd}  + 2",
        "a  +  b",
        "x \\ y  z",
        "$a$ + $ b $",
        "1 2 3 . 4",
        "f ( x , y ) = x ! ; y ?",
    ]
    for s in samples:
        assert oracle.latex_rm_whitespace(s) == ref_latex["latex_rm_whitespace"](s), s


def test_lang_escape_vs_reference(ref_merge):
    for s in ["", "abc", "数据 x", "a*b`c~d$e", "ascii 混 mix"]:
        assert oracle.detect_lang(s) == ref_merge.detect_lang(s)
        assert oracle.md_escape(s) == ref_merge.ocr_escape_special_markdown_char(s)


def test_sorted_boxes_vs_reference(ref_ocr):
    rng = random.Random(11)
    for _ in range(40):
        n = rng.randint(0, 12)
        quads = np.array(
            [oracle.__dict__["sorted_boxes"].__defaults__ or 0 for _ in range(0)]
        )
        boxes = [_rand_bbox(rng) for _ in range(n)]
        if n and rng.random() < 0.7:  # dy<10 bubble cases
            b = boxes[0]
            boxes.append([b[0] - 70, b[1] + rng.uniform(0, 9), b[2] - 70, b[3]])
        quads = np.array(
            [[[b[0], b[1]], [b[2], b[1]], [b[2], b[3]], [b[0], b[3]]] for b in boxes]
        ).reshape(-1, 4, 2)
        want = [
            [q[0][0], q[0][1], q[2][0], q[2][1]]
            for q in ref_ocr["sorted_boxes"](quads)
        ]
        got = oracle.sorted_boxes([list(b) for b in boxes])
        assert got == want


def test_interval_ops_vs_reference(ref_ocr):
    rng = random.Random(12)
    for _ in range(60):
        masks = [
            [lo := rng.uniform(0, 100), lo + rng.uniform(1, 40)]
            for _ in range(rng.randint(0, 6))
        ]
        assert oracle.merge_intervals([list(m) for m in masks]) == ref_ocr[
            "merge_intervals"
        ]([list(m) for m in masks])
        want = ref_ocr["remove_intervals"]([10.0, 90.0], [list(m) for m in masks])
        assert oracle.remove_intervals([10.0, 90.0], [list(m) for m in masks]) == want


def test_update_merge_det_boxes_vs_reference(ref_ocr):
    rng = random.Random(13)
    for _ in range(40):
        # integer-valued coords: the reference's bbox_to_points round-trips
        # through float32 (paddle_ocr.py:97); our contract is float64
        # end-to-end (DESIGN.md), so exact comparison needs f32-exact values
        boxes = [[round(v) for v in _rand_bbox(rng)]
                 for _ in range(rng.randint(1, 10))]
        quads = [np.array([[b[0], b[1]], [b[2], b[1]], [b[2], b[3]], [b[0], b[3]]])
                 for b in boxes]
        merged_ref = ref_ocr["merge_det_boxes"](ref_ocr["sorted_boxes"](
            np.array(quads).reshape(-1, 4, 2)))
        merged_ref_b = [[q[0][0], q[0][1], q[2][0], q[2][1]] for q in merged_ref]
        merged_o = oracle.merge_det_boxes(oracle.sorted_boxes([list(b) for b in boxes]))
        assert merged_o == merged_ref_b
        masks = [{"bbox": [round(v) for v in _rand_bbox(rng, 400)]}
                 for _ in range(rng.randint(0, 4))]
        want = [
            [q[0][0], q[0][1], q[2][0], q[2][1]]
            for q in ref_ocr["update_det_boxes"](merged_ref, masks)
        ]
        got = oracle.update_det_boxes(merged_o, [m["bbox"] for m in masks])
        assert got == want


def _mk_span(rng, t=None):
    return {
        "type": t or rng.choice(["text", "inline", "isolated"]),
        "bbox": _rand_bbox(rng, 600),
        "content": rng.choice(
            ["hello *w*", "数据 引擎", "$x + y$", "  pad  ", "", "a `b`"]
        ),
    }


def test_block_fill_and_para_vs_reference(ref_merge):
    rng = random.Random(14)
    for _ in range(40):
        spans = [_mk_span(rng) for _ in range(rng.randint(0, 10))]
        blocks = []
        for i in range(rng.randint(1, 4)):
            b = _rand_bbox(rng, 600)
            b[2], b[3] = b[0] + rng.uniform(100, 400), b[1] + rng.uniform(50, 200)
            cat = rng.choice(["plain text", "title", "isolate_formula"])
            blocks.append(
                {"category_type": cat,
                 "poly": [b[0], b[1], b[2], b[1], b[2], b[3], b[0], b[3]]}
            )
        ref_filled, ref_left = ref_merge.fill_spans_in_blocks(
            [dict(b) for b in blocks],
            [dict(s, bbox=list(s["bbox"])) for s in spans],
            0.6,
        )
        ref_fixed = ref_merge.fix_block_spans(ref_filled)
        want = [ref_merge.merge_para_with_text(b) for b in ref_fixed]

        o_blocks = [
            {"type": b["category_type"],
             "bbox": [b["poly"][0], b["poly"][1], b["poly"][2], b["poly"][5]],
             "saved_info": b}
            for b in blocks
        ]
        o_filled, o_left = oracle.fill_spans_in_blocks(
            o_blocks, [dict(s, bbox=list(s["bbox"])) for s in spans]
        )
        got = [oracle.merge_para_with_text(oracle.fix_block(b)) for b in o_filled]
        assert got == want
        assert len(o_left) == len(ref_left)
