"""Per-task API surface (reference scripts/{layout_detection,
formula_detection,formula_recognition,ocr,table_parsing}.py analogs)."""

import pytest

import oracle
from sparkextract import schema, synth, tasks


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = synth.gen_transcripts(n_convs=8, seed=55, payload_prob=1.0)
    return pdf, spark.createDataFrame(pdf, schema=schema.TRANSCRIPTS)


def _oracle_dets(pdf):
    out = []
    for row in pdf.itertuples(index=False):
        for page in oracle.parse_payload(row.text, row.tool):
            for d in oracle.run_page(page):
                out.append((row.conv_id, row.turn_idx, page["page_no"],
                            d["category"], tuple(d["bbox"]), d["score"],
                            d["content"]))
    return out


def test_layout_and_formula_detection(corpus):
    pdf, sdf = corpus
    want = _oracle_dets(pdf)
    lay = tasks.layout_detection(sdf).collect()
    mfd = tasks.formula_recognition(sdf).collect()
    want_lay = sorted(x for x in want if x[3] in schema.LAYOUT_CLASSES)
    got_lay = sorted(
        (r.conv_id, r.turn_idx, r.page_no, r.category,
         (r.x0, r.y0, r.x1, r.y1), r.score, r.content)
        for r in lay
    )
    assert got_lay == want_lay
    want_mfd = sorted(x for x in want if x[3] in schema.FORMULA_CLASSES)
    got_mfd = sorted(
        (r.conv_id, r.turn_idx, r.page_no, r.category,
         (r.x0, r.y0, r.x1, r.y1), r.score, r.content)
        for r in mfd
    )
    assert got_mfd == want_mfd


def test_ocr_task(corpus):
    pdf, sdf = corpus
    want = sorted(x for x in _oracle_dets(pdf) if x[3] == "text")
    got = sorted(
        (r.conv_id, r.turn_idx, r.page_no, r.category,
         (r.x0, r.y0, r.x1, r.y1), r.score, r.content)
        for r in tasks.ocr(sdf).collect()
    )
    assert got == want


def test_table_parsing(corpus):
    _, sdf = corpus
    rows = tasks.table_parsing(sdf, output_format="html").collect()
    assert all(r.table_source.startswith("<table>") for r in rows)
    with pytest.raises(ValueError):
        tasks.table_parsing(sdf, output_format="docx")


def test_config_registry(tmp_path, corpus):
    _, sdf = corpus
    cfg = tmp_path / "job.yaml"
    cfg.write_text(
        "tasks:\n  layout_detection:\n    model: layout_detection_yolo\n"
        "  pdf2markdown:\n    model: null\n"
    )
    inst = tasks.initialize_tasks(tasks.load_config(str(cfg)))
    assert set(inst) == {"layout_detection", "pdf2markdown"}
    assert inst["layout_detection"](sdf).count() > 0
    assert inst["pdf2markdown"](sdf).count() > 0
    with pytest.raises(KeyError):
        tasks.initialize_tasks({"tasks": {"nonexistent_task": {}}})
    with pytest.raises(KeyError):
        tasks.initialize_tasks(
            {"tasks": {"layout_detection": {"model": "no_such_model"}}}
        )


def test_layout_model_swap_via_config(tmp_path, corpus):
    """M2 pluggability: swapping the layout model through the YAML config
    yields genuinely different detections — LayoutLMv3-style keeps what
    YOLO-style drops (sub-conf dets, NMS-suppressed overlaps)."""
    pdf, sdf = corpus
    y_cfg = {"tasks": {"layout_detection": {"model": "layout_detection_yolo"}}}
    l_cfg = {"tasks": {"layout_detection": {"model": "layout_detection_layoutlmv3"}}}
    yolo = tasks.initialize_tasks(y_cfg)["layout_detection"](sdf)
    lmv3 = tasks.initialize_tasks(l_cfg)["layout_detection"](sdf)
    assert "category_id" in lmv3.columns and "category_id" not in yolo.columns

    # lmv3 = raw model output: every payload layout det, incl. score <= 0.25
    want_raw = []
    for row in pdf.itertuples(index=False):
        for page in oracle.parse_payload(row.text, row.tool):
            for d in page["dets"]:
                if d["category"] in oracle.LAYOUT_CLASSES:
                    want_raw.append(
                        (row.conv_id, int(row.turn_idx), d["category"],
                         d["score"], tuple(d["bbox"]), d["content"])
                    )
    got_raw = sorted(
        (r.conv_id, r.turn_idx, r.category, r.score,
         (r.x0, r.y0, r.x1, r.y1), r.content)
        for r in lmv3.collect()
    )
    assert got_raw == sorted(want_raw)
    assert lmv3.count() >= yolo.count()

    # category ids follow the shared id table (yolo.py:18-29)
    ids = {r.category: r.category_id for r in lmv3.select("category", "category_id").distinct().collect()}
    for cat, cid in ids.items():
        assert tasks.LAYOUT_ID_TO_NAME[cid] == cat

    # ignore_catids via model_config drops those classes
    cfg_ign = {
        "tasks": {
            "layout_detection": {
                "model": "layout_detection_layoutlmv3",
                "model_config": {"ignore_catids": [2, 3]},  # abandon, figure
            }
        }
    }
    ign = tasks.initialize_tasks(cfg_ign)["layout_detection"](sdf)
    cats = {r.category for r in ign.select("category").distinct().collect()}
    assert "abandon" not in cats and "figure" not in cats


def test_visualization_svg(corpus):
    """S6 sink: one SVG per page, one rect+label per layout detection,
    in det_order, VOC class colors."""
    from sparkextract import viz

    _, sdf = corpus
    lay = tasks.layout_detection(sdf)
    rows = viz.visualize_svg(lay).collect()
    assert rows
    assert all(r.svg.startswith('<svg xmlns="http://www.w3.org/2000/svg"')
               and r.svg.endswith("</svg>") for r in rows)
    assert sum(r.svg.count("<rect ") for r in rows) == lay.count()
    # VOC colormap by class id: title=0 black, plain text=1 maroon
    assert viz.CLASS_COLORS["title"] == "#000000"
    assert viz.CLASS_COLORS["plain text"] == "#800000"
