"""Deterministic synthetic transcript generator (FIXTURES.md §1-2).

Seeded ``random.Random`` only — no wall clock, no numpy RNG — so fixtures
are reproducible byte-for-byte across runs and machines. The payload
grammar (DESIGN.md §1) stands in for rasterized PDF pages; every edge case
of the reference's deterministic layer is injected with fixed probability:

- scores <= 0.25 (conf filter, configs/layout_detection.yaml:8)
- NMS duplicate boxes (layout_detection/models/yolo.py:74-80)
- text boxes crossing formula boxes (mask split, paddle_ocr.py:156-172)
- adjacent boxes with dy < 10px (bubble pass, paddle_ocr.py:69-77)
- spans overlapping two blocks > 0.6 (first-block-wins,
  merge_blocks_and_spans.py:150-153)
- isolated spans inside text blocks (coercion, merge_blocks_and_spans.py:71-80)
- zh/en mixed lines (separator rule, merge_blocks_and_spans.py:263-267)
- markdown special chars (escape, merge_blocks_and_spans.py:207-215)
- latex with redundant whitespace and $ wrappers (pdf2markdown.py:23-39,
  merge_blocks_and_spans.py:250-261)
"""

from __future__ import annotations

import datetime as _dt
import random

import pandas as pd

EN_WORDS = (
    "spark engine layout detection formula table caption reading order "
    "merge span block page transcript turn agent tool shuffle partition "
    "broadcast window aggregate vector batch arrow column schema plan"
).split()
ZH_WORDS = "数据 引擎 布局 检测 公式 表格 标题 阅读 顺序 合并 分区 窗口 聚合 向量 批处理 模式".split()
SPECIAL_WORDS = ["a*b", "code`x`", "~tilde~", "$5.00", "w*", "`q"]
LATEX = [
    "E = m c ^ { 2 }",
    "\\sum _ { i = 0 } ^ { n } x _ i",
    "$\\alpha + \\beta$",
    "\\mathrm { d } x \\, / \\mathrm { d } t",
    "$$\\int f ( x ) d x$$",
    "\\operatorname {argmax} _ x f ( x )",
    "a ^ 2 + b ^ 2 = c ^ 2",
]

PAGE_W, PAGE_H = 1654, 2339
EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)


def _det(cat, score, x0, y0, x1, y1, content=""):
    return f"@det {cat}|{score}|{x0}|{y0}|{x1}|{y1}|{content}"


def _words(rng, n, zh=False, special=0.0):
    pool = ZH_WORDS if zh else EN_WORDS
    out = []
    for _ in range(n):
        if special and rng.random() < special:
            out.append(rng.choice(SPECIAL_WORDS))
        else:
            out.append(rng.choice(pool))
    return ("" if zh else " ").join(out)


def _text_line_dets(rng, lines_out, x0, y0, x1, zh, h=28):
    """Emit one visual line of 1-3 raw OCR text dets spanning [x0,x1]."""
    n = rng.randint(1, 3)
    width = (x1 - x0) / n
    y1 = y0 + h
    for i in range(n):
        bx0 = x0 + i * width + rng.randint(0, 4)
        bx1 = x0 + (i + 1) * width - rng.randint(0, 4)
        jy = rng.randint(0, 9) if (i > 0 and rng.random() < 0.25) else 0  # bubble case
        score = round(rng.uniform(0.55, 0.99), 2)
        if rng.random() < 0.05:
            score = round(rng.uniform(0.05, 0.45), 2)  # below drop_score
        content = _words(rng, rng.randint(1, 4), zh=zh, special=0.12)
        if rng.random() < 0.05:
            # M7 angle-cls case: content arrives 180°-rotated, marked
            content = "@rot180 " + content[::-1]
        lines_out.append(
            _det("text", score, round(bx0, 1), y0 + jy, round(bx1, 1), y1 + jy, content)
        )
    return y1


def gen_page(rng, page_no):
    """Generate one page's payload lines. Returns list[str]."""
    out = [f"@page {page_no} {PAGE_W} {PAGE_H}"]
    y = rng.randint(60, 140)
    n_blocks = rng.randint(2, 6)
    prev_block = None  # (x0,y0,x1,y1) of previous need_fix block for overlap case
    for _ in range(n_blocks):
        if y > PAGE_H - 400:
            break
        kind = rng.choices(
            ["title", "plain text", "abandon", "figure", "table", "isolate_formula"],
            weights=[15, 45, 10, 10, 10, 10],
        )[0]
        x0 = rng.randint(80, 200)
        x1 = PAGE_W - rng.randint(80, 200)
        if kind == "title":
            h = 60
            zh = rng.random() < 0.3
            score = round(rng.uniform(0.3, 0.98), 2)
            out.append(_det("title", score, x0, y, x1, y + h))
            _text_line_dets(rng, out, x0 + 10, y + 12, x1 - 10, zh, h=30)
            if rng.random() < 0.15:  # NMS duplicate (IoU > .45, lower score dropped)
                out.append(_det("title", round(score - 0.2, 2), x0 + 8, y + 4, x1 - 4, y + h + 4))
            prev_block = ("title", x0, y, x1, y + h)
            y += h + rng.randint(20, 60)
        elif kind == "plain text":
            n_lines = rng.randint(1, 4)
            h = n_lines * 40 + 20
            zh = rng.random() < 0.3
            if rng.random() < 0.2 and prev_block and prev_block[0] in ("plain text", "title"):
                y -= 20  # overlap previous block: shared-span first-wins case
            out.append(_det("plain text", round(rng.uniform(0.3, 0.98), 2), x0, y, x1, y + h))
            ly = y + 12
            for li in range(n_lines):
                if li == 0 and rng.random() < 0.35:
                    # inline formula mid-line: mask-split of the text det
                    fx0 = (x0 + x1) // 2 - 60
                    fx1 = (x0 + x1) // 2 + 60
                    out.append(
                        _det("inline", round(rng.uniform(0.3, 0.95), 2), fx0, ly, fx1, ly + 28,
                             rng.choice(LATEX))
                    )
                    if rng.random() < 0.5:
                        # one det spanning across the formula (split in two)
                        out.append(
                            _det("text", round(rng.uniform(0.55, 0.95), 2), x0 + 10, ly,
                                 x1 - 10, ly + 28, _words(rng, 3, zh=zh))
                        )
                    else:
                        # two dets flanking the formula
                        out.append(
                            _det("text", round(rng.uniform(0.55, 0.95), 2), x0 + 10, ly,
                                 fx0 - 5, ly + 28, _words(rng, 2, zh=zh))
                        )
                        out.append(
                            _det("text", round(rng.uniform(0.55, 0.95), 2), fx1 + 5, ly,
                                 x1 - 10, ly + 28, _words(rng, 2, zh=zh))
                        )
                    ly += 40
                elif li == 1 and rng.random() < 0.15:
                    # isolated formula inside a text block (coerced to inline)
                    out.append(
                        _det("isolated", round(rng.uniform(0.3, 0.95), 2), x0 + 40, ly,
                             x0 + 300, ly + 30, rng.choice(LATEX))
                    )
                    ly += 40
                else:
                    _text_line_dets(rng, out, x0 + 10, ly, x1 - 10, zh)
                    ly += 40
            prev_block = ("plain text", x0, y, x1, y + h)
            y += h + rng.randint(20, 60)
        elif kind == "abandon":
            h = 40
            out.append(_det("abandon", round(rng.uniform(0.3, 0.9), 2), x0, y, x1, y + h))
            _text_line_dets(rng, out, x0 + 5, y + 6, x1 - 5, False)
            prev_block = None
            y += h + rng.randint(20, 50)
        elif kind in ("figure", "table"):
            h = rng.randint(200, 400)
            out.append(_det(kind, round(rng.uniform(0.3, 0.98), 2), x0, y, x1, y + h))
            cy = y + h + 10
            cap = f"{kind}_caption"
            out.append(_det(cap, round(rng.uniform(0.3, 0.95), 2), x0 + 50, cy, x1 - 50, cy + 36))
            _text_line_dets(rng, out, x0 + 60, cy + 4, x1 - 60, rng.random() < 0.2)
            if kind == "table" and rng.random() < 0.5:
                fy = cy + 46
                out.append(
                    _det("table_footnote", round(rng.uniform(0.3, 0.9), 2), x0 + 50, fy,
                         x1 - 50, fy + 30)
                )
                _text_line_dets(rng, out, x0 + 60, fy + 2, x1 - 60, False)
                cy = fy
            prev_block = None
            y = cy + 46 + rng.randint(20, 50)
        else:  # isolate_formula
            h = 70
            score = round(rng.uniform(0.3, 0.95), 2)
            if rng.random() < 0.6:  # layout block + mfd isolated det pair
                out.append(_det("isolate_formula", score, x0 + 100, y, x1 - 100, y + h))
            out.append(
                _det("isolated", round(rng.uniform(0.3, 0.95), 2), x0 + 110, y + 5,
                     x1 - 110, y + h - 5, rng.choice(LATEX))
            )
            if rng.random() < 0.4:
                cy = y + h + 6
                out.append(
                    _det("formula_caption", round(rng.uniform(0.3, 0.9), 2), x0 + 100, cy,
                         x0 + 400, cy + 26)
                )
            prev_block = None
            y += h + rng.randint(40, 70)
        if rng.random() < 0.1:  # sub-threshold junk det (conf filter)
            out.append(
                _det(rng.choice(["plain text", "inline", "figure"]),
                     round(rng.uniform(0.01, 0.25), 2), 10, 10, 60, 40, "junk")
            )
    return out


def gen_transcripts(n_convs=40, seed=42, payload_prob=0.6, skew_conv_turns=0):
    """Return a pandas DataFrame with the transcripts schema.

    ``skew_conv_turns`` > 0 adds one conversation with that many turns
    (the long-conversation skew fixture, FIXTURES.md §1).
    """
    rng = random.Random(seed)
    rows = []
    lengths = [max(2, min(30, int(rng.paretovariate(1.3)) + 1)) for _ in range(n_convs)]
    if skew_conv_turns:
        lengths.append(skew_conv_turns)
    for ci, n_turns in enumerate(lengths):
        conv = f"conv-{ci:06d}"
        for ti in range(n_turns):
            role = ["user", "assistant", "tool"][ti % 3]
            chatter = _words(rng, rng.randint(3, 10))
            text, tool = chatter, None
            if rng.random() < payload_prob and role in ("assistant", "tool"):
                pages = []
                for p in range(rng.randint(1, 3)):
                    pages.extend(gen_page(rng, p))
                payload = "\n".join(pages)
                if role == "tool":
                    tool = payload
                    text = chatter
                else:
                    text = chatter + "\n" + payload
            elif role == "tool":
                tool = "{}"
            rows.append(
                {
                    "conv_id": conv,
                    "turn_idx": ti,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": EPOCH + _dt.timedelta(minutes=ti),
                }
            )
    df = pd.DataFrame(rows)
    # shuffle on-disk order: ordering must come from the window, not file order
    return df.sample(frac=1.0, random_state=seed).reset_index(drop=True)


def write_parquet(path, n_convs=40, seed=42, **kw):
    df = gen_transcripts(n_convs=n_convs, seed=seed, **kw)
    # Spark cannot read TIMESTAMP(NANOS) parquet — write micros
    df["ts"] = df["ts"].astype("datetime64[us, UTC]")
    df.to_parquet(path, index=False)
    return path
