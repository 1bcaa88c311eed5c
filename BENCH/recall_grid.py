"""Measure IVF near-dup pair recall across (n_cells, nprobe) at two SFs.

Evidence base for the round-5 nprobe<->auto-cells coupling rule
(VERDICT r04 item 3): prints one JSON object
{sf: {cells: {nprobe: recall}}} and writes BENCH/recall_grid.json.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkextract import simsearch  # noqa: E402
from sparkextract.session import build_session  # noqa: E402


def main() -> None:
    spark = build_session(app="recall-grid", master="local[32]")
    out: dict[str, dict] = {}
    try:
        for sf in ("0.01", "0.1"):
            emb = spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")
            n = emb.count()
            auto = simsearch.auto_cells(n)
            grid: dict[str, dict] = {"n": n, "auto_cells": auto}
            for cells in (8, 16, 32, 64):
                grid[str(cells)] = simsearch.neardup_pair_recall(
                    emb, n_cells=cells, nprobe_grid=(2, 4, 8)
                )
            out[sf] = grid
    finally:
        spark.stop()
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "recall_grid.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
