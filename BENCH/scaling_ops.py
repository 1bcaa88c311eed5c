"""Scaling pair for a REPRESENTATIVE corpus operator (north_rule,
sandbox substitution): the extraction job's scaling table lives in
``scaling.py``; this measures the data-pipeline side with the same
methodology — the same op on the same input at N and 4N cores,
efficiency = (tput_4N / tput_N) / 4.

Operator under test: ``textops.segment_dedup`` — the one corpus-sized
content-keyed shuffle in the training-corpus chain (segment text
exchanges on md5(segment); reassembly is combinable). It is the
provable floor for content-keyed dedup, so its scaling is the
data-pipeline claim that matters at 100 TB.

Methodology mirrors scaling.py: replicated sf0.1 documents, full
warm-up pass per config, median of 3 cold runs (cache cleared between
reps — the r4 warm-cache lesson), noop sink, fresh JVM per core count.
Writes BENCH/scaling_ops.json (or scaling_<SCALE_OUT>.json).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from sparkextract import textops  # noqa: E402
from sparkextract.docsource import replicate_documents  # noqa: E402
from sparkextract.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("SCALE_N", "4"))
REPLICATE = int(os.environ.get("OPS_REPLICATE", "512"))
RUNS = int(os.environ.get("SCALE_RUNS", "3"))


def run_at(cores: int) -> dict:
    spark = build_session(master=f"local[{cores}]", shuffle_partitions=cores * 2)
    docs = replicate_documents(
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")), REPLICATE
    ).persist()
    n_docs = docs.count()  # materialize input outside the timer
    n_words = int(
        textops.words(docs).count()
    )  # corpus volume for the throughput unit

    def one() -> float:
        spark.catalog.clearCache()  # r4 lesson: canonicalized-plan cache
        docs.persist()
        docs.count()
        t0 = time.perf_counter()
        textops.segment_dedup(docs).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    one()  # warm-up (workers spawned, codegen compiled)
    secs = sorted(one() for _ in range(RUNS))
    sec = statistics.median(secs)
    spark.stop()
    return {
        "cores": cores,
        "docs": n_docs,
        "words": n_words,
        "sec": round(sec, 2),
        "all_secs": [round(s, 2) for s in secs],
        "words_per_sec": round(n_words / sec, 1),
    }


def main() -> None:
    lo = run_at(N)
    hi = run_at(4 * N)
    eff = round((hi["words_per_sec"] / lo["words_per_sec"]) / 4, 3)
    out = {
        "op": "segment_dedup",
        "sf_dir": SF_DIR,
        "replicate": REPLICATE,
        "cores": [N, 4 * N],
        "runs": [lo, hi],
        "efficiency": eff,
    }
    tag = os.environ.get("SCALE_OUT", "")
    name = f"scaling_{tag}.json" if tag else "scaling_ops.json"
    with open(os.path.join(ROOT, "BENCH", name), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
