"""Scaling-efficiency run (north_rule sandbox substitution): the SAME
extraction job on the SAME input at N and 4N cores; efficiency =
(tput_4N / tput_N) / 4, target ≥ 0.8.

Two honesty measures ship with the number:

1. **Machine calibration**: the identical per-turn kernel run under plain
   ``multiprocessing`` (no Spark) at N and 4N processes. On this shared
   32-core box, per-core throughput drops when more cores are busy (turbo
   frequency scaling + shared caches) — the calibration measures the
   hardware's own scaling ceiling, which no job can exceed. A real
   cluster adds *nodes*, so this ceiling is a sandbox artifact.
2. **Median of 3** timed runs after a full warm-up pass (all Python
   workers spawned, codegen warm), input persisted and pre-counted.

Reported: absolute efficiency, machine ceiling, and normalized
(= absolute / ceiling). Writes BENCH/BASELINE.md + BENCH/scaling.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from sparkextract import pipeline  # noqa: E402
from sparkextract.docsource import (  # noqa: E402
    documents_as_transcripts,
    replicate_documents,
)
from sparkextract.fused import extract_fused  # noqa: E402
from sparkextract.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("SCALE_N", "4"))
FUSED_REPLICATE = int(os.environ.get("FUSED_REPLICATE", "64"))
STAGED_REPLICATE = int(os.environ.get("STAGED_REPLICATE", "8"))
RUNS = int(os.environ.get("SCALE_RUNS", "3"))
FUSED_ONLY = os.environ.get("SCALE_FUSED_ONLY", "") == "1"  # quick reproductions
WRITE_MD = os.environ.get("SCALE_WRITE_MD", "1") == "1"


def _calib_work(seed: int):
    from sparkextract import synth
    from sparkextract.fused import _extract_batch

    pdf = synth.gen_transcripts(n_convs=60, seed=seed, payload_prob=1.0)
    doc = pdf[
        pdf.text.str.contains("@page ") | pdf.tool.fillna("").str.contains("@page ")
    ][["conv_id", "turn_idx", "text", "tool"]].reset_index(drop=True)
    t0 = time.perf_counter()
    for _ in range(4):
        _extract_batch(doc)
    return len(doc) * 4, time.perf_counter() - t0


def machine_ceiling() -> dict:
    out = {}
    for nproc in (N, 4 * N):
        with mp.Pool(nproc) as p:
            p.map(_calib_work, range(100, 100 + nproc))  # warm imports
            tputs = []
            for r in range(RUNS):
                t0 = time.perf_counter()
                res = p.map(_calib_work, range(200 + r, 200 + r + nproc * 3))
                tputs.append(sum(x[0] for x in res) / (time.perf_counter() - t0))
            out[nproc] = statistics.median(tputs)
    out["ceiling"] = round((out[4 * N] / out[N]) / 4, 3)
    return out


def _force(df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def run_at(cores: int) -> dict:
    spark = build_session(app=f"scaling-{cores}", master=f"local[{cores}]")
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

        def corpus(replicate: int):
            big = replicate_documents(docs, replicate).repartition(cores * 4)
            t = documents_as_transcripts(big).persist()
            return t, t.count()

        fused_t, fused_n = corpus(FUSED_REPLICATE)
        _force(extract_fused(fused_t))  # full warm-up: all workers + codegen
        fused = statistics.median(_force(extract_fused(fused_t)) for _ in range(RUNS))
        fused_t.unpersist()

        if FUSED_ONLY:
            return {
                "cores": cores,
                "fused_turns": fused_n,
                "fused_sec": round(fused, 2),
                "fused_tput": round(fused_n / fused, 1),
                "staged_turns": 0,
                "staged_sec": 0.0,
                "staged_tput": 1.0,
            }

        staged_t, staged_n = corpus(STAGED_REPLICATE)
        _force(pipeline.extract(staged_t.limit(2000)))
        # the staged engine persists its stage-1 fan-out INTERNALLY;
        # Spark's CacheManager matches that persisted plan across calls,
        # so repeated runs would read the first run's cache and report
        # warm-cache time (this understated staged cost in r1-r3 — see
        # BENCH/BASELINE.md). Clear the SQL cache per repetition and
        # re-warm the input corpus OUTSIDE the timer.
        staged_runs = []
        for _ in range(RUNS):
            spark.catalog.clearCache()
            staged_t.persist()
            staged_t.count()
            staged_runs.append(_force(pipeline.extract(staged_t)))
        staged = statistics.median(staged_runs)
        return {
            "cores": cores,
            "fused_turns": fused_n,
            "fused_sec": round(fused, 2),
            "fused_tput": round(fused_n / fused, 1),
            "staged_turns": staged_n,
            "staged_sec": round(staged, 2),
            "staged_tput": round(staged_n / staged, 1),
        }
    finally:
        spark.stop()


def main() -> None:
    calib = machine_ceiling()
    lo = run_at(N)
    hi = run_at(4 * N)
    eff_fused = round((hi["fused_tput"] / lo["fused_tput"]) / 4, 3)
    eff_staged = round((hi["staged_tput"] / lo["staged_tput"]) / 4, 3)
    ceiling = calib["ceiling"]
    out = {
        "sf_dir": SF_DIR,
        "cores": [N, 4 * N],
        "fused_replicate": FUSED_REPLICATE,
        "staged_replicate": STAGED_REPLICATE,
        "machine_calibration": {
            f"procs_{N}": round(calib[N], 1),
            f"procs_{4 * N}": round(calib[4 * N], 1),
            "ceiling": ceiling,
        },
        "runs": [lo, hi],
        "efficiency_fused": eff_fused,
        "efficiency_fused_normalized": round(eff_fused / ceiling, 3),
        "efficiency_staged": eff_staged,
        "efficiency_staged_normalized": round(eff_staged / ceiling, 3),
    }
    bench_dir = os.path.join(ROOT, "BENCH")
    # SCALE_OUT tags the archive filename (e.g. SCALE_OUT=r5_a →
    # scaling_r5_a.json) so every run cited from BASELINE.md exists at its
    # cited name in the same commit — r4-B was lost to an in-place
    # scaling.json overwrite and had to be recovered from git history.
    tag = os.environ.get("SCALE_OUT", "")
    if tag:
        name = f"scaling_{tag}.json"
    else:
        name = "scaling_fusedonly.json" if FUSED_ONLY else "scaling.json"
    with open(os.path.join(bench_dir, name), "w") as f:
        json.dump(out, f, indent=2)
    if FUSED_ONLY or not WRITE_MD:
        print(json.dumps(out))
        return
    md = f"""# BENCH/BASELINE — measured numbers

Scaling criterion (north_rule, sandbox substitution per driver
instruction): identical job + identical input at N={N} and 4N={4 * N}
cores; efficiency = (tput_4N / tput_N) / 4, target ≥ 0.8.

**Machine ceiling (measured, not assumed):** the same per-turn kernel
under plain multiprocessing (no Spark) scales at
{calib[N]:.0f} → {calib[4 * N]:.0f} turns/s = **{ceiling}** efficiency on
this box — per-core speed drops when more cores are busy (turbo/cache
sharing). That ceiling bounds any job here; a real cluster adds nodes.

Corpus: sf0.1 documents replicated (fused ×{FUSED_REPLICATE} →
{lo["fused_turns"]} turns; staged ×{STAGED_REPLICATE} → {lo["staged_turns"]}
turns); full warm-up pass, then median of {RUNS} timed runs via the noop
sink.

| job | local[{N}] | local[{4 * N}] | efficiency | normalized to machine ceiling |
|---|---|---|---|---|
| fused pipeline (production) | {lo["fused_tput"]} turns/s | {hi["fused_tput"]} turns/s | **{eff_fused}** | **{out["efficiency_fused_normalized"]}** |
| staged pipeline (showcase) | {lo["staged_tput"]} turns/s | {hi["staged_tput"]} turns/s | {eff_staged} | {out["efficiency_staged_normalized"]} |

Raw: `BENCH/scaling.json`. Full-suite timings: `bench.py` (one JSON
line, recorded by the driver as BENCH_r{{N}}.json).

Reference baseline: the reference publishes no numbers (BASELINE.md at
repo root); the authoritative target is BASELINE.json — turns/sec with
per-turn text equality (tests/test_e2e_golden.py, pinned to the ACTUAL
reference functions via tests/test_reference_parity.py) and ≥0.8 scaling
efficiency.
"""
    with open(os.path.join(bench_dir, "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
