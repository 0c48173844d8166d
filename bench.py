"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "extraction": {...docs/sec...}, "scaling": {...local[8] vs local[32]...}}

The ``scaling`` block is the sandbox proxy for the north_rule's N→4N
executor requirement (BASELINE.md): the SAME synthetic corpus is extracted
in two fresh JVMs at local[8] and local[32]; efficiency =
(rate_32 / rate_8) / 4.  Child mode (``--scaling-child``) runs one
measurement and prints its docs/sec.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SCALING_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "4000"))

HEADLINE = [
    "extract_docs",
    "extract_markdown",
    "dedup_exact",
    "lsh_pairs",
    "ngram_jaccard",
    "simhash",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "quality_score",
    "lang_id",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "events_sessionize",
]


def _extraction_rate(spark, n_docs: int) -> tuple[float, float]:
    """Extract a deterministic synthetic corpus; return (docs/sec, sec).

    The corpus is generated then checkpointed to parquet so the timed span
    covers scan + repartition + extraction only (not generation)."""
    import tempfile

    from qwen_ocr_spark.operators.extract import extract_pages
    from qwen_ocr_spark.sources.pages import write_pages

    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/pages"
        write_pages(spark, path, n_docs, seed=42)
        pages = spark.read.parquet(path)
        # warm: JVM/Arrow/Python-worker spin-up paid outside the timed span
        extract_pages(pages.limit(64)).count()
        t0 = time.perf_counter()
        n = extract_pages(pages).count()
        dt = time.perf_counter() - t0
    assert n == n_docs
    return n / dt, dt


def scaling_child(master: str) -> None:
    from qwen_ocr_spark.plans.session import get_spark

    spark = get_spark(master=master, app_name=f"bench-scaling-{master}")
    rate, dt = _extraction_rate(spark, SCALING_DOCS)
    spark.stop()
    print(json.dumps({"master": master, "docs_per_sec": rate, "sec": dt}))


def run_scaling() -> dict:
    out = {}
    for master in ("local[8]", f"local[{CPUS}]"):
        p = subprocess.run(
            [sys.executable, __file__, "--scaling-child", master],
            capture_output=True, text=True, timeout=1200,
        )
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
        out[master] = json.loads(line)
    r8 = out["local[8]"]["docs_per_sec"]
    r32 = out[f"local[{CPUS}]"]["docs_per_sec"]
    factor = int(CPUS) / 8.0
    return {
        "docs": SCALING_DOCS,
        "rate_local8": round(r8, 2),
        f"rate_local{CPUS}": round(r32, 2),
        "scale_factor": factor,
        "efficiency": round((r32 / r8) / factor, 3),
    }


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--scaling-child":
        scaling_child(sys.argv[2])
        return

    import __spark_entry__ as entry_mod
    from qwen_ocr_spark.plans.session import get_spark

    spark = get_spark(app_name="qwen-ocr-spark-bench")
    queries = entry_mod.queries()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    # direct extraction throughput on the synthetic corpus at this session's
    # full parallelism
    n_bench = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "6000"))
    rate, sec = _extraction_rate(spark, n_bench)
    extraction = {"docs": n_bench, "sec": round(sec, 2),
                  "docs_per_sec": round(rate, 2)}
    spark.stop()

    scaling = {}
    if os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0":
        scaling = run_scaling()

    result = {
        "metric": "headline_query_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "extraction": extraction,
        "scaling": scaling,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
