"""Extra benchmarks for optimization work (round 6).

``bench.py`` is the frozen driver-facing harness; this file exists for
query-level isolation work (guide §1.4): timing a subset of queries with
the same steady-state protocol (one reused DataFrame, warm pass,
best-of-N) and capturing ``explain("formatted")`` plans.

Usage::

    python bench_extra.py time  <sf_dir> <query> [query ...]
    python bench_extra.py plan  <sf_dir> <out_dir> <suffix> <query> [...]
    python bench_extra.py noop  <sf_dir> <query> [query ...]

``time`` prints one JSON line {"queries": {name: best_sec}, "sf": dir}.
``noop`` times a full-materialization noop write instead of count()
(count() is what bench.py measures; noop shows whether column pruning
was hiding work).
``plan`` writes ``<out_dir>/<query>_<suffix>.txt`` per query.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _get(queries, name):
    if name not in queries:
        raise SystemExit(f"unknown query {name!r}")
    return queries[name]


def main() -> None:
    mode = sys.argv[1]
    sf_dir = sys.argv[2]
    import __spark_entry__ as entry_mod
    from qwen_ocr_spark.plans.session import gc_hint, get_spark

    spark = get_spark(app_name=f"bench-extra-{mode}")
    queries = entry_mod.queries()

    if mode == "plan":
        out_dir, suffix = sys.argv[3], sys.argv[4]
        os.makedirs(out_dir, exist_ok=True)
        for name in sys.argv[5:]:
            df = _get(queries, name)(spark, sf_dir)
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            print(f"wrote {path}")
            spark.catalog.clearCache()
        spark.stop()
        return

    timings = {}
    for name in sys.argv[3:]:
        spark.sparkContext.setJobDescription(name)
        df = _get(queries, name)(spark, sf_dir)
        gc_hint(spark)

        def act():
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()

        act()  # warm pass
        best = float("inf")
        for _ in range(2):
            gc_hint(spark)
            t0 = time.perf_counter()
            act()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        spark.catalog.clearCache()
    spark.stop()
    print(json.dumps({"queries": timings, "sf": sf_dir, "mode": mode}))


if __name__ == "__main__":
    main()
