"""SparkSession factory with scale-oriented defaults.

One place owns the conf so tests, bench, and the driver entry point agree.
Defaults are chosen for the 100 TB design point and scaled down by env:

* AQE on (runtime coalescing + skew-join splitting) — the explicit answer
  to host-domain skew per SURVEY.md §4.
* Arrow on with a bounded records-per-batch: rows carry whole documents
  (tens of KB each), so the default 10k rows/batch would make multi-hundred
  MB Arrow batches; 512 keeps executor memory flat.
* shuffle partitions default to the core count locally; on a real cluster
  AQE coalesces from a deliberately high initial number.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return f"local[{cpus}]"


def get_spark(
    master: str | None = None,
    app_name: str = "qwen-ocr-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or default_master()
    if shuffle_partitions is None:
        if master.startswith("local[") and master[6:-1].isdigit():
            shuffle_partitions = max(int(master[6:-1]), 8)
        else:
            shuffle_partitions = 32
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Arrow IPC buffers are direct memory released only by GC reference
        # cleaners; a sequence of distinct python-UDF plans can exhaust the
        # direct pool before any heap GC runs, stalling every subsequent
        # Arrow transfer (measured: 5.6s job → 25s).  Concurrent explicit GC
        # makes the between-jobs hygiene collection (see gc_hint) cheap.
        .config("spark.driver.extraJavaOptions", "-XX:+ExplicitGCInvokesConcurrent")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


# Persisted intermediates created by library operators when the caller did
# not supply an explicit ``storage`` list (dedup.lsh_candidate_pairs,
# simhash_near_pairs, ngram_jaccard_pairs, similarity.banded_buckets, …).
# A one-shot job never needs to touch this — the process exit releases the
# cache — but a long-lived driver (streaming micro-batches, a query
# service) must call release_cached() between batches or cached relations
# accumulate executor storage (the round-2 failure mode in CLAUDE.md).
_CACHED_HANDLES: list = []


def track_cached(df, storage: list | None = None):
    """Record a persisted DataFrame for later release.

    Appends to the caller's ``storage`` list when given, else to the
    module-level registry drained by release_cached().

    The registry holds STRONG references on purpose (ADVICE r5
    adjudication): a Spark SQL cache lives in the JVM CacheManager and is
    NOT auto-unpersisted when the Python handle is garbage-collected, so a
    weak reference would only lose the one handle that can still release
    it.  The contract stands: a long-lived driver that runs library
    operators without passing ``storage`` must call ``release_cached()``
    between units of work (streaming micro-batches do; see
    sinks/manifest.py)."""
    (_CACHED_HANDLES if storage is None else storage).append(df)
    return df


def release_cached() -> int:
    """Unpersist every registry-tracked intermediate; returns the count."""
    n = 0
    while _CACHED_HANDLES:
        try:
            _CACHED_HANDLES.pop().unpersist()
        except Exception:
            pass  # session already stopped — nothing to release
        n += 1
    return n


def gc_hint(spark: SparkSession) -> None:
    """Release Arrow direct buffers pinned by collected-but-unfinalized
    references.  Call between distinct heavy python-UDF jobs (the bench
    does; a long-running service would do this on a timer).  Root cause
    documented in BENCH/BASELINE.md."""
    spark.sparkContext._jvm.System.gc()
