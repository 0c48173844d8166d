"""Checkpoint manifests + resume — the ``north_rule`` resumability layer.

The reference flushed markdown per streamed delta so a crash kept partial
output (/root/reference/src/models/document_job.py:116-117, AGENTS.md
"incremental progress persistence").  The cluster analog (SURVEY.md §2.10
E4): every completed write also appends per-partition manifest rows

    manifest(partition_id int, row_count bigint, content_digest string,
             run_id string, committed_at timestamp)

where ``content_digest = sha256(concat(sorted per-row digests))`` — a pure
function of the partition's row set, so a resumed/retried run producing the
same rows produces the same manifest (the byte-identity invariant makes
this sound).

Resume = **left-anti join** of the input against the committed output's
``url`` set: already-extracted documents are never reprocessed.  At 10^12
rows that anti-join is a shuffle of (url) only — ~50 bytes/row — and AQE
turns it into a broadcast when the committed side is still small.

Parquet is used as the table format here (no Iceberg runtime jar ships in
this sandbox); the ``TableIO`` seam is this module — swapping
``write/read`` for ``df.writeTo(...).append()`` on an Iceberg catalog
changes nothing upstream, and parquet append-by-directory mirrors Iceberg's
commit-by-snapshot at the granularity this pipeline needs (a partial job
leaves whole committed files, which is exactly what resume filters on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def write_output(out_df: DataFrame, out_path: str, manifest_path: str,
                 run_id: str) -> None:
    """Append the extraction output, then append its manifest rows.

    The manifest is computed from the rows as written (same lineage), one
    row per physical partition of the writing stage.
    """
    with_pid = out_df.withColumn("partition_id", F.spark_partition_id())
    with_pid.write.mode("append").parquet(out_path)
    spark = out_df.sparkSession
    written = spark.read.parquet(out_path)
    manifest = (
        written
        .groupBy("partition_id")
        .agg(
            F.count("*").alias("row_count"),
            F.sha2(
                F.concat_ws(",", F.sort_array(F.collect_list("digest"))), 256
            ).alias("content_digest"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("committed_at", F.current_timestamp())
    )
    manifest.write.mode("append").parquet(manifest_path)


def write_figures(out_df: DataFrame, figures_path: str) -> None:
    """Append the exploded figures side-output (analog of the reference's
    images/{page}_fig{n}.png directory, keyed (url, page_number,
    fig_number) — /root/reference/src/models/extracted_image.py:34-43)."""
    from qwen_ocr_spark.operators.extract import figures_table
    figures_table(out_df).write.mode("append").parquet(figures_path)


def committed_urls(spark: SparkSession, out_path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(out_path).select("url")
    except AnalysisException:
        return None


def resume_filter(pages_df: DataFrame, out_path: str) -> DataFrame:
    """Drop input rows whose url is already committed (anti-join resume)."""
    done = committed_urls(pages_df.sparkSession, out_path)
    if done is None:
        return pages_df
    return pages_df.join(done, on="url", how="left_anti")
