"""Deterministic corpus sampling / splitting / packing — the training-data
plumbing every large pipeline needs downstream of dedup + quality scoring.

All three operators are CONTENT-ADDRESSED (md5 of the row key), not
RNG-based: Spark's ``sample()`` depends on partitioning and engine RNG
internals, so two runs — or two engines — disagree row-for-row.  Hashing
the key gives the same sample on any cluster size, any engine, any day
(the property that makes train/test splits reproducible and leak-free),
and it is exactly DuckDB-oracle-able because md5 is engine-identical.

Bucket arithmetic: the first 4 hex digits of ``md5(seed|key)`` form a
uniform integer in [0, 65536); thresholds are plan-time literals, and
comparing fixed-length lowercase hex strings IS comparing the integers —
no hex→int conversion needed in either engine.

* ``hash_sample``            — keep ~pct% of rows, deterministically.
* ``hash_split``             — disjoint train/val/test assignment by
                               cumulative bucket thresholds.
* ``pack_sequences``         — sequence packing: assign docs to fixed
                               token-budget bins per group via a running
                               token cumsum (window function; the greedy
                               order is (group, doc_id) so both engines
                               agree exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 65536  # 16^4: first 4 md5 hex digits


def _bucket_hex(threshold: float) -> str:
    """Plan-time literal: 4-hex-digit upper bound for a [0,1] fraction.
    'g' sorts after every hex digit, so threshold >= 1.0 keeps all rows."""
    n = int(_BUCKETS * threshold)
    return "g" if n >= _BUCKETS else format(n, "04x")


def _bucket_col(key, seed: int):
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string")).cast("binary")),
        1, 4,
    )


def hash_sample(df: DataFrame, pct: float, key_col: str = "doc_id",
                seed: int = 0) -> DataFrame:
    """~pct% deterministic sample: keep rows whose md5 bucket < threshold."""
    b = _bucket_col(F.col(key_col), seed)
    return df.where(b < F.lit(_bucket_hex(pct / 100.0)))


def hash_split(df: DataFrame, train_pct: float = 80.0, val_pct: float = 10.0,
               key_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Disjoint, exhaustive train/val/test assignment (test = remainder).

    The same (seed, key) always lands in the same split — across runs,
    cluster sizes, and engines — which is what prevents train/test leakage
    when the corpus is re-processed incrementally."""
    b = _bucket_col(F.col(key_col), seed)
    t1 = F.lit(_bucket_hex(train_pct / 100.0))
    t2 = F.lit(_bucket_hex((train_pct + val_pct) / 100.0))
    return df.withColumn(
        "split",
        F.when(b < t1, "train").when(b < t2, "val").otherwise("test"),
    )


def pack_sequences(df: DataFrame, bin_tokens: int, group_col: str = "lang",
                   key_col: str = "doc_id",
                   tokens_col: str = "n_tokens") -> DataFrame:
    """Sequence packing: bin index per document so each bin holds about
    ``bin_tokens`` tokens, filled greedily in (group, key) order.

    bin = floor(cumsum_before / bin_tokens) where cumsum_before excludes
    the current document — a document starts a new bin exactly when the
    running total crosses the budget, the same greedy rule a training
    dataloader applies, expressed as ONE window cumsum (a single shuffle
    on the group key; no Python, no iteration)."""
    w = (
        Window.partitionBy(group_col).orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("bigint")
    return df.select(
        group_col, key_col,
        F.col(tokens_col).cast("bigint").alias(tokens_col),
        F.floor(cum_before / bin_tokens).cast("bigint").alias("bin_id"),
    )
