"""Similarity search over an embedding column (array<float>).

* ``cosine_topk``   — brute-force exact top-k: the correctness baseline.
  Dot products via ``zip_with``/``aggregate`` higher-order functions —
  JVM-side, no Python.  Scores are floored at 1e6 scale before ranking so
  rank order is engine-reproducible (the DuckDB oracle uses the same
  flooring).
* ``lsh_bucketed_topk`` — the scale path: random-hyperplane (sign) LSH.
  Hyperplane components are derived deterministically from md5 of
  (plane, dim) — no RNG state, so every executor/engine derives identical
  planes.  Candidates = vectors sharing a bucket with the query; exact
  cosine re-rank inside the bucket only.  At 10^12 rows the bucket join is
  an equi-join on a short signature string instead of a cross join.

Near-dup detection by embedding (``embedding_near_dups``) = pairs above a
cosine threshold among bucket collisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    """Zero-norm-safe cosine: NULL when either vector has zero norm
    (ANSI mode makes a bare division throw on zero divisors; a zero vector
    has no direction, so NULL — which every consumer filters — is correct)."""
    den = _norm(a) * _norm(b)
    return F.when(den == 0.0, F.lit(None)).otherwise(_dot(a, b) / den)


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query id (excluding self).

    Output: (query_id, neighbor_id, score_e6 bigint, rank int) — the score
    is floor(cosine * 1e6) so value-hash comparison against the SQL oracle
    is exact."""
    q = (
        emb.where(F.col(id_col).isin(query_ids))
           .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    joined = (
        F.broadcast(q)  # queries are a handful of rows — broadcast always
        .crossJoin(emb.select(F.col(id_col).alias("neighbor_id"),
                              F.col(vec_col).alias("nv")))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.floor(cosine(F.col("qv"), F.col("nv")) * 1e6).cast("bigint").alias("score_e6"),
        )
        .where(F.col("score_e6").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_e6"), F.asc("neighbor_id")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score_e6", "rank")
    )


def _plane(plane: int, dims: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component d in [-0.5, 0.5)
    from the first 6 md5 hex digits of 'p|d'.  Computed once at PLAN time —
    every engine/executor derives the identical plane, and the per-row work
    is just a dot product against a literal array (no per-row hashing)."""
    import hashlib
    return [
        int(hashlib.md5(f"{plane}|{d}".encode()).hexdigest()[:6], 16) / 16777216.0 - 0.5
        for d in range(dims)
    ]


def with_lsh_signature(emb: DataFrame, vec_col: str = "embedding",
                       n_planes: int = N_PLANES, dims: int = 64) -> DataFrame:
    """Sign-LSH signature string: bit p = (dot(v, plane_p) >= 0)."""
    v = F.col(vec_col)
    bits = []
    for p in range(n_planes):
        # literal plane, trimmed per-row to the vector's length so shorter
        # embeddings don't zip against nulls
        w = F.slice(F.array(*[F.lit(x) for x in _plane(p, dims)]), 1, F.size(v))
        proj = F.aggregate(
            F.zip_with(v, w, lambda x, wc: x * wc),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return emb.withColumn("lsh_sig", F.concat(*bits))


def lsh_bucketed_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      n_planes: int = N_PLANES) -> DataFrame:
    """ANN: candidates share the full LSH bucket; exact re-rank within.

    Recall < 1 by design (bucket misses); the bench compares its speed and
    recall against cosine_topk."""
    sig = with_lsh_signature(emb, vec_col, n_planes)
    q = sig.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        F.col("lsh_sig"),
    )
    cand = sig.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("nv"), F.col("lsh_sig"))
    joined = (
        F.broadcast(q).join(cand, on="lsh_sig")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.floor(cosine(F.col("qv"), F.col("nv")) * 1e6).cast("bigint").alias("score_e6"),
        )
        .where(F.col("score_e6").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_e6"), F.asc("neighbor_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score_e6", "rank")
    )


def embedding_near_dups(emb: DataFrame, threshold_e6: int = 999_000,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        n_planes: int = N_PLANES) -> DataFrame:
    """Near-duplicate pairs by embedding cosine, bucketed by LSH signature."""
    sig = with_lsh_signature(emb, vec_col, n_planes)
    l = sig.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "lsh_sig")
    r = sig.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "lsh_sig")
    return (
        l.join(r, on="lsh_sig")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.floor(cosine(F.col("va"), F.col("vb")) * 1e6).cast("bigint").alias("score_e6"),
        )
        .where(F.col("score_e6").isNotNull() & (F.col("score_e6") >= threshold_e6))
    )
