"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale-first shapes (the 100 TB rationale, per operator):

* exact      — one hash-aggregate on md5(text): a single shuffle keyed by a
               16-byte digest, map-side partial agg; no text moves twice.
* minhash    — shingle explode → per-doc min-aggregate per hash slot (k
               independent permutations approximated by seeded md5) → LSH
               band join.  Candidate pairs only: documents never pairwise
               compare unless a band collides, which is what keeps it
               sub-quadratic at corpus scale.
* simhash    — 32-bit signature from per-token md5 high bits;
               ``simhash_near_pairs`` finds pairs within hamming radius d
               via a chunk-bucket join: split the signature into d+1
               chunks — pigeonhole guarantees a pair at distance <= d
               matches exactly on at least one chunk — join on (chunk_idx,
               chunk_value), verify the full distance with bit_count(xor).
* ngram      — exact Jaccard on distinct word 3-grams computed via a
               shingle-key equi-join (co-shingle counting), never a cross
               join.  Shingles whose document frequency exceeds ``max_df``
               are dropped BEFORE the self-join: a stop-shingle in k docs
               would materialize k^2/2 join rows (the 100 TB blowup), and
               it carries no near-dup signal — J >= 0.8 pairs share many
               RARE shingles.  Jaccard is then computed over the capped
               shingle sets on both sides (sizes and intersections), so
               the DuckDB oracle mirrors it exactly.

Everything is built-in-function SQL (md5/least/greatest/window) — no Python
UDFs — and every operator has an exact DuckDB oracle in __spark_entry__.py
because md5 is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from qwen_ocr_spark.plans.session import track_cached

MINHASH_SLOTS = 8
MINHASH_BANDS = 4  # 2 slots per band
SHINGLE_N = 3
MAX_SHINGLE_DF = 256  # default document-frequency cap for the jaccard join
SIMHASH_RADIUS = 3    # default hamming radius; 4 chunks of 8 bits
_BITMAP_WORDS = 4     # 4 x 64 = 256-bit hashed doc bitmaps (jaccard
                      # pre-filter; exactness does not depend on the width,
                      # only pruning power does).  Round-6 A/B at sf1: the
                      # prefix self-join materializes ~20M rows carrying 2x
                      # (_BITMAP_WORDS+1) bigints each, so width is the
                      # dominant term of the join cost — 16→4 words cut the
                      # candidate stage 1.42 s → 0.95 s with the IDENTICAL
                      # candidate count (5,080; ~50-shingle docs stay sparse
                      # in 256 bits).  Size to ~2-4x the typical distinct-
                      # shingle count per doc: much larger documents (or a
                      # higher max_df regime) deserve 16+ words again —
                      # saturated bitmaps only cost pruning power, never
                      # correctness.


def exact_dups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one representative (min id) per distinct text."""
    return (
        df.select(F.md5(F.col(text_col).cast("binary")).alias("text_md5"), F.col(id_col))
          .groupBy("text_md5")
          .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def incremental_dedup(new_df: DataFrame, digest_path: str,
                      id_col: str = "doc_id", text_col: str = "text",
                      commit: bool = True, run_id: str | None = None) -> DataFrame:
    """Cross-run exact dedup: drop rows whose text digest is already in the
    committed digest table, then (``commit=True``) append the survivors'
    digests — the operator a crawl pipeline runs per ingest batch so no
    snapshot ever re-admits text any PREVIOUS snapshot contained.

    Scale shape: the state is a table of 16-byte md5 digests, not text —
    at 10^12 documents that is ~16 TB of digests vs ~100 TB of text, and
    the anti-join shuffles only (digest) pairs; AQE broadcasts the batch
    side while it is small.  Within-batch duplicates also collapse (keep
    min id), so the operator is idempotent: re-running the same batch
    admits zero rows.  Digests are committed under a run_id partition and
    the survivors are re-derived from a read-back of ONLY that partition
    (the write_output pattern — appending to ``digest_path`` invalidates
    any plan that anti-joins against it, so returning the pre-append
    ``fresh`` plan would silently re-evaluate to zero rows).  Single
    committer per digest table at a time, like the url resume anti-join."""
    import uuid
    from pyspark.sql.utils import AnalysisException
    spark = new_df.sparkSession
    batch = new_df.withColumn(
        "text_md5", F.md5(F.col(text_col).cast("binary")))
    w = Window.partitionBy("text_md5").orderBy(F.asc(id_col))
    batch = (batch.withColumn("_rn", F.row_number().over(w))
             .where(F.col("_rn") == 1).drop("_rn"))
    try:
        seen = spark.read.parquet(digest_path).select("text_md5")
        fresh = batch.join(seen, on="text_md5", how="left_anti")
    except AnalysisException:
        fresh = batch  # first batch: nothing committed yet
    if not commit:
        return fresh.drop("text_md5")
    rid = run_id or f"dedup-{uuid.uuid4().hex[:12]}"
    (
        fresh.select("text_md5").withColumn("run_id", F.lit(rid))
        .write.mode("append").partitionBy("run_id").parquet(digest_path)
    )
    try:
        mine = spark.read.parquet(f"{digest_path}/run_id={rid}")
    except AnalysisException:
        return batch.limit(0).drop("text_md5")  # nothing was fresh
    return batch.join(mine, on="text_md5", how="left_semi").drop("text_md5")


def word_shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  n: int = SHINGLE_N, distinct: bool = True) -> DataFrame:
    """Word n-gram shingles per document (one vectorized Python pass).

    ``distinct=True`` (the default) dedups (doc, shingle) — required by
    set semantics (n-gram Jaccard).  The dedup is PER DOCUMENT (first
    occurrence kept, like ``array_distinct``), inside the same pass.
    Pass ``distinct=False`` for duplicate-insensitive consumers
    (MinHash's per-slot ``min`` gives the same answer either way).

    Round 6: the array is built by a pandas_udf instead of the round-1
    ``transform(sequence(...), i -> array_join(slice(toks, i+1, n)))``
    expression — higher-order lambdas are interpreted PER ELEMENT
    (the round-2 gotcha), and isolating the explode showed the shingle
    construction alone cost 1.37 s of the 1.7 s minhash pipeline at sf1.
    CPython's C-level ``str.split``/``' '.join`` do the same work in
    ~0.1 s; the JVM boundary only carries (text in, shingle array out).
    The Python tokenizer reproduces the SQL semantics exactly:
    ``trim()`` strips 0x20 only, the split regex is ASCII ``\\s+``
    (Java's default), trailing empty tokens survive (Spark split keeps
    them at limit -1), and NULL text yields a NULL array."""
    return df.select(
        F.col(id_col),
        F.explode(_shingle_array_udf(n, distinct)(F.col(text_col))).alias("shingle"),
    )


def _shingle_array_udf(n: int = SHINGLE_N, distinct: bool = False):
    """Vectorized pandas_udf: text → word n-gram shingle array (order
    preserved; ``distinct`` keeps first occurrences, like array_distinct).
    Deterministic (default), so persisted downstream relations are
    cache-reusable under joins — unlike mapInArrow/mapInPandas nodes."""
    import pandas as pd

    @F.pandas_udf("array<string>")
    def shingle(texts):
        import re
        ws = re.compile(r"\s+", re.ASCII)  # Java \s is ASCII-only
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks = ws.split(t.strip(" "))  # SQL trim: 0x20 only
            if len(toks) < n:
                out.append([])
                continue
            sh = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
            if distinct:
                sh = list(dict.fromkeys(sh))
            out.append(sh)
        return pd.Series(out)

    return shingle


def _shingle_array(text_col: str, n: int = SHINGLE_N):
    """Column expression: the document's word n-gram array (with
    duplicates, in text order) — the vectorized Python pass (see
    ``_shingle_array_udf``; kept as the single shared implementation
    seam for word_shingles and doc_shingle_sets)."""
    return _shingle_array_udf(n, distinct=False)(F.col(text_col))


def doc_shingle_sets(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", n: int = SHINGLE_N) -> DataFrame:
    """Per-document distinct-shingle ARRAY — ``(id_col, _set)`` — built
    entirely from deterministic row-local expressions (split → transform →
    array_distinct): no explode, no shuffle, no aggregate.

    This matters beyond the saved shuffle (round 6): ``collect_set`` /
    ``collect_list`` are flagged non-deterministic, and Spark will NOT
    reuse a cached relation whose plan contains a non-deterministic
    expression when it appears under a join — each join side silently
    re-runs the whole aggregate (measured: a persisted
    collect_set-bearing MinHash aggregate re-ran its full 12 s-CPU
    pipeline on BOTH sides of the LSH band self-join at sf1, every
    action, despite 32/32 cached partitions).  An expression-only set
    relation caches and reuses cleanly."""
    return df.select(
        F.col(id_col),
        _shingle_array_udf(n, distinct=True)(F.col(text_col)).alias("_set"))


def minhash_signatures(shingles: DataFrame, id_col: str = "doc_id",
                       slots: int = MINHASH_SLOTS) -> DataFrame:
    """k-slot MinHash: slot_i = min(md5(i || '|' || shingle)) per document.

    Seeded md5 approximates k independent hash permutations and is
    bit-identical across engines (the oracle property)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")).cast("binary"))).alias(f"mh{i}")
        for i in range(slots)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        slots: int = MINHASH_SLOTS,
                        bands: int = MINHASH_BANDS,
                        persist: bool = True,
                        storage: list | None = None) -> DataFrame:
    """Band the signature, self-join per band, emit distinct (a < b) pairs.

    The stacked (id, band_key) relation feeds BOTH sides of the self-join;
    ``persist=True`` caches it (``bands`` rows per document — tiny next to
    the text) so the upstream scan → shingle explode → min-agg runs once
    instead of twice — the same one-relation-both-sides shape the banded
    ANN join uses (similarity.banded_buckets).  Pass a list as ``storage``
    to receive the persisted intermediate for explicit ``unpersist()``.

    Band keys are BINARY — one band-index byte plus ``unhex`` of each
    md5-hex slot (fixed 1+16n bytes) — instead of the round-5 pipe-joined
    hex string (~70 chars): hex↔binary is bijective and every part is
    fixed-width, so key equality (and therefore the candidate pair set)
    is IDENTICAL, while the sort-merge join sorts/compares half the bytes
    — measured 0.94 s → 0.38 s on the 220k-row self-join at sf1 (guide
    §2.3 "narrower types"; round 6)."""
    rows_per_band = slots // bands
    band_cols = []
    for b in range(bands):
        parts = [F.unhex(F.col(f"mh{i}"))
                 for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(F.concat(F.lit(bytes([b])), *parts).alias(f"band{b}"))
    banded = sigs.select(F.col(id_col), *band_cols)
    stacked = banded.select(
        F.col(id_col),
        F.explode(F.array(*[F.col(f"band{b}") for b in range(bands)])).alias("band_key"),
    )
    if persist:
        # Round 6: persist the relation ALREADY hash-partitioned by the
        # join key.  An InMemoryTableScan reports the cached plan's output
        # partitioning, so both SMJ sides of the self-join read
        # co-partitioned cache and the join plans ZERO exchanges (guide
        # §2.4 — the in-session analog of a bucketed table; also two fewer
        # AQE stage rounds per action).  The one repartition happens at
        # cache build.  Trade-off, documented: a cached side has no
        # exchange for AQE skew-splitting to rewrite — bounded band-bucket
        # multiplicity is already this operator's own contract (banding
        # math in similarity.py).
        stacked = track_cached(
            stacked.repartition("band_key").persist(), storage)
    left = stacked.alias("l")
    right = stacked.alias("r")
    return (
        left.join(right, on="band_key")
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def _cc_star(e: DataFrame, max_iter: int) -> tuple[DataFrame, bool]:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond") — O(log n)
    rounds even on adversarially deep components, where min-label
    propagation needs O(diameter).

    Edges live canonically as (a, b) with a > b, deduped.  Per round:

    * large-star — for each node u with m(u) = min(N(u) ∪ {u}): emit
      (v, m(u)) for every neighbor v > u (computed over the SYMMETRIC
      neighborhood);
    * small-star — on the canonical lo-directed edges: for each u with
      smaller-neighbor min m: emit (u, m) and (v, m) for the other
      smaller neighbors.

    Convergence = the canonical edge set is stable (a star forest whose
    centers are component minima); checked with a set-difference count,
    which cannot overflow under ANSI mode.  Each round localCheckpoints
    (truncated lineage — the driver-tree growth fix measured in round 3).
    Returns (labels(node, label), converged)."""
    def canon(df: DataFrame) -> DataFrame:
        return (df.select(F.greatest("a", "b").alias("a"),
                          F.least("a", "b").alias("b"))
                  .where(F.col("a") != F.col("b")).distinct())

    E = canon(e).localCheckpoint(eager=True)
    n_edges = E.count()
    converged = False
    for _ in range(max_iter):
        sym = E.union(E.select(F.col("b").alias("a"), F.col("a").alias("b")))
        lm = (sym.groupBy("a").agg(F.min("b").alias("mn"))
                 .select("a", F.least("a", "mn").alias("m")))
        ls = (sym.join(lm, on="a")
                 .where(F.col("b") > F.col("a"))
                 .select(F.col("b").alias("a"), F.col("m").alias("b")))
        E1 = canon(ls).localCheckpoint(eager=True)
        sm = E1.groupBy("a").agg(F.min("b").alias("m"))
        ss = (E1.join(sm, on="a")
                .select(F.col("b").alias("v"), "m")
                .where(F.col("v") != F.col("m"))
                .union(sm.select(F.col("a").alias("v"), "m")))
        E2 = canon(ss.select(F.col("v").alias("a"), F.col("m").alias("b"))
                   ).localCheckpoint(eager=True)
        n2 = E2.count()
        if n2 == n_edges and E2.subtract(E).count() == 0:
            E = E2
            converged = True
            break
        E, n_edges = E2, n2
    nodes = (e.select(F.col("a").alias("node"))
             .union(e.select(F.col("b").alias("node"))).distinct())
    mins = E.groupBy("a").agg(F.min("b").alias("m"))
    labels = (nodes.join(mins, nodes["node"] == mins["a"], "left")
              .select("node", F.coalesce(F.col("m"),
                                         F.col("node")).alias("label")))
    return labels, converged


def jaccard_verify_pairs(df: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = SHINGLE_N, threshold: float = 0.8,
                         persist: bool = True,
                         storage: list | None = None,
                         shingles: DataFrame | None = None,
                         doc_sets: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard computed ONLY on candidate pairs — the
    production near-dup composition at corpus scale (round 5): a
    sub-quadratic candidate generator (MinHash-LSH / SimHash) proposes
    (id_a, id_b) pairs and the exact measure verifies them.

    Cost: two equi-joins + one pair-key aggregate — linear in
    |candidates| x shingles/doc, INDEPENDENT of shingle document
    frequencies.  The all-pairs co-shingle join (ngram_jaccard_pairs)
    costs sum(min(df, cap)^2) over shingles, which transitions through a
    quadratic regime as DFs densify with corpus growth (measured 48x
    runtime for 10x rows on the synthetic corpus at sf1 — the round-5
    scale check; BENCH/BASELINE.md).  At 10^12 documents only this
    verified-candidates shape survives; the all-pairs operator remains
    the exact baseline for bounded relations.

    Candidates with zero shared shingles simply drop out (they cannot
    reach any positive threshold).  Output: (id_a, id_b, jaccard_e4) for
    pairs at/above threshold — same contract as ngram_jaccard_pairs.

    Round-6 shape: one ``collect_set`` aggregate builds each doc's
    distinct-shingle set (so the explode needs no separate distinct
    shuffle, and callers may pass a NON-distinct ``shingles`` relation),
    and the verify is ``size(array_intersect)`` per candidate pair — two
    joins that move |candidates| rows instead of re-shuffling the full
    shingle relation twice.  ``inter >= 1`` preserves the old inner-join
    semantics (zero-overlap candidates drop out even at threshold 0).
    The per-doc sets come from :func:`doc_shingle_sets` — row-local
    deterministic expressions, NO collect_set aggregate (round 6: a
    persisted collect_set plan is silently re-run by every join consumer
    because collect aggregates are flagged non-deterministic; see
    doc_shingle_sets).  Pass ``doc_sets`` (an ``(id_col, _set)``
    relation, ideally already persisted) to share one set relation
    across a larger composition.  ``shingles`` is accepted for backward
    compatibility and ignored — the sets no longer need an exploded
    relation."""
    del shingles  # legacy parameter; sets are built from the text column
    if doc_sets is not None:
        arr = doc_sets
    else:
        arr = doc_shingle_sets(df, id_col, text_col, n)
        if persist:
            arr = track_cached(arr.persist(), storage)
    aa = arr.select(F.col(id_col).alias("id_a"), F.col("_set").alias("_seta"))
    ab = arr.select(F.col(id_col).alias("id_b"), F.col("_set").alias("_setb"))
    # broadcast the CANDIDATE side and stream the per-doc set relation:
    # candidates are the small relation by construction (that is the point
    # of LSH), and the set relation carries the wide arrays — joining the
    # other way round exchanges the arrays (a cached AQE plan reports
    # UnknownPartitioning, so the planner re-shuffled both sides; measured
    # 2 x ~0.5 s at sf1, round 6).  j1 is candidate-sized, so the second
    # hop broadcasts it too.  A corpus whose candidate relation outgrows
    # broadcast would bucket both relations by id instead.
    j1 = aa.join(F.broadcast(pairs.select("id_a", "id_b")), "id_a")
    return (
        ab.join(F.broadcast(j1), "id_b")
        .withColumn("inter",
                    F.size(F.array_intersect("_seta", "_setb")).cast("bigint"))
        .withColumn("size_a", F.size("_seta").cast("bigint"))
        .withColumn("size_b", F.size("_setb").cast("bigint"))
        .where(F.col("inter") >= 1)
        .withColumn(
            "jaccard_e4",
            F.floor(
                F.col("inter") * 10000.0
                / (F.col("size_a") + F.col("size_b") - F.col("inter"))
            ).cast("bigint"),
        )
        .where(F.col("jaccard_e4") >= int(threshold * 10000))
        .select("id_a", "id_b", "jaccard_e4")
    )


def connected_components(pairs: DataFrame, a_col: str = "id_a",
                         b_col: str = "id_b", max_iter: int = 25,
                         algorithm: str = "label") -> DataFrame:
    """Duplicate-group clustering: connected components over a near-dup
    pair relation → ``(node, group_id)`` with group_id = the component's
    minimum id (the canonical "keep" representative).  The step every
    dedup pipeline needs after pair generation: near-duplication is
    transitive in effect (A~B, B~C ⇒ one cluster) even when A~C scored
    below threshold, and exactly one representative per cluster survives.

    Algorithm: iterative min-label propagation — label(v) starts at v and
    each round takes the min over neighbors' labels; converges in
    O(component diameter) rounds.  The fixpoint check counts CHANGED
    labels per round (a bigint row count — a sum over the labels
    themselves could overflow and THROW under this repo's default ANSI
    mode at large-id/corpus scale).  Near-dup clusters are shallow
    (dozens of docs, diameter ~ a few hops), so this beats the
    constant-factor overhead of the alternating large-star/small-star
    construction that would be preferred if components could span
    millions of rows.  Each round is one int-pair equi-join +
    min-aggregate — the only state shuffled is (node, label).

    If ``max_iter`` rounds pass without reaching the fixpoint (an
    adversarially long chain — outside the documented shallow regime), a
    ``RuntimeWarning`` fires rather than silently returning a
    partially-merged labeling; callers can raise ``max_iter`` or pass
    ``algorithm="star"`` — the alternating large-star/small-star
    implementation (``_cc_star``, round 5) that converges in O(log n)
    rounds regardless of component depth (a 1,000-node chain finishes in
    a handful of rounds where label propagation needs 999).

    Each round materializes via ``localCheckpoint(eager=True)``, not
    persist: the logical plan references the previous round's labels
    TWICE (neighbor min + the left join), so under plain persist the
    ANALYZED plan doubles per round and the driver OOMs re-walking it
    past ~25 rounds even though execution is cached.  The checkpoint
    truncates lineage to one level per round; the pinned label RDDs are
    tiny (two ints per node) and freed by GC + ContextCleaner after the
    call (the streaming-accumulation caveat in sinks/manifest.py does
    not apply to a bounded batch loop)."""
    import warnings

    e = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    if algorithm == "star":
        labels, converged = _cc_star(e, max_iter)
        if not converged:
            warnings.warn(
                f"connected_components(star) hit max_iter={max_iter} "
                "before the edge set stabilized; the grouping may be "
                "partially merged.", RuntimeWarning, stacklevel=2)
        return labels.select(F.col("node"), F.col("label").alias("group_id"))
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r} "
                         "(expected 'label' or 'star')")
    edges = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).persist()
    labels = (edges.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))
    converged = False
    for _ in range(max_iter):
        nbr = (
            edges.join(labels.select(F.col("node").alias("b"),
                                     F.col("label").alias("nlabel")), on="b")
            .groupBy("a").agg(F.min("nlabel").alias("min_nbr"))
        )
        new_labels = (
            labels.join(nbr, labels["node"] == nbr["a"], "left")
            .select(labels["node"],
                    F.least(labels["label"],
                            F.coalesce(F.col("min_nbr"), labels["label"])
                            ).alias("label"),
                    (F.col("min_nbr") < labels["label"])
                    .alias("_changed"))
            .localCheckpoint(eager=True)
        )
        # one scalar per round: how many labels still moved (0 = fixpoint).
        # A row count cannot overflow — a sum over bigint labels could
        # THROW under this repo's default ANSI mode at large-id scale.
        n_changed = new_labels.where("_changed").count()
        labels = new_labels
        if n_changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        warnings.warn(
            f"connected_components hit max_iter={max_iter} before the "
            "fixpoint: the returned grouping may be partially merged "
            "(component diameter exceeds max_iter). Raise max_iter or use "
            "a large-star/small-star variant for deep components.",
            RuntimeWarning, stacklevel=2)
    return labels.select(F.col("node"), F.col("label").alias("group_id"))


def duplicate_groups(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", threshold: float = 0.8,
                     max_df: int | None = MAX_SHINGLE_DF,
                     candidates: str = "all-pairs",
                     storage: list | None = None) -> DataFrame:
    """End-to-end near-dup clustering: n-gram Jaccard pairs above
    ``threshold`` → connected components → one row per clustered document
    ``(doc_id, group_id, is_keep)`` with the min-id representative marked.
    Documents with no near-dup partner don't appear (they are all keeps).
    ``storage`` receives the persisted shingle intermediate (see
    ``ngram_jaccard_pairs``).

    ``candidates="lsh"`` (round 5) swaps the all-pairs co-shingle join
    for the corpus-scale composition: MinHash-LSH proposes candidate
    pairs sub-quadratically, exact Jaccard verifies only those
    (``jaccard_verify_pairs`` — linear in candidates, independent of
    shingle document frequencies; the sf1 scale check measured the
    all-pairs join's quadratic df-densification regime).  On the bench
    corpus both modes return the identical pair set and therefore the
    identical clustering.

    Mode caveats (ADVICE r5): the lsh mode computes UNCAPPED exact
    Jaccard (``max_df`` is ignored — LSH already bounds the join, so no
    df cap is needed or applied) and its pair set is subject to MinHash
    LSH candidate recall; the two modes coincide exactly when the cap
    never binds and recall is 1 — true on the bench corpus, not a
    general identity."""
    if candidates == "lsh":
        # deterministic-only persisted intermediates (round 6): the
        # MinHash signature aggregate (min() slots) for candidate
        # generation, and an expression-built per-doc set relation for
        # the verify — no collect_set anywhere, so both caches are
        # actually REUSED by their join consumers (see doc_shingle_sets)
        sigs = track_cached(
            minhash_signatures(
                word_shingles(df, id_col, text_col, distinct=False),
                id_col=id_col).persist(),
            storage)
        cands = lsh_candidate_pairs(sigs, id_col=id_col, storage=storage)
        sets = track_cached(
            doc_shingle_sets(df, id_col, text_col).persist(), storage)
        pairs = jaccard_verify_pairs(df, cands, id_col, text_col,
                                     threshold=threshold, storage=storage,
                                     doc_sets=sets)
    elif candidates == "all-pairs":
        pairs = ngram_jaccard_pairs(df, id_col, text_col,
                                    threshold=threshold, max_df=max_df,
                                    storage=storage)
    else:
        raise ValueError(f"unknown candidates mode {candidates!r}")
    cc = connected_components(pairs)
    return cc.select(
        F.col("node").alias(id_col),
        "group_id",
        (F.col("node") == F.col("group_id")).alias("is_keep"),
    )


def simhash32(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash as a '0'/'1' string (MSB first).

    Bit j of a token = high bit of hex digit j of md5(token) (a hex digit
    >= '8' lexicographically).  Signature bit j = majority vote weighted by
    token frequency.  String-domain trick keeps it engine-portable."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    h = F.md5(F.col("tok").cast("binary"))
    votes = [
        F.sum(
            F.when(F.substring(h, j + 1, 1) >= "8", 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(32)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    bits = F.concat(*[
        F.when(F.col(f"v{j}") > 0, F.lit("1")).otherwise(F.lit("0")) for j in range(32)
    ])
    return agg.select(F.col(id_col), bits.alias("simhash"))


def simhash_chunk_bounds(radius: int, sig_bits: int = 32) -> list[tuple[int, int]]:
    """1-based (start, width) of each pigeonhole chunk, covering ALL bits:
    the remainder of ``sig_bits / (radius + 1)`` is spread one extra bit per
    leading chunk so no trailing bits fall outside every bucket key (which
    would silently coarsen the buckets when radius+1 doesn't divide 32)."""
    chunks = radius + 1
    base, rem = divmod(sig_bits, chunks)
    bounds, start = [], 1
    for c in range(chunks):
        width = base + (1 if c < rem else 0)
        bounds.append((start, width))
        start += width
    return bounds


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       radius: int = SIMHASH_RADIUS,
                       persist: bool = True,
                       storage: list | None = None) -> DataFrame:
    """SimHash neighbor search: (id_a < id_b, hamming) pairs within radius.

    Round-6 shape (identical output, measured 70.9 s → seconds at sf1):

    1. **Collapse to DISTINCT signatures first.**  Every doc sharing a
       signature joins identically, so candidate generation runs over the
       distinct-sig relation (30.6k rows vs 50k docs at sf1 — and the gap
       widens with duplication).  Doc pairs are recovered afterwards by
       two id-joins (inter-sig) plus a same-sig self-join (intra-sig,
       hamming 0, bounded by sum of multiplicity²).
    2. **1-bit-expansion block join** instead of the radius+1-chunk
       pigeonhole equi-join.  The old scheme split 32 bits into radius+1
       = 4 chunks of 8 bits — only 2^8 buckets per chunk, which on 50k
       docs materialized **1.14e9 join rows** (measured; chunk 2 alone
       711M — simhash buckets are skewed because signature bits are
       correlated) for a ~2.2M-pair answer.  Splitting into
       ``ceil((radius+1)/2)`` chunks instead, a pair within ``radius``
       must have SOME chunk within distance **1** (pigeonhole:
       c chunks, min chunk dist <= floor(radius/c) <= 1), so candidates =
       equi-join of one side's {chunk, chunk with one bit flipped}
       expansion (width+1 keys per chunk) against the other side's exact
       chunk.  For radius 3 that is 2 chunks of 16 bits — 2^16 buckets,
       17+1 keys per sig per chunk — measured 47M join rows, 24x fewer,
       and the distinct runs on sig pairs (2.2M) not doc pairs.
       Both directions of every qualifying pair are generated (the
       expansion is symmetric), so ``sig_a < sig_b`` keeps exactly one.
    3. Exact ``bit_count(xor) <= radius`` verify on the deduped sig
       pairs restores equality with the old output.

    Scale note: at 10^9+ near-uniform docs the distinct-sig relation
    approaches N and 2^16 buckets saturate — there you widen the
    signature (64/128-bit) and the same construction gives 2^32+ buckets;
    the knob is signature width, not this plan shape.

    ``persist=True`` caches the (id, sig_int) relation (feeds the two
    recovery joins + the intra self-join) and the distinct-sig relation
    (feeds both candidate sides).  Pass a list as ``storage`` to receive
    the handles for ``unpersist()``."""
    sig = simhash32(df, id_col, text_col).select(
        F.col(id_col),
        F.conv(F.col("simhash"), 2, 10).cast("bigint").alias("sig_int"),
    )
    if persist:
        sig = track_cached(sig.persist(), storage)
    D = sig.select("sig_int").distinct()
    if persist:
        D = track_cached(D.persist(), storage)

    # c = ceil((radius+1)/2) chunks covering all 32 bits; chunk i of the
    # STRING bounds (1-based, MSB first) maps to shift = 32 - start+1 - width
    n_chunks = (radius + 2) // 2
    bounds = simhash_chunk_bounds(n_chunks - 1)
    exact_keys, expand_keys = [], []
    for i, (start, width) in enumerate(bounds):
        shift = 32 - (start - 1) - width
        base = F.shiftrightunsigned(F.col("sig_int"), shift) \
            .bitwiseAND(F.lit((1 << width) - 1))
        tag = F.lit(i * (1 << 20))  # disjoint key spaces per chunk
        exact_keys.append(tag + base)
        expand_keys.append(F.array(
            tag + base,
            *[tag + base.bitwiseXOR(F.lit(1 << j)) for j in range(width)],
        ))
    right = D.select("sig_int", F.explode(F.array(*exact_keys)).alias("k"))
    left = D.select(
        "sig_int",
        F.explode(F.flatten(F.array(*expand_keys))).alias("k"),
    )
    cand = (
        left.alias("l").join(right.alias("r"), on="k")
        .where(F.col("l.sig_int") < F.col("r.sig_int"))
        .select(F.col("l.sig_int").alias("sig_a"),
                F.col("r.sig_int").alias("sig_b"))
        .distinct()
        .withColumn("hamming", F.bit_count(
            F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"))
        .where(F.col("hamming") <= radius)
    )
    ia = sig.select(F.col(id_col).alias("_ida"), F.col("sig_int").alias("sig_a"))
    ib = sig.select(F.col(id_col).alias("_idb"), F.col("sig_int").alias("sig_b"))
    inter = (
        cand.join(ia, on="sig_a").join(ib, on="sig_b")
        .select(F.least("_ida", "_idb").alias("id_a"),
                F.greatest("_ida", "_idb").alias("id_b"),
                "hamming")
    )
    intra = (
        sig.alias("a").join(sig.alias("b"), on="sig_int")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.lit(0).cast("int").alias("hamming"))
    )
    return inter.unionAll(intra)


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = SHINGLE_N,
                        threshold: float = 0.8,
                        max_df: int | None = MAX_SHINGLE_DF,
                        persist: bool = True,
                        storage: list | None = None,
                        _index_prefix: bool = True) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs above threshold.

    Round-6 shape: prefix filtering (AllPairs/PPJoin, Bayardo et al. 2007;
    Xiao et al. 2008) instead of the naive co-shingle self-join.  The
    naive join emits one row per co-occurrence — sum over shingles of
    df^2 — and on the dense bench corpus at sf1.0 that was measured at
    154M join rows feeding a 138M-distinct-key aggregate for an 8.1k-row
    answer.  Three provably lossless pair filters cut that to ~2.9M
    candidates (47x) before any aggregation:

    * prefix — order each doc's shingles canonically by (global df,
      shingle); two docs with J >= t MUST share a shingle within their
      first ``sz - ceil(t*sz) + 1`` shingles, so only those prefix rows
      enter the self-join;
    * size — J >= t implies 10000*min(|A|,|B|) >= t_e4*max(|A|,|B|);
    * positional — at the first common prefix shingle (positions pa, pb)
      the overlap is bounded by 1 + min(|A|-pa, |B|-pb), which must reach
      ceil(t/(1+t) * (|A|+|B|)); a pair is kept when ANY matching row
      passes, so the filter only ever removes non-qualifying pairs.

    All three are integer arithmetic on ``t_e4 = int(threshold*10000)`` —
    exactly the final filter's threshold — so the candidate set is a
    strict superset of the answer and the exact verify restores equality.
    Verification intersects per-doc shingle-id arrays
    (``size(array_intersect)``) instead of re-joining the full shingle
    relation: int arrays, one row per candidate pair.  Shingles ride as
    dense int ids (row_number over the distinct-shingle relation, which
    the df-cap aggregate produces anyway) so every join key and array
    element after the first aggregate is an int, not a 3-word string.

    ``max_df`` cap semantics are unchanged: shingles above the cap drop
    from intersections AND sizes (the oracle mirrors this).  The ranked
    shingle relation feeds two consumers (prefix + arrays);
    ``persist=True`` caches it.  Pass a list as ``storage`` to receive
    persisted handles for explicit ``unpersist()``.

    Scale notes (100 TB): the shingle-id window runs over the distinct-
    shingle relation (vocabulary-sized, not corpus-sized); the per-doc
    rank window shuffles (id, sid, df) ints once; the array relation is
    |docs| rows of ~|shingles/doc| ints and is broadcast here — a
    corpus-scale deployment would bucket it by id instead (the candidate
    relation is already int pairs, so either side of that join is
    cheap)."""
    t_e4 = int(threshold * 10000)
    sh = word_shingles(df, id_col, text_col, n)
    dft = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
    if max_df is not None:
        dft = dft.where(F.col("_df") <= max_df)
    # dense int ids over the (vocabulary-sized) distinct-shingle relation;
    # ordering by shingle makes (_df, _sid) the same canonical total order
    # as (_df, shingle)
    sids = dft.select(
        "shingle", "_df",
        F.row_number().over(Window.orderBy("shingle")).alias("_sid"),
    )
    shk = sh.join(sids, on="shingle").select(id_col, "_sid", "_df")
    w_doc = Window.partitionBy(id_col)
    shr = shk.select(
        F.col(id_col),
        F.col("_sid"),
        F.row_number().over(w_doc.orderBy("_df", "_sid")).alias("_rn"),
        F.count("*").over(w_doc).alias("_sz"),
    )
    if persist:
        # NOT co-partitioned by _sid on purpose (unlike the band-key
        # caches): the window above leaves shr partitioned by doc_id, which
        # the arr groupBy(id) below reuses exchange-free, and a round-6 A/B
        # of repartition("_sid") before persist measured WORSE steady-state
        # (0.68 → 0.81 s in the clean rep) — the prefix join's two
        # exchanges are AQE-coalesced and cheaper than 32 fixed cache-side
        # sorts here.
        shr = track_cached(shr.persist(), storage)
    # per-doc verify structures from ONE aggregate over shr:
    # * _set  — the shingle-id array (exact verify via array_intersect);
    # * _bm0.._bm{W-1} — a 64*W-bit hashed bitmap of the id set (codegen'd
    #   bit_or aggregate) for the pre-filter below;
    # * _coll — EXACT per-doc bitmap collision count (sz - popcount(own
    #   bitmap)): collisions within A∩B are collisions within A and
    #   within B, so inter <= popcount(bmA & bmB) + min(collA, collB) —
    #   a provable upper bound, hence pruning on it is lossless.
    nwords = _BITMAP_WORDS
    bm_aggs = [
        F.expr(
            f"bit_or(CASE WHEN ((_sid % {64 * nwords}) div 64) = {k} "
            f"THEN shiftleft(CAST(1 AS BIGINT), _sid % 64) "
            f"ELSE CAST(0 AS BIGINT) END)"
        ).alias(f"_bm{k}")
        for k in range(nwords)
    ]
    popc = sum(F.bit_count(F.col(f"_bm{k}")) for k in range(nwords))
    arr = (
        shr.groupBy(id_col)
        .agg(F.collect_list("_sid").alias("_set"), *bm_aggs)
        .withColumn("_coll", (F.size("_set") - popc).cast("bigint"))
    )
    if persist:
        # arr feeds THREE broadcast consumers (bmr + both verify sides);
        # without its own persist each broadcast job re-runs the
        # collect_list/bit_or aggregate over the full shingle relation —
        # measured as three concurrent ~1.5 s jobs at sf1 (round 6)
        arr = track_cached(arr.persist(), storage)
    bm_cols = [f"_bm{k}" for k in range(nwords)] + ["_coll"]
    bmr = arr.select(F.col(id_col), *bm_cols)

    # prefix length: sz - ceil(t*sz) + 1, exact integer ceil on t_e4
    pfx = shr.where(
        F.col("_rn") <= F.col("_sz")
        - F.expr(f"(_sz * {t_e4} + 9999) div 10000") + 1
    ).join(F.broadcast(bmr), on=id_col)
    # Index-prefix asymmetry (Xiao et al. 2008): orient every pair so the
    # LARGER-size element (ties: larger id) is the probe side l and the
    # smaller one the indexed side r.  For the indexed element y, any
    # partner x has sx >= sy, so the pair's required overlap
    # alpha = ceil(t/(1+t)*(sx+sy)) >= ceil(2t/(1+t)*sy); the FIRST common
    # shingle of the pair (in the global (_df,_sid) canonical order) sits
    # at position <= sz - alpha + 1 in BOTH docs, hence within y's first
    # sy - ceil(2t/(1+t)*sy) + 1 rows — a ~45% shorter prefix at t=0.8
    # than the probe bound sx - ceil(t*sx) + 1 (which itself only needs
    # the size filter sy >= t*sx, implied by J >= t).  The join therefore
    # compares probe-prefix x index-prefix rows instead of full-prefix
    # squared — strictly fewer joined rows, still a lossless superset.
    if _index_prefix:
        idx = pfx.where(
            F.col("_rn") <= F.col("_sz")
            - F.expr(f"(_sz * {2 * t_e4} + {10000 + t_e4 - 1}) "
                     f"div {10000 + t_e4}") + 1
        )
    else:  # symmetric full-prefix self-join (round-start shape, for A/B)
        idx = pfx
    l, r = pfx.alias("l"), idx.alias("r")
    la, ra = F.col(f"l.{id_col}"), F.col(f"r.{id_col}")
    lsz, rsz = F.col("l._sz"), F.col("r._sz")
    # overlap upper bound at this matching position (PPJoin positional
    # filter); alpha = ceil(t/(1+t) * (sa+sb)) -> cross-multiplied
    ubound = F.lit(1) + F.least(lsz - F.col("l._rn"), rsz - F.col("r._rn"))
    # hashed-bitmap overlap bound: inter <= popcount(AND) + min(coll) —
    # ~20 codegen'd ops per joined row, so almost no non-qualifying pair
    # survives to the distinct or the (slow, per-row-allocating)
    # array_intersect.  All three structural filters plus this one are
    # lossless supersets of the true answer; the exact verify restores
    # equality.
    hash_inter = sum(
        F.bit_count(F.col(f"l._bm{k}").bitwiseAND(F.col(f"r._bm{k}")))
        for k in range(nwords)
    )
    bm_bound = hash_inter + F.least(F.col("l._coll"), F.col("r._coll"))
    if _index_prefix:
        # (sz, id) is a strict total order, so each unordered pair is
        # emitted by exactly one orientation; ids/sizes are normalized
        # back to id_a < id_b below.
        orient = (lsz > rsz) | ((lsz == rsz) & (la > ra))
        sel = [F.least(la, ra).alias("id_a"),
               F.greatest(la, ra).alias("id_b"),
               F.when(la < ra, lsz).otherwise(rsz).alias("_sa"),
               F.when(la < ra, rsz).otherwise(lsz).alias("_sb")]
    else:
        orient = la < ra
        sel = [la.alias("id_a"), ra.alias("id_b"),
               lsz.alias("_sa"), rsz.alias("_sb")]
    cands = (
        l.join(r, on="_sid")
        .where(
            orient
            & (10000 * F.least(lsz, rsz) >= t_e4 * F.greatest(lsz, rsz))
            & ((10000 + t_e4) * ubound >= t_e4 * (lsz + rsz))
            & ((10000 + t_e4) * bm_bound >= t_e4 * (lsz + rsz))
        )
        .select(*sel)
        .distinct()
    )
    aa = arr.select(F.col(id_col).alias("id_a"), F.col("_set").alias("_seta"))
    ab = arr.select(F.col(id_col).alias("id_b"), F.col("_set").alias("_setb"))
    inter = F.size(F.array_intersect("_seta", "_setb")).cast("bigint")
    # candidates share >= 1 shingle by construction, so the denominator is
    # always positive (no ANSI /0).  Broadcast the CANDIDATE side (small
    # by construction after the prefix/size/positional/bitmap filters) and
    # stream the cached array relation — broadcasting aa/ab shipped the
    # wide shingle-id arrays instead (round 6; same shape as the verify
    # join in jaccard_verify_pairs).
    j1 = aa.join(F.broadcast(cands), "id_a")
    return (
        ab.join(F.broadcast(j1), "id_b")
        .withColumn("inter", inter)
        .withColumn(
            "jaccard_e4",
            F.floor(
                F.col("inter") * 10000.0
                / (F.col("_sa") + F.col("_sb") - F.col("inter"))
            ).cast("bigint"),
        )
        .where(F.col("jaccard_e4") >= t_e4)
        .select("id_a", "id_b", "jaccard_e4")
    )
