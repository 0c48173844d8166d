"""Deterministically synthesize a scaled copy of the driver's testdata.

``python scripts/make_scaled_sf.py [--factor 10] [--out .testdata/sf1]``

The driver ships sf0.001/0.01/0.1 (TESTDATA.md, read-only); the 100 TB
design claims need at least one recorded measurement at a LARGER scale
(VERDICT r4 next-round #1).  This script builds sf0.1 x factor from the
sf0.1 tables themselves — no external data, byte-deterministic:

* region/nation — copied (dimension tables don't scale in TPC-H either).
* supplier/part/customer/orders/lineitem — ``factor`` disjoint replicas
  with consistent key offsets, so referential integrity and every join
  fan-out are preserved exactly (scaling by disjoint subgraphs, the same
  shape TPC-H scale factors produce).
* events — replicas with offset event_id/user_id: 10x the sessionization
  state (distinct users), identical per-user event counts.
* documents — REGENERATED, not replicated: replicas would put every text
  in a 10-member exact-dup group and blow the near-dup pair output up
  superlinearly (C(20,2) vs C(2,2) per group), changing the workload
  shape rather than its scale.  The generator reproduces the measured
  sf0.1 recipe: the same 31-word vocabulary, 10-100 words/doc,
  en/zh/es/fr/de mix, src0-19 sources, and the same ~0.3% exact-dup-pair
  rate (each doc with idx % 625 == 624 copies its predecessor).
* embeddings — regenerated 64-dim vectors (seeded per vec_id), same
  label cardinality; replication would make ANN distance ties degenerate.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "batch", "part", "line", "order", "small", "sort", "fast",
    "scan", "hash", "slow", "group", "agg", "filter", "query", "big",
    "key", "row", "data", "join", "index", "cache", "shard", "a",
]
LANGS = ["en"] * 8 + ["zh"] * 3 + ["es"] * 3 + ["fr"] * 3 + ["de"] * 3


def _doc_text(i: int) -> str:
    h = hashlib.md5(f"sfscale|{i}".encode()).digest()
    n = 10 + int.from_bytes(h[:2], "big") % 91
    words = []
    state = h
    while len(words) < n:
        state = hashlib.md5(state).digest()
        for b in state:
            words.append(VOCAB[b % len(VOCAB)])
            if len(words) == n:
                break
    return " ".join(words)


def gen_documents(spark, n: int, out: str) -> None:
    import pandas as pd

    def gen(it):
        for b in it:
            rows = []
            for i in b["id"]:
                i = int(i)
                # the measured sf0.1 dup rate: ~8 exact pairs per 5,000
                src = i - 1 if i % 625 == 624 else i
                text = _doc_text(src)
                h = hashlib.md5(f"meta|{i}".encode()).digest()
                rows.append((i, text, LANGS[h[0] % len(LANGS)],
                             f"src{h[1] % 20}", len(text)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "text", "lang", "source", "n_chars"])

    (spark.range(0, n, numPartitions=32)
     .mapInPandas(gen, schema="doc_id long, text string, lang string, "
                              "source string, n_chars long")
     .write.mode("overwrite").parquet(out))


def gen_embeddings(spark, n: int, out: str) -> None:
    import numpy as np
    import pandas as pd

    def gen(it):
        for b in it:
            rows = []
            for i in b["id"]:
                i = int(i)
                rng = np.random.RandomState(i + 77)
                v = rng.normal(0.0, 0.125, 64).astype(np.float32)
                rows.append((i, v.tolist(), i % 10))
            yield pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])

    (spark.range(0, n, numPartitions=32)
     .mapInPandas(gen, schema="vec_id long, embedding array<float>, "
                              "label int")
     .write.mode("overwrite").parquet(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".testdata", "sf1"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from qwen_ocr_spark.plans.session import get_spark

    spark = get_spark(app_name="make-scaled-sf")
    os.makedirs(args.out, exist_ok=True)

    def copies(name: str, offsets: dict[str, int]) -> None:
        df = spark.read.parquet(f"{args.src}/{name}.parquet")
        parts = []
        for k in range(args.factor):
            d = df
            for col, span in offsets.items():
                d = d.withColumn(col, F.col(col) + F.lit(k * span))
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{args.out}/{name}.parquet")
        print(f"{name}: x{args.factor}")

    for name in ("region", "nation"):
        spark.read.parquet(f"{args.src}/{name}.parquet").write.mode(
            "overwrite").parquet(f"{args.out}/{name}.parquet")
        print(f"{name}: copied")

    # disjoint-replica key offsets (max key + 1 per table, from sf0.1)
    CUST, ORD, SUPP, PART, USER, EVENT = (
        20000, 200000, 2000, 30000, 2000, 200000)
    copies("customer", {"c_custkey": CUST})
    copies("supplier", {"s_suppkey": SUPP})
    copies("part", {"p_partkey": PART})
    copies("orders", {"o_orderkey": ORD, "o_custkey": CUST})
    copies("lineitem", {"l_orderkey": ORD, "l_partkey": PART,
                        "l_suppkey": SUPP})
    copies("events", {"event_id": EVENT, "user_id": USER})

    n_docs = spark.read.parquet(f"{args.src}/documents.parquet").count()
    gen_documents(spark, n_docs * args.factor,
                  f"{args.out}/documents.parquet")
    print(f"documents: regenerated {n_docs * args.factor}")
    n_vec = spark.read.parquet(f"{args.src}/embeddings.parquet").count()
    gen_embeddings(spark, n_vec * args.factor,
                   f"{args.out}/embeddings.parquet")
    print(f"embeddings: regenerated {n_vec * args.factor}")
    spark.stop()


if __name__ == "__main__":
    main()
