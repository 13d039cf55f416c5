"""Build an sf1-equivalent dataset (10x sf0.1) under /tmp for the second
bench scale point (VERDICT r4 ask #8): per-query sf0.1 -> sf1 scaling
ratios catch constant-floor masking that a single scale point hides.

Replication rules keep every headliner's work profile honest at x10:

- lineitem/orders: 10 replicas with disjoint orderkey ranges (the
  tpch_scale_check convention) — per-order join fan-out constant, all
  aggregates scale xN, dimensions fixed (TPC-H holds nation/region/supplier
  cardinality sublinear in SF anyway).
- documents: 10 fully-salted replicas (every word suffixed per replica, the
  dedup_scale_check control) — disjoint vocabularies, so near-dup pair
  structure is exactly xN and LSH candidate growth measures the algorithm,
  not replica cross-talk; n_chars recomputed for the salted text.
- embeddings: 10 replicas, each rotated by replica-index positions —
  norm-preserving, deterministic, distinct neighborhoods (exact copies
  would make top-k ties and degenerate LSH buckets).
- events: 10 replicas with disjoint event_id/user_id ranges, same time
  range — hourly aggregates scale xN.

Usage::

    python tools/build_sf1.py             # writes /tmp/spark_graft_sf1
    SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf1 python bench.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datalake_brief_spark.catalog import load_table
from datalake_brief_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SF1_FACTOR", "10"))
# Comma-list of fact tables to replicate at FACTOR; the rest are copied
# 1:1 from SF_DIR. Lets the x100 scale point (VERDICT r5 ask #8) build
# only the tables its target queries read instead of 100x everything.
SCALE_TABLES = set(
    os.environ.get(
        "SPARK_GRAFT_SF1_TABLES", "lineitem,orders,documents,embeddings,events"
    ).split(",")
)
OFFSET = 1 << 33


def union_reps(parts):
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    if os.path.isdir(OUT) and os.listdir(OUT):
        print(f"{OUT} already built")
        return
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("build-sf1")
    facts = ["lineitem", "orders", "documents", "embeddings", "events"]
    for name in ["region", "nation", "customer", "supplier", "part"] + [
        t for t in facts if t not in SCALE_TABLES
    ]:
        shutil.copy(
            os.path.join(SF_DIR, f"{name}.parquet"), os.path.join(OUT, f"{name}.parquet")
        )

    if "lineitem" in SCALE_TABLES:
        l = load_table(spark, SF_DIR, "lineitem")
        union_reps(
            [l.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * OFFSET)) for i in range(FACTOR)]
        ).repartition(32).write.mode("overwrite").parquet(os.path.join(OUT, "lineitem.parquet"))

    if "orders" in SCALE_TABLES:
        o = load_table(spark, SF_DIR, "orders")
        union_reps(
            [o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * OFFSET)) for i in range(FACTOR)]
        ).repartition(16).write.mode("overwrite").parquet(os.path.join(OUT, "orders.parquet"))

    d = load_table(spark, SF_DIR, "documents") if "documents" in SCALE_TABLES else None
    reps = [d] if d is not None else []
    for j in range(1, FACTOR if d is not None else 0):
        reps.append(
            d.select(
                (F.col("doc_id") + F.lit(j * 10_000_000)).alias("doc_id"),
                F.array_join(
                    F.transform(F.split(F.col("text"), " "), lambda w: F.concat(w, F.lit(f"_{j}"))),
                    " ",
                ).alias("text"),
                "lang",
                "source",
                F.lit(None).cast("long").alias("n_chars"),
            )
        )
    if reps:
        union_reps(reps).withColumn(
            "n_chars", F.coalesce(F.col("n_chars"), F.length("text").cast("long"))
        ).repartition(8).write.mode("overwrite").parquet(os.path.join(OUT, "documents.parquet"))

    e = load_table(spark, SF_DIR, "embeddings") if "embeddings" in SCALE_TABLES else None
    if e is not None:
        dim = len(e.select("embedding").first()[0])
        ereps = [e]
        for j in range(1, FACTOR):
            rot = j % dim or 1
            ereps.append(
                e.select(
                    (F.col("vec_id") + F.lit(j * 10_000_000)).alias("vec_id"),
                    F.concat(
                        F.slice("embedding", rot + 1, dim - rot), F.slice("embedding", 1, rot)
                    ).alias("embedding"),
                    "label",
                )
            )
        union_reps(ereps).repartition(8).write.mode("overwrite").parquet(
            os.path.join(OUT, "embeddings.parquet")
        )

    if "events" in SCALE_TABLES:
        ev = load_table(spark, SF_DIR, "events")
        union_reps(
            [
                ev.withColumn("event_id", F.col("event_id") + F.lit(i * OFFSET)).withColumn(
                    "user_id", F.col("user_id") + F.lit(i * OFFSET)
                )
                for i in range(FACTOR)
            ]
        ).repartition(16).write.mode("overwrite").parquet(os.path.join(OUT, "events.parquet"))

    for t in ["lineitem", "orders", "documents", "embeddings", "events"]:
        n = spark.read.parquet(os.path.join(OUT, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
