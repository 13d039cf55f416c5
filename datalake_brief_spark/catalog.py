"""Schema registry + table loader for the lake.

The reference relies on ``inferSchema=True`` on every read (reference
pyspark-1.ipynb:68,103 and every notebook read). Inference forces an eager
extra scan and is nondeterministic across engines, so this engine pins an
explicit ``StructType`` per registered table and only permits inference in
the bronze/ingest step (see sources.ingest). At 100 TB an inference pass is
a full-dataset read — the registry removes it from every hot path.

Tables here mirror the driver's TESTDATA star schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            # Logical type; the file's physical unit (ns vs µs) varies by
            # writer, so load_table sniffs the footer and adapts the read —
            # ns files come in as long (nanosAsLong) and are converted.
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


_TS_UNIT_CACHE: dict[str, str] = {}


def _parquet_ts_unit(path: str, col: str) -> str:
    """Sniff a timestamp column's physical unit ('ns'/'us'/'ms') from the
    parquet footer. One O(KB) footer read per path, cached for the process.
    Falls back to 'us' (the parquet-standard unit Spark reads natively) when
    the footer can't be opened locally — e.g. a remote FS path on a real
    cluster, where the writer is expected to emit standard µs anyway."""
    unit = _TS_UNIT_CACHE.get(path)
    if unit is None:
        try:
            import pyarrow.parquet as pq

            p = path
            if os.path.isdir(p):
                parts = [f for f in sorted(os.listdir(p)) if f.endswith(".parquet")]
                p = os.path.join(p, parts[0])
            unit = getattr(pq.ParquetFile(p).schema_arrow.field(col).type, "unit", "us")
        except Exception:
            unit = "us"
        _TS_UNIT_CACHE[path] = unit
    return unit


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one registered table with its pinned schema (no inference scan).

    Parquet footers carry the physical schema; supplying the registry schema
    asserts the logical contract and keeps column pruning/pushdown intact
    (``ReadSchema`` in the plan shows only the referenced columns).

    events.ts adapts to the file's physical unit: standard µs timestamps
    read natively; ns files (no native Spark type) read as long via
    ``nanosAsLong`` and convert with integer division (no double
    round-trip — ns epochs exceed 2^53).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; registered: {sorted(TABLES)}")
    path = table_path(sf_dir, name)
    schema = TABLES[name]
    ns_ts = name == "events" and _parquet_ts_unit(path, "ts") == "ns"
    if ns_ts:
        # Spark can only read TIMESTAMP(NANOS) as a raw long; the conf is
        # runtime-settable, so pin it here (callers may hand us a foreign
        # session — the driver harness does) rather than fail the read.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = T.StructType(
            [
                T.StructField("ts", T.LongType()) if f.name == "ts" else f
                for f in schema.fields
            ]
        )
    df = spark.read.schema(schema).parquet(path)
    if ns_ts:
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works beside the
    DataFrame API (same Catalyst plans either way)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
