"""Sources & sinks (SURVEY §2.1-2.2)."""

from datalake_brief_spark.sources.io import (
    read_csv,
    read_parquet,
    write_partitioned,
    write_table,
)

__all__ = ["read_csv", "read_parquet", "write_table", "write_partitioned"]
