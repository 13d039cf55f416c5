"""datalake_brief_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities exercised by the
reference repo ``Manonp59/datalake-brief`` (a PySpark/Azure-datalake course
deliverable): DataFrame reads with schema control, projection, filtering,
aggregation, null handling, ML micro-pipelines, monitoring/alerting — plus
the scale extensions a 100 TB training-data pipeline needs (joins, windows,
dedup, similarity search, text analysis, streaming).

Everything here is public-API PySpark; Catalyst/Tungsten do the optimizing.
The library's job is semantics, schema discipline, and scale posture
(AQE on, broadcast dims, partitioned writes, Arrow-vectorized UDFs only).
"""

from datalake_brief_spark.session import get_spark
from datalake_brief_spark.catalog import TABLES, load_table, load_tables

__all__ = ["get_spark", "TABLES", "load_table", "load_tables"]
__version__ = "0.1.0"
