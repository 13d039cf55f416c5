"""Full local mirror of the driver's correctness gate at sf0.01: run every
registered query against its DuckDB oracle (row count, column names,
order-insensitive values) and print one line per query. Usage:

    PYTHONPATH=. python tools/parity_sweep.py [sf_dir]

Queries without an oracle print their row count (rows-only, by design).
Exit is informational only; the BAD list at the end is what matters."""

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from datalake_brief_spark.session import get_spark
from datalake_brief_spark.catalog import TABLES, table_path
from datalake_brief_spark.queries import QUERIES

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark()
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(SF, t)}'")

def norm(v):
    return round(v, 6) if isinstance(v, float) else v

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted((tuple(repr(norm(r[i])) for i in idx) for r in rows))

bad = []
for name, qq in QUERIES.items():
    try:
        sdf = qq.fn(spark, SF)
        srows = [tuple(r) for r in sdf.collect()]
        if qq.oracle is None:
            print(f"{name}: rows-only n={len(srows)}", flush=True)
            continue
        orows = con.sql(qq.oracle).fetchall()
        ocols = [d[0] for d in con.sql(qq.oracle).description]
        ok = (len(srows) == len(orows)
              and sorted(sdf.columns) == sorted(ocols)
              and canon(srows, sdf.columns) == canon(orows, ocols))
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(srows)}/{len(orows)})", flush=True)
        if not ok:
            bad.append(name)
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
        bad.append(name)
print("BAD:", bad)
