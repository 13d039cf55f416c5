"""Landing/ingestion pipeline (SURVEY §2.1 S4, §3.4).

The reference's ingestion scripts scrape a listing page, filter hrefs by
substring/suffix, and PUT the first N files to blob storage
(ingestion-datalake.py:85-125; parquet variant ingestion-datalake-parquet.py:
92-126). The engine's re-expression:

- a *manifest* (list of source URIs + target names) replaces scraping;
  building a manifest from an HTML page is a small driver-side utility kept
  behind an import-try (bs4 optional, absent in this container).
- landing copies bytes to the bronze zone unchanged (auditability), then
  ``normalize`` rewrites to schema'd, partitioned Parquet (silver) deriving
  partition columns from the landing path, like the reference's
  ``<region>_<file>`` naming (ingestion-datalake.py:102-105).
- parallel landing is a Spark job over the manifest (one task per file) —
  the reference's serial loop (first-14 cap) doesn't scale past a laptop.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass
from urllib.request import urlopen

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class ManifestEntry:
    uri: str  # file:///... or https://...
    relpath: str  # target path under the landing zone, e.g. "spain/madrid_listings.csv"


def links_from_html(html: str, base_url: str | None = None) -> list[str]:
    """S4 page→links step (reference ingestion-datalake.py:85-96: scrape the
    listings page, collect every ``<a href>``): HTML text in, href list out,
    ready for ``manifest_from_links``.

    Uses BeautifulSoup when importable; this container has no bs4, so a
    conservative regex over anchor href attributes is the fallback (adequate
    for machine-generated listing pages, which is all the reference scrapes).
    Relative hrefs resolve against ``base_url`` when given. Driver-side by
    design: one listing page, not a crawl.
    """
    try:
        from bs4 import BeautifulSoup  # type: ignore[import-not-found]

        hrefs = [
            a.get("href")
            for a in BeautifulSoup(html, "html.parser").find_all("a")
            if a.get("href")
        ]
    except ImportError:
        import re

        hrefs = re.findall(r"""<a\s[^>]*?href\s*=\s*["']([^"']+)["']""", html, flags=re.I)
    if base_url is not None:
        from urllib.parse import urljoin

        hrefs = [urljoin(base_url, h) for h in hrefs]
    return hrefs


def manifest_from_links(
    links: list[str], include_substr: str | None = None, suffix: str | None = None, limit: int | None = None
) -> list[ManifestEntry]:
    """Filter a link list the way the reference filters scraped hrefs
    (substring match for region, suffix match for format, first-N cap:
    ingestion-datalake.py:91-96)."""
    picked = [
        u
        for u in links
        if (include_substr is None or include_substr in u)
        and (suffix is None or u.endswith(suffix))
    ]
    if limit is not None:
        picked = picked[:limit]
    return [
        ManifestEntry(uri=u, relpath="_".join(u.rstrip("/").split("/")[-2:]))
        for u in picked
    ]


def _fetch_one(uri: str, dest: str) -> int:
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    if uri.startswith("file://"):
        shutil.copyfile(uri[len("file://") :], dest)
    else:  # pragma: no cover - no network in tests
        with urlopen(uri) as r, open(dest, "wb") as f:
            shutil.copyfileobj(r, f)
    return os.path.getsize(dest)


def land(spark: SparkSession, manifest: list[ManifestEntry], bronze_dir: str) -> DataFrame:
    """Land every manifest entry into the bronze zone, in parallel (one Spark
    task per file — this is deliberately an RDD-free distributed *driver* of
    side-effects via a 2-column DataFrame + mapInPandas would be overkill;
    a parallelized foreach is the idiomatic shape for bulk object copies).

    Returns a receipt DataFrame (uri, relpath, n_bytes).
    """
    entries = [(e.uri, e.relpath) for e in manifest]
    schema = T.StructType(
        [T.StructField("uri", T.StringType()), T.StructField("relpath", T.StringType())]
    )
    df = spark.createDataFrame(entries, schema=schema)

    bdir = bronze_dir

    def copy_partition(rows):
        import pandas as pd

        for pdf in rows:
            sizes = [
                _fetch_one(u, os.path.join(bdir, rp))
                for u, rp in zip(pdf["uri"], pdf["relpath"])
            ]
            yield pd.DataFrame({"uri": pdf["uri"], "relpath": pdf["relpath"], "n_bytes": sizes})

    out_schema = T.StructType(
        schema.fields + [T.StructField("n_bytes", T.LongType())]
    )
    return df.repartition(max(len(entries), 1)).mapInPandas(copy_partition, schema=out_schema)


def normalize_to_parquet(
    spark: SparkSession,
    bronze_glob: str,
    silver_dir: str,
    schema: T.StructType | None = None,
    fmt: str = "csv",
) -> None:
    """Bronze → silver: read landed files (schema'd if given), derive a
    ``source_file`` partition column from the landing path, write partitioned
    Parquet."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        reader = reader.option("inferSchema", "true")
    df = getattr(reader, fmt)(bronze_glob)
    df = df.withColumn(
        "source_file", F.regexp_extract(F.input_file_name(), r"([^/]+)\.[^./]+$", 1)
    )
    df.repartition("source_file").write.mode("overwrite").partitionBy("source_file").parquet(
        silver_dir
    )
